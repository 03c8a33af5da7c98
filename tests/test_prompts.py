"""Prompt parsing / expansion semantics (reference CLI contract)."""

import pytest

from uce_tpu.utils.prompts import (
    broadcast_guides,
    default_guide_concepts,
    expand_prompts,
    parse_concepts,
    resolve_edit_request,
)


def test_parse_strips():
    assert parse_concepts(" Van Gogh ; Picasso") == ["Van Gogh", "Picasso"]


def test_parse_at_file_json(tmp_path):
    # data/info format: a JSON array of concept names
    p = tmp_path / "concepts.txt"
    p.write_text('["Van Gogh", " Picasso ", ""]', encoding="utf-8")
    assert parse_concepts(f"@{p}") == ["Van Gogh", "Picasso"]


def test_parse_at_file_lines(tmp_path):
    p = tmp_path / "concepts.txt"
    p.write_text("Van Gogh\n Picasso \n\n", encoding="utf-8")
    assert parse_concepts(f"@{p}") == ["Van Gogh", "Picasso"]


def test_parse_at_vendored_info_list():
    # the exact concept set of the paper's 100-artist scaling experiment
    concepts = parse_concepts(
        "@data/info/erased-100artists-towards_art-preserve_true-sd_1_4"
        "-method_replace.txt")
    assert len(concepts) == 100
    assert "Gustave Courbet" in concepts


def test_guide_defaults():
    assert default_guide_concepts(None, "art") == "art"
    assert default_guide_concepts(None, "object") == ""
    assert default_guide_concepts("x", "art") == "x"


def test_broadcast():
    assert broadcast_guides(["a", "b"], ["g"]) == ["g", "g"]
    with pytest.raises(ValueError):
        broadcast_guides(["a", "b", "c"], ["g", "h"])


def test_expand_art():
    edits, guides = expand_prompts(["Van Gogh"], ["art"], "art")
    assert edits == [
        "Van Gogh",
        "painting by Van Gogh",
        "art by Van Gogh",
        "artwork by Van Gogh",
        "picture by Van Gogh",
        "style of Van Gogh",
    ]
    assert guides[1] == "painting by art"
    assert len(guides) == 6


def test_expand_object():
    edits, _ = expand_prompts(["cat"], [""], "object")
    assert "photo of cat" in edits and "image of cat" in edits


def test_resolve_full():
    edits, guides, pres = resolve_edit_request(
        "Van Gogh; Picasso", None, "nature; person", concept_type="art", expand=True
    )
    assert len(edits) == 2 + 10 and len(guides) == len(edits)
    assert pres == ["nature", "person"]
