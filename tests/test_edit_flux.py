"""FLUX edit path tests: dual-stream dispatch against a reference-flow oracle."""

import numpy as np

from tests.helpers import ToyTokenizer
from uce_tpu.edit import flux as edit_flux
from uce_tpu.models import clip_text, t5 as t5_mod

D_T5, D_CLIP = 16, 24


def _resources():
    t5_cfg = t5_mod.T5Config(
        vocab_size=99, d_model=D_T5, d_kv=4, d_ff=32, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16)
    clip_cfg = clip_text.CLIPTextConfig(
        vocab_size=99, hidden_size=D_CLIP, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=16, eos_token_id=98)
    rng = np.random.default_rng(0)
    targets = {
        "context_embedder.weight":
            rng.standard_normal((20, D_T5)).astype(np.float32),
        "time_text_embed.text_embedder.linear_1.weight":
            rng.standard_normal((20, D_CLIP)).astype(np.float32),
    }
    return edit_flux.FluxEditResources(
        targets=targets,
        t5_params=t5_mod.init_params(np.random.default_rng(1), t5_cfg),
        t5_config=t5_cfg, t5_tokenizer=ToyTokenizer(),
        clip_params=clip_text.init_params(np.random.default_rng(2), clip_cfg),
        clip_config=clip_cfg, clip_tokenizer=ToyTokenizer(),
        max_sequence_length=16,
    )


def test_default_max_sequence_length():
    assert edit_flux.default_max_sequence_length("FLUX.1-schnell") == 256
    assert edit_flux.default_max_sequence_length("FLUX.1-dev") == 512


def test_default_max_sequence_length_from_config(tmp_path):
    """A local snapshot is classified by its transformer config
    (guidance_embeds False = schnell), not by the directory name."""
    import json
    import os

    for name, guidance, expect in [
        ("flux-fast", False, 256),       # schnell snapshot, renamed dir
        ("my-schnell-copy", True, 512),  # dev snapshot in a 'schnell' dir
    ]:
        d = tmp_path / name
        os.makedirs(d / "transformer")
        (d / "transformer" / "config.json").write_text(
            json.dumps({"guidance_embeds": guidance}))
        assert edit_flux.default_max_sequence_length(str(d)) == expect


def test_encode_concepts_dual_stream():
    res = _resources()
    embeds = edit_flux.encode_concepts(res, ["van gogh", "art"])
    assert set(embeds) == {"van gogh", "art"}
    assert embeds["van gogh"][D_T5].shape == (D_T5,)
    assert embeds["van gogh"][D_CLIP].shape == (D_CLIP,)


def test_erase_matches_oracle_per_stream():
    res = _resources()
    edits, guides, preserves = ["van gogh"], ["art"], ["nature"]
    embeds = edit_flux.encode_concepts(res, edits + guides + preserves)
    got = edit_flux.erase_from_embeddings(
        res.targets, embeds, edits, guides, preserves)

    # oracle: reference flow per module with emb_idx selected by input dim
    for name, w in res.targets.items():
        d = w.shape[1]
        w64 = w.astype(np.float64)
        mat1 = 0.5 * w64
        mat2 = 0.5 * np.eye(d)
        for e_c, g_c in zip(edits, guides):
            c = embeds[e_c][d].astype(np.float64)[:, None]
            v = (w64 @ embeds[g_c][d].astype(np.float64))[:, None]
            mat1 += v @ c.T
            mat2 += c @ c.T
        for p_c in preserves:
            c = embeds[p_c][d].astype(np.float64)[:, None]
            v = (w64 @ embeds[p_c][d].astype(np.float64))[:, None]
            mat1 += v @ c.T
            mat2 += c @ c.T
        expected = mat1 @ np.linalg.inv(mat2)
        np.testing.assert_allclose(got[name], expected, rtol=5e-4, atol=5e-4,
                                   err_msg=name)


def test_run_erase_exports(tmp_path):
    res = _resources()
    edited = edit_flux.run_erase(res, ["van gogh"], ["art"], [],
                                 save_dir=str(tmp_path), exp_name="f")
    from safetensors.numpy import load_file

    loaded = load_file(tmp_path / "f.safetensors")
    assert set(loaded) == {
        "context_embedder.weight",
        "time_text_embed.text_embedder.linear_1.weight",
    }
    for k in loaded:
        np.testing.assert_allclose(loaded[k], edited[k])


def test_cli_rejects_sd_only_solver_flags(capsys):
    """edit-flux/--method general must error, not silently run collapsed."""
    import pytest

    from uce_tpu.cli.main import build_parser

    parser = build_parser()
    args = parser.parse_args([
        "edit-flux", "--edit_concepts", "x", "--concept_type", "art",
        "--model_id", "/nonexistent", "--method", "general"])
    with pytest.raises(SystemExit, match="not supported for FLUX"):
        args.func(args)
