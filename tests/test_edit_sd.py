"""End-to-end SD erase tests against a NumPy oracle of the reference flow."""

import numpy as np
import jax.numpy as jnp

from tests.helpers import (
    TINY_TEXT_CONFIG,
    ToyTokenizer,
    fake_unet_targets,
    tiny_text_encoder,
)
from uce_tpu.edit import embeddings as emb
from uce_tpu.edit.sd import SDEditResources, erase_from_embeddings, run_erase
from uce_tpu.models import clip_text, sd_targets


def _resources():
    params, cfg = tiny_text_encoder()
    return SDEditResources(
        targets=fake_unet_targets(d=cfg.hidden_size),
        text_params=params,
        text_config=cfg,
        tokenizer=ToyTokenizer(),
    )


def oracle_edit(targets, embeds, edits, guides, preserves, es, ps, lamb):
    """Reference-flow transcription: per-layer loop, rank-1 updates, inverse."""
    out = {}
    for name, w in targets.items():
        w = w.astype(np.float64)
        d = w.shape[1]
        mat1 = lamb * w
        mat2 = lamb * np.eye(d)
        for e_c, g_c in zip(edits, guides):
            c = embeds[e_c].astype(np.float64)[:, None]
            v = (w @ embeds[g_c].astype(np.float64))[:, None]
            mat1 += es * v @ c.T
            mat2 += es * c @ c.T
        for p_c in preserves:
            c = embeds[p_c].astype(np.float64)[:, None]
            v = (w @ embeds[p_c].astype(np.float64))[:, None]
            mat1 += ps * v @ c.T
            mat2 += ps * c @ c.T
        out[name] = mat1 @ np.linalg.inv(mat2)
    return out


def test_target_selection():
    targets = fake_unet_targets()
    picked = sd_targets.select_targets(
        {**targets, "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_k.weight":
         np.zeros((4, 4)), "conv_in.weight": np.zeros((4, 4))},
        "sd",
    )
    assert set(picked) == set(targets)  # attn1/conv excluded, attn2 k/v kept


def test_embedding_extraction_rule():
    params, cfg = tiny_text_encoder()
    tok = ToyTokenizer()
    concepts = ["van gogh", "picasso style art"]
    embeds = emb.encode_concepts_sd(params, cfg, tok, concepts)
    # manual: last real token hidden state
    ids, mask = emb.tokenize_batch(tok, concepts, cfg.max_position_embeddings)
    last_hidden, _, _ = clip_text.encode_tokens(params, jnp.asarray(ids), cfg)
    for i, c in enumerate(concepts):
        idx = mask[i].sum() - 2
        assert ids[i, idx + 1] == 98  # the token after is eos
        np.testing.assert_allclose(
            embeds[c], np.asarray(last_hidden)[i, idx], atol=1e-6
        )


def test_erase_matches_oracle_both_methods():
    res = _resources()
    edits = ["van gogh", "picasso"]
    guides = ["art", "art"]
    preserves = ["nature", "portrait photo"]
    embeds = res.encode_concepts(edits + guides + preserves)

    expected = oracle_edit(res.targets, embeds, edits, guides, preserves, 1.0, 1.0, 0.5)
    for method in ("collapsed", "general"):
        got = erase_from_embeddings(
            res.targets, embeds, edits, guides, preserves, method=method
        )
        assert list(got) == list(res.targets)  # key order and names preserved
        for name in expected:
            np.testing.assert_allclose(
                got[name], expected[name], rtol=5e-4, atol=5e-5,
                err_msg=f"{method}:{name}",
            )


def test_run_erase_exports_safetensors(tmp_path):
    res = _resources()
    edited = run_erase(
        res, ["van gogh"], ["art"], ["nature"],
        save_dir=str(tmp_path), exp_name="toy",
    )
    from safetensors.numpy import load_file

    loaded = load_file(tmp_path / "toy.safetensors")
    assert set(loaded) == set(res.targets)
    for k in loaded:
        np.testing.assert_allclose(loaded[k], edited[k])
        assert k.endswith("to_k.weight") or k.endswith("to_v.weight")


def test_erased_concept_redirected():
    res = _resources()
    edits, guides = ["van gogh"], ["art"]
    embeds = res.encode_concepts(edits + guides)
    got = erase_from_embeddings(
        res.targets, embeds, edits, guides, [], erase_scale=100.0
    )
    name = next(iter(res.targets))
    w_old, w_new = res.targets[name], got[name]
    target = w_old @ embeds["art"]
    out = w_new @ embeds["van gogh"]
    # high erase scale: output for erased concept ~ original output for guide
    assert np.linalg.norm(out - target) / np.linalg.norm(target) < 0.02
    # unrelated direction barely moves
    other = embeds["art"]
    drift = np.linalg.norm(w_new @ other - w_old @ other) / np.linalg.norm(w_old @ other)
    assert drift < 0.6


def test_pallas_method_matches_collapsed():
    import jax

    from tests.helpers import ToyTokenizer, fake_unet_targets, tiny_text_encoder
    from uce_tpu.edit.sd import SDEditResources, erase_from_embeddings

    params, cfg = tiny_text_encoder()
    res = SDEditResources(
        targets=fake_unet_targets(d=cfg.hidden_size), text_params=params,
        text_config=cfg, tokenizer=ToyTokenizer())
    embeds = res.encode_concepts(["van gogh", "art", "nature"])
    ref = erase_from_embeddings(res.targets, embeds, ["van gogh"], ["art"],
                                ["nature"], method="collapsed")
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = erase_from_embeddings(res.targets, embeds, ["van gogh"],
                                    ["art"], ["nature"], method="pallas",
                                    pallas_interpret=True)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=2e-3, atol=2e-3)


def test_pallas_method_falls_back_past_max_dim(caplog):
    """method='pallas' at SDXL's d=2048 (> MAX_PALLAS_DIM) must use the
    XLA path with a warning, not crash the CLI."""
    import logging

    from tests.helpers import fake_unet_targets
    from uce_tpu.edit.sd import erase_from_embeddings

    d = 2048
    rng = np.random.default_rng(0)
    targets = fake_unet_targets(d=d)
    embeds = {c: rng.standard_normal(d).astype(np.float32)
              for c in ["van gogh", "art", "nature"]}
    ref = erase_from_embeddings(targets, embeds, ["van gogh"], ["art"],
                                ["nature"], method="collapsed")
    with caplog.at_level(logging.WARNING, logger="uce_tpu.edit.sd"):
        got = erase_from_embeddings(targets, embeds, ["van gogh"], ["art"],
                                    ["nature"], method="pallas")
    assert any("XLA path" in r.getMessage() for r in caplog.records)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-5)
