"""Guidance-mode tests: baseline math oracles + pipeline integration."""

import numpy as np
import jax.numpy as jnp
import pytest

from uce_tpu.diffusion import guidance as gmod


def test_concept_algebra_matches_reference_math(rng):
    shape = (2, 4, 4, 3)
    branches = [rng.standard_normal(shape).astype(np.float32)
                for _ in range(5)]
    eps = np.concatenate(branches)
    got = np.asarray(gmod.concept_algebra_combine(jnp.asarray(eps), 7.5))

    uncond, text, p0, p1, p2 = branches
    noise_tmp = text - p2
    u = p1 - p0
    u = u / np.sqrt((u ** 2).sum())
    text = text - (noise_tmp * u).sum() * u
    expected = uncond + 7.5 * (text - uncond)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_sld_combine_warmup_is_plain_cfg(rng):
    shape = (1, 4, 4, 2)
    branches = [rng.standard_normal(shape).astype(np.float32)
                for _ in range(3)]
    eps = jnp.asarray(np.concatenate(branches))
    cfg = gmod.SLDConfig.preset("Medium")  # warmup 10
    mom = jnp.zeros(shape, jnp.float32)
    out, new_mom = gmod.sld_combine(eps, 7.5, jnp.asarray(3), mom, cfg)
    expected = branches[0] + 7.5 * (branches[1] - branches[0])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-6)
    # momentum accumulates even during warmup (SLDPipeline behavior)
    assert np.abs(np.asarray(new_mom)).max() > 0


def test_sld_combine_active_reference_math(rng):
    shape = (1, 4, 4, 2)
    u, t, s = [rng.standard_normal(shape).astype(np.float32) for _ in range(3)]
    cfg = gmod.SLDConfig(sld_guidance_scale=100.0, sld_warmup_steps=0,
                         sld_threshold=0.02, sld_momentum_scale=0.3,
                         sld_mom_beta=0.4)
    mom0 = rng.standard_normal(shape).astype(np.float32)
    out, mom1 = gmod.sld_combine(
        jnp.asarray(np.concatenate([u, t, s])), 7.5, jnp.asarray(12),
        jnp.asarray(mom0), cfg)

    diff = t - s
    scale = np.clip(np.abs(diff) * 100.0, None, 1.0)
    sscale = np.where(diff >= 0.02, 0.0, scale)
    gsafe = (s - u) * sscale + 0.3 * mom0
    expected_mom = 0.4 * mom0 + 0.6 * gsafe
    expected = u + 7.5 * ((t - u) - gsafe)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mom1), expected_mom, rtol=1e-5,
                               atol=1e-6)


def test_debias_vl_calibration_identities(rng):
    d = 8
    embeds = rng.standard_normal((4, d)).astype(np.float64)
    pairs = [[0, 1], [2, 3]]
    a = gmod.debias_vl_pair_matrix(embeds[0], embeds[1])
    diff = (embeds[0] - embeds[1])[:, None]
    np.testing.assert_allclose(a, diff @ diff.T, atol=1e-12)
    p = gmod.debias_vl_calibration(embeds, pairs, lam=500.0)
    # P suppresses pair-difference directions...
    direction = embeds[0] - embeds[1]
    suppressed = np.linalg.norm(p @ direction) / np.linalg.norm(direction)
    assert suppressed < 0.05
    # ...but keeps orthogonal directions (approximately)
    q, _ = np.linalg.qr(np.stack([embeds[0] - embeds[1],
                                  embeds[2] - embeds[3]]).T)
    ortho = rng.standard_normal(d)
    ortho -= q @ (q.T @ ortho)
    kept = np.linalg.norm(p @ ortho) / np.linalg.norm(ortho)
    assert kept > 0.9


def test_build_gender_pairs():
    prompts, pairs = gmod.build_gender_pairs(["Doctor", "Nurse"])
    assert prompts[0] == "A photo of a male doctor."
    assert prompts[3] == "A photo of a female nurse."
    assert pairs == [[0, 1], [2, 3]]


@pytest.mark.parametrize("mode,kwargs", [
    ("concept_algebra", {"concepts_to_project": ["a man", "a woman",
                                                 "a person"]}),
    # Max preset: warmup 0, so SLD is active within a 2-step test run
    ("sld", {"safety_concept": "violence",
             "sld_config": gmod.SLDConfig.preset("Max")}),
])
def test_pipeline_modes_run(tmp_path, mode, kwargs):
    from tests.snapshot import make_sd_snapshot
    from uce_tpu.diffusion.pipeline import SDPipeline

    snap = make_sd_snapshot(tmp_path / "snap")
    pipe = SDPipeline.from_pretrained(str(snap), dtype=jnp.float32)
    imgs = pipe("a doctor", num_inference_steps=2, seed=1, height=32,
                width=32, mode=mode, **kwargs)
    assert imgs.shape == (1, 32, 32, 3)
    base = pipe("a doctor", num_inference_steps=2, seed=1, height=32,
                width=32)
    assert (imgs != base).any()  # guidance mode changes the output


def test_pipeline_debias_vl_mode(tmp_path):
    from tests.snapshot import make_sd_snapshot
    from uce_tpu.diffusion.pipeline import SDPipeline

    snap = make_sd_snapshot(tmp_path / "snap")
    pipe = SDPipeline.from_pretrained(str(snap), dtype=jnp.float32)
    d = pipe.text_config.hidden_size
    proj = np.eye(d, dtype=np.float32) * 0.5
    imgs = pipe("a doctor", num_inference_steps=2, seed=1, height=32,
                width=32, mode="debias_vl", debias_projection=proj)
    base = pipe("a doctor", num_inference_steps=2, seed=1, height=32,
                width=32)
    assert (imgs != base).any()


def test_generate_debias_vl_rejects_sdxl():
    from uce_tpu.eval import baselines

    class FakeSDXL:
        is_sdxl = True

    with pytest.raises(ValueError, match="SD 1.x/2.x"):
        baselines.generate_debias_vl(
            FakeSDXL(), "unused.csv", ["doctor"], "/tmp/unused")
