"""Debias controller tests: convergence against a linear fake generator,
deadband semantics, accumulation behavior, and the on-device loop on the
tiny snapshot."""

import numpy as np
import pytest

from uce_tpu.diffusion.pipeline import SDPipeline
from uce_tpu.edit.debias import (
    DebiasSettings,
    apply_deadband,
    debias_loop,
    make_collapsed_solver,
)


def test_deadband():
    r = np.array([[0.04, -0.03], [0.2, -0.2]])
    out = apply_deadband(r, 0.05)
    assert (out[0] == 0).all() and (out[1] == r[1]).all()


def test_controller_converges_on_linear_plant():
    # Plant: observed ratio responds linearly to the accumulated coefficient
    # (gain 0.4), starting biased at [0.9, 0.1]; desired [0.5, 0.5].
    desired = np.array([0.5, 0.5])
    start = np.array([[0.9, 0.1]])

    def solve_fn(acc):
        return {"acc": acc.copy()}

    def measure_fn(weights):
        acc = weights["acc"]
        return np.clip(start + 0.4 * acc, 0, 1)

    _, acc, history = debias_loop(
        solve_fn, measure_fn, 1, 2, desired, max_iterations=30, max_diff=0.05
    )
    final = history[-1]["observed"]
    assert np.abs(final - desired).max() < 0.05 + 0.4 * 0.05
    assert history[-1]["ratios"].max() == 0  # converged via deadband
    assert len(history) < 30


def test_controller_accumulates_across_iterations():
    desired = np.array([1.0, 0.0])
    calls = []

    def solve_fn(acc):
        calls.append(acc.copy())
        return {}

    def measure_fn(_):
        return np.array([[0.0, 1.0]])  # never converges

    debias_loop(solve_fn, measure_fn, 1, 2, desired, 3, 0.05)
    # acc grows by (desired - observed) = [1, -1] per iteration
    np.testing.assert_allclose(calls[0], [[0, 0]])
    np.testing.assert_allclose(calls[1], [[1, -1]])
    np.testing.assert_allclose(calls[2], [[2, -2]])


def test_collapsed_solver_matches_reference_semantics(rng):
    # With acc, the solve must equal the general Eq.-7 solve using
    # v* = W (c_edit + sum_a acc_a c_attr_a).
    from uce_tpu.ops.solver import uce_solve_layer

    d = 16
    w = rng.standard_normal((24, d)).astype(np.float32)
    embeds = {
        "doctor": rng.standard_normal(d).astype(np.float32),
        "male": rng.standard_normal(d).astype(np.float32),
        "female": rng.standard_normal(d).astype(np.float32),
    }
    solve_fn = make_collapsed_solver(
        {"m.weight": w}, embeds, ["doctor"], ["male", "female"], [],
        DebiasSettings(),
    )
    acc = np.array([[0.3, -0.2]])
    got = solve_fn(acc)["m.weight"]

    g = embeds["doctor"] + 0.3 * embeds["male"] - 0.2 * embeds["female"]
    v_guide = (w @ g)[None]
    expected = np.asarray(uce_solve_layer(
        w, embeds["doctor"][None], v_guide, lamb=0.5))
    np.testing.assert_allclose(got, expected, rtol=5e-4, atol=5e-4)


def test_on_device_debias_smoke(tmp_path):
    """Full run_debias loop with the tiny pipeline and a stub classifier."""
    import jax.numpy as jnp

    from tests.snapshot import make_sd_snapshot
    from uce_tpu.diffusion.pipeline import SDPipeline

    snap = make_sd_snapshot(tmp_path / "snap")
    pipe = SDPipeline.from_pretrained(str(snap), dtype=jnp.float32)

    class StubClip:
        """Classifier that drifts toward balance as weights change."""

        def __init__(self):
            self.calls = 0

        def classify(self, images, labels):
            self.calls += 1
            n = images.shape[0]
            # first measurement: all label 0; afterwards: balanced
            if self.calls == 1:
                return np.zeros(n, np.int64)
            return np.arange(n) % 2

    from uce_tpu.edit.debias import run_debias

    weights, acc, history = run_debias(
        pipe, StubClip(), ["doctor"], ["male", "female"],
        settings=DebiasSettings(num_images_per_prompt=4,
                                num_inference_steps=2, max_iterations=3),
        save_dir=str(tmp_path), exp_name="deb", image_size=32, verbose=False,
    )
    assert (tmp_path / "deb.safetensors").exists()
    assert history[0]["observed"][0, 0] == 1.0  # all-male start
    assert history[-1]["ratios"].max() == 0  # converged after rebalance
    assert abs(acc[0, 0] - (-0.5)) < 1e-9 and abs(acc[0, 1] - 0.5) < 1e-9


@pytest.fixture(scope="module")
def real_clip_rig(tmp_path_factory):
    """Real SD pipeline + real JAX CLIP (random weights) — NO stubs
    anywhere in the measure path."""
    import jax.numpy as jnp
    import torch
    import transformers

    from tests.helpers import ToyTokenizer
    from tests.snapshot import make_sd_snapshot
    from uce_tpu.models import clip as clip_mod, clip_text

    snap = make_sd_snapshot(tmp_path_factory.mktemp("snap"))
    pipe = SDPipeline.from_pretrained(str(snap), dtype=jnp.float32)

    vcfg_hf = dict(hidden_size=32, num_hidden_layers=2,
                   num_attention_heads=4, intermediate_size=64,
                   image_size=32, patch_size=8)
    tcfg_hf = dict(vocab_size=99, hidden_size=24, num_hidden_layers=2,
                   num_attention_heads=4, intermediate_size=48,
                   max_position_embeddings=16, bos_token_id=97,
                   eos_token_id=98)
    cfg = transformers.CLIPConfig(text_config=tcfg_hf, vision_config=vcfg_hf,
                                  projection_dim=16)
    torch.manual_seed(0)
    sd = transformers.CLIPModel(cfg).eval().state_dict()
    vcfg = clip_mod.CLIPVisionConfig.from_hf(
        dict(cfg.vision_config.to_dict(), projection_dim=16))
    tcfg = clip_text.CLIPTextConfig.from_hf(
        dict(cfg.text_config.to_dict(), projection_dim=16))
    clip_model = clip_mod.CLIPModel(
        vision_params=clip_mod.convert_hf_vision_state_dict(sd, vcfg),
        vision_config=vcfg,
        text_params=clip_text.convert_hf_state_dict(
            {k: v for k, v in sd.items()
             if k.startswith("text_model.") or k == "text_projection.weight"},
            tcfg),
        text_config=tcfg, tokenizer=ToyTokenizer(),
        logit_scale=float(np.exp(sd["logit_scale"].numpy())))
    return pipe, clip_model


def test_real_measurement_is_fractional(real_clip_rig):
    """Regression for the round-1 confirmed bug: with list seeds the 10
    images per concept were bit-identical, so observed ratios collapsed to
    {0, 1}. The fake-free measure path (real generate + real JAX CLIP
    zero-shot classify) must produce ratios strictly inside (0, 1)."""
    from uce_tpu.edit.debias import run_debias

    pipe, clip_model = real_clip_rig
    # attribute pair chosen (deterministically, crc32 tokenizer) so the
    # random CLIP's decision boundary crosses the generated population
    weights, acc, history = run_debias(
        pipe, clip_model, ["doctor"], ["female person", "cat"],
        settings=DebiasSettings(num_images_per_prompt=16,
                                num_inference_steps=2, max_iterations=1),
        hypothesis_template="{}",
        image_size=32, verbose=False,
    )
    observed = history[0]["observed"]
    assert 0.0 < observed[0, 0] < 1.0, (
        f"degenerate measurement {observed}: duplicate samples regression")
    assert abs(observed.sum() - 1.0) < 1e-9


def test_closed_loop_converges_at_reachable_setpoint(real_clip_rig, tmp_path):
    """Full run_debias E2E (real generate + real classify + real solver):
    with desired_ratios set to the plant's actual fractional operating
    point, the deadband gate converges and telemetry/artifacts are written.

    NOTE (documented limitation, also in PARITY.md): random tiny CLIP
    towers have no text<->vision semantic alignment, so a far setpoint is
    not physically trackable at this scale — directional tracking is
    covered by the linear-plant controller tests above; this test pins the
    fake-free wiring, fractional measurement, deadband convergence, and
    artifact/telemetry contracts end-to-end.
    """
    from uce_tpu.edit.debias import run_debias

    pipe, clip_model = real_clip_rig
    probe_w, _, probe_hist = run_debias(
        pipe, clip_model, ["doctor"], ["female person", "cat"],
        settings=DebiasSettings(num_images_per_prompt=16,
                                num_inference_steps=2, max_iterations=1),
        hypothesis_template="{}", image_size=32, verbose=False)
    setpoint = probe_hist[0]["observed"][0]

    weights, acc, history = run_debias(
        pipe, clip_model, ["doctor"], ["female person", "cat"],
        settings=DebiasSettings(desired_ratios=tuple(setpoint),
                                num_images_per_prompt=16,
                                num_inference_steps=2, max_iterations=5),
        hypothesis_template="{}", image_size=32, verbose=False,
        save_dir=str(tmp_path), exp_name="rc",
        telemetry_path=str(tmp_path / "telemetry.csv"))
    assert np.abs(history[-1]["ratios"]).max() == 0  # deadband gate hit
    assert len(history) == 1  # converged on the first measurement
    assert (tmp_path / "rc.safetensors").exists()
    assert (tmp_path / "telemetry.csv").exists()


def test_closed_loop_accumulates_toward_far_setpoint(real_clip_rig):
    """With an unreachable setpoint the integral controller must keep
    accumulating in the controller direction (desired - observed) without
    oscillation artifacts, through the fake-free measure path."""
    from uce_tpu.edit.debias import run_debias

    pipe, clip_model = real_clip_rig
    weights, acc, history = run_debias(
        pipe, clip_model, ["doctor"], ["female person", "cat"],
        settings=DebiasSettings(desired_ratios=(1.0, 0.0),
                                num_images_per_prompt=16,
                                num_inference_steps=2, max_iterations=3),
        hypothesis_template="{}", image_size=32, verbose=False)
    assert len(history) == 3
    # every step pushed toward attr 0 (observed[0,0] < 1 throughout)
    assert acc[0, 0] > 0 and acc[0, 1] < 0
    assert acc[0, 0] == pytest.approx(
        sum(h["ratios"][0, 0] for h in history))
