"""Debias controller tests: convergence against a linear fake generator,
deadband semantics, accumulation behavior, and the on-device loop on the
tiny snapshot."""

import numpy as np

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
