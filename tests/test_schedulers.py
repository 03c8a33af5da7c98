"""Scheduler math invariants (oracle-free exactness properties)."""

import numpy as np
import jax.numpy as jnp

from uce_tpu.diffusion import schedulers


def _simulate(plan, x0, eps_true, model="eps_true"):
    """Run a scan-style loop where the model returns the exact noise."""
    lat = eps_true * plan.init_noise_sigma  # pure-noise start (x0-free init)
    carry = plan.init_carry(lat.shape)
    for i in range(plan.num_calls):
        lat_new, carry = plan.step(jnp.asarray(eps_true), i,
                                   jnp.asarray(lat, jnp.float32), carry)
        lat = np.asarray(lat_new)
    return lat


def test_ddim_perfect_model_recovers_x0():
    # If the model always predicts the true noise of x_t = sqrt(a) x0 +
    # sqrt(1-a) eps, each DDIM step maps exactly onto the next (a, x0) pair.
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    plan = schedulers.ddim_plan(10)
    a0 = np.asarray(plan.tables["alpha_t"][0])
    lat = np.sqrt(a0) * x0 + np.sqrt(1 - a0) * eps
    carry = plan.init_carry(lat.shape)
    for i in range(plan.num_calls):
        lat, carry = plan.step(jnp.asarray(eps), i, jnp.asarray(lat), carry)
        lat = np.asarray(lat)
    a_last = np.asarray(plan.tables["alpha_prev"][-1])
    expected = np.sqrt(a_last) * x0 + np.sqrt(1 - a_last) * eps
    np.testing.assert_allclose(lat, expected, rtol=1e-4, atol=1e-5)


def test_euler_constant_derivative_exact():
    # Euler in sigma space integrates a constant derivative exactly:
    # x_i = x0 + sigma_i * eps  ->  final (sigma=0) == x0.
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    plan = schedulers.euler_plan(7, timestep_spacing="linspace")
    sig0 = float(plan.tables["sigmas"][0])
    lat = x0 + sig0 * eps
    carry = plan.init_carry(lat.shape)
    for i in range(plan.num_calls):
        lat, carry = plan.step(jnp.asarray(eps), i, jnp.asarray(lat), carry)
        lat = np.asarray(lat)
    np.testing.assert_allclose(lat, x0, rtol=1e-3, atol=1e-3)


def test_lms_constant_derivative_exact():
    rng = np.random.default_rng(2)
    x0 = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    plan = schedulers.lms_plan(9)
    sig0 = float(plan.tables["sigmas"][0])
    lat = x0 + sig0 * eps
    carry = plan.init_carry(lat.shape)
    for i in range(plan.num_calls):
        lat, carry = plan.step(jnp.asarray(eps), i, jnp.asarray(lat), carry)
        lat = np.asarray(lat)
    np.testing.assert_allclose(lat, x0, rtol=1e-3, atol=1e-3)


def test_lms_coeff_sums():
    # Order-1 exactness: per-step LMS coefficients sum to sigma_{t+1}-sigma_t.
    plan = schedulers.lms_plan(12)
    sig = np.asarray(plan.tables["sigmas"])
    coeffs = np.asarray(plan.tables["coeffs"])
    np.testing.assert_allclose(
        coeffs.sum(-1), sig[1:] - sig[:-1], rtol=1e-3, atol=1e-5
    )


def test_pndm_plan_structure():
    plan = schedulers.pndm_plan(10)
    ts = np.asarray(plan.timesteps)
    assert plan.num_calls == 11  # S+1 model evals (PLMS warmup corrector)
    assert ts[1] == ts[2]  # the second timestep is evaluated twice
    assert (np.diff(ts[2:]) < 0).all()


def test_pndm_perfect_model_recovers_x0():
    rng = np.random.default_rng(3)
    x0 = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    plan = schedulers.pndm_plan(10)
    a0 = np.asarray(plan.tables["alpha_t"][0])
    lat = np.sqrt(a0) * x0 + np.sqrt(1 - a0) * eps
    carry = plan.init_carry(lat.shape)
    for i in range(plan.num_calls):
        lat, carry = plan.step(jnp.asarray(eps), i, jnp.asarray(lat), carry)
        lat = np.asarray(lat)
    a_last = np.asarray(plan.tables["alpha_prev"][-1])
    expected = np.sqrt(a_last) * x0 + np.sqrt(1 - a_last) * eps
    np.testing.assert_allclose(lat, expected, rtol=2e-3, atol=2e-3)


def test_flow_match_euler_constant_velocity():
    # x_t = x1 + sigma*(noise - x1) with constant v = noise - x1; Euler is
    # exact: final == x1.
    rng = np.random.default_rng(4)
    x1 = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    noise = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    plan = schedulers.flow_match_euler_plan(6)
    v = noise - x1
    sig0 = float(plan.tables["sigmas"][0])
    lat = x1 + sig0 * v
    carry = plan.init_carry(lat.shape)
    for i in range(plan.num_calls):
        lat, carry = plan.step(jnp.asarray(v), i, jnp.asarray(lat), carry)
        lat = np.asarray(lat)
    np.testing.assert_allclose(lat, x1, rtol=1e-4, atol=1e-5)


def test_plan_from_hf_dispatch():
    for cls, kind in [("PNDMScheduler", "pndm"), ("DDIMScheduler", "ddim"),
                      ("LMSDiscreteScheduler", "lms"),
                      ("EulerDiscreteScheduler", "euler")]:
        plan = schedulers.plan_from_hf({"_class_name": cls}, 5)
        assert plan.kind == kind


def test_plan_from_hf_as_inherits_model_hyperparameters():
    # per-call scheduler override changes the TYPE only: a v-prediction
    # model (SD 2.x-768) stepped as epsilon would produce pure noise
    cfg = {"_class_name": "DDIMScheduler",
           "prediction_type": "v_prediction",
           "beta_start": 0.0009, "beta_end": 0.011,
           "beta_schedule": "scaled_linear",
           "num_train_timesteps": 1000, "steps_offset": 1}
    plan = schedulers.plan_from_hf_as("lms", cfg, 5)
    assert plan.kind == "lms"
    ref = schedulers.plan_from_hf(dict(cfg, _class_name="LMSDiscreteScheduler"), 5)
    for k in plan.tables:
        np.testing.assert_array_equal(np.asarray(plan.tables[k]),
                                      np.asarray(ref.tables[k]))
    assert plan.prediction_type == ref.prediction_type == "v_prediction"


def test_plan_from_hf_as_accepts_class_names_too():
    plan = schedulers.plan_from_hf_as("DDIMScheduler", {}, 4)
    assert plan.kind == "ddim"


def test_ddim_plan_full_train_steps_no_overflow():
    """num_steps == num_train_timesteps with steps_offset=1 puts the
    leading timestep one past the alphas-cumprod table; both ends must
    clip (regression: IndexError at plan build)."""
    plan = schedulers.ddim_plan(50, num_train_timesteps=50)
    assert plan.num_calls == 50
    assert float(plan.timesteps.max()) <= 50


def test_plan_from_hf_flow_match_dynamic_shifting_mu():
    cfg = {"_class_name": "FlowMatchEulerDiscreteScheduler", "shift": 3.0,
           "use_dynamic_shifting": True}
    import numpy as np
    static = schedulers.plan_from_hf(cfg, 4)          # warns, static shift
    dyn = schedulers.plan_from_hf(cfg, 4, mu=1.15)    # exp(mu) schedule
    s_static = np.asarray(static.tables["sigmas"])
    s_dyn = np.asarray(dyn.tables["sigmas"])
    assert not np.allclose(s_static, s_dyn)
    # mu schedule: sigma' = e^mu / (e^mu + 1/sigma - 1) on the base grid
    base = np.linspace(1.0, 0.25, 4)
    expect = np.exp(1.15) / (np.exp(1.15) + 1.0 / base - 1.0)
    np.testing.assert_allclose(s_dyn[:4], expect, rtol=1e-5)


def test_plan_from_hf_rejects_unimplemented_math_options():
    """Config keys that change the step math must fail LOUDLY instead of
    silently diverging from diffusers (the fixed-seed parity contract)."""
    import pytest

    base = {"_class_name": "PNDMScheduler", "skip_prk_steps": True}
    with pytest.raises(ValueError, match="prediction_type"):
        schedulers.plan_from_hf(dict(base, prediction_type="sample"), 5)
    with pytest.raises(ValueError, match="skip_prk_steps"):
        schedulers.plan_from_hf(dict(base, skip_prk_steps=False), 5)
    with pytest.raises(ValueError, match="trained_betas"):
        schedulers.plan_from_hf(dict(base, trained_betas=[0.1, 0.2]), 5)
    with pytest.raises(ValueError, match="thresholding"):
        schedulers.plan_from_hf(dict(base, thresholding=True), 5)
    with pytest.raises(ValueError, match="karras"):
        schedulers.plan_from_hf(
            {"_class_name": "EulerDiscreteScheduler",
             "use_karras_sigmas": True}, 5)
    with pytest.raises(ValueError, match="clip_sample"):
        schedulers.plan_from_hf(
            {"_class_name": "DDIMScheduler", "clip_sample": True}, 5)
    with pytest.raises(ValueError, match="interpolation_type"):
        schedulers.plan_from_hf(
            {"_class_name": "EulerDiscreteScheduler",
             "interpolation_type": "log_linear"}, 5)


def test_plan_from_hf_ddim_set_alpha_to_one_class_default():
    """A DDIM-class config MISSING set_alpha_to_one follows the diffusers
    class default (True); SD-family configs carry an explicit False."""
    import numpy as np

    missing = schedulers.plan_from_hf({"_class_name": "DDIMScheduler"}, 4)
    explicit = schedulers.plan_from_hf(
        {"_class_name": "DDIMScheduler", "set_alpha_to_one": False}, 4)
    a_missing = np.asarray(missing.tables["alpha_prev"])[-1]
    a_explicit = np.asarray(explicit.tables["alpha_prev"])[-1]
    assert a_missing == 1.0
    assert a_explicit < 1.0


def test_scale_model_input_preserves_latent_dtype():
    """lms/euler latent scaling must not promote bf16 latents to fp32 —
    that crashed the bf16 generation path at the UNet's first conv."""
    import jax.numpy as jnp

    plan = schedulers.make_plan("lms", 4)
    x = jnp.ones((1, 8, 8, 4), jnp.bfloat16)
    assert plan.scale_model_input(x, 0).dtype == jnp.bfloat16
    x32 = jnp.ones((1, 8, 8, 4), jnp.float32)
    assert plan.scale_model_input(x32, 0).dtype == jnp.float32
