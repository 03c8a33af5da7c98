"""v-prediction scheduler support (SD 2.x-768)."""

import numpy as np
import jax.numpy as jnp

from uce_tpu.diffusion import schedulers


def _alpha_sigma(a):
    return np.sqrt(a), np.sqrt(1 - a)


def test_ddim_v_prediction_perfect_model():
    # v = sqrt(a) eps - sqrt(1-a) x0; a perfect v-model must follow the same
    # trajectory as the perfect eps-model under the eps-parameterization.
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    plan = schedulers.ddim_plan(8, prediction_type="v_prediction")
    a0 = np.asarray(plan.tables["alpha_t"][0])
    lat = np.sqrt(a0) * x0 + np.sqrt(1 - a0) * eps
    carry = plan.init_carry(lat.shape)
    for i in range(plan.num_calls):
        a_t = np.asarray(plan.tables["alpha_t"][i])
        sa, sb = _alpha_sigma(a_t)
        v = sa * eps - sb * x0
        lat, carry = plan.step(jnp.asarray(v), i, jnp.asarray(lat), carry)
        lat = np.asarray(lat)
    a_last = np.asarray(plan.tables["alpha_prev"][-1])
    expected = np.sqrt(a_last) * x0 + np.sqrt(1 - a_last) * eps
    np.testing.assert_allclose(lat, expected, rtol=1e-4, atol=1e-4)


def test_euler_v_prediction_constant_trajectory():
    # In sigma space x = x0 + sigma*eps (scaled input x/sqrt(s^2+1)); the
    # exact v for that trajectory gives derivative == eps, so Euler must
    # land on x0 exactly.
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    plan = schedulers.euler_plan(6, timestep_spacing="linspace",
                                 prediction_type="v_prediction")
    sig = np.asarray(plan.tables["sigmas"])
    lat = x0 + sig[0] * eps
    carry = plan.init_carry(lat.shape)
    for i in range(plan.num_calls):
        s = sig[i]
        # model sees the scaled input; v s.t. pred_x0 recovers x0:
        # pred_x0 = -s v/sqrt(s^2+1) + x/(s^2+1)  with x unscaled here
        # => v = (x/(s^2+1) - x0) * sqrt(s^2+1)/s
        v = (lat / (s ** 2 + 1) - x0) * np.sqrt(s ** 2 + 1) / s
        lat, carry = plan.step(jnp.asarray(v.astype(np.float32)), i,
                               jnp.asarray(lat), carry)
        lat = np.asarray(lat)
    np.testing.assert_allclose(lat, x0, rtol=1e-3, atol=1e-3)


def test_plan_from_hf_reads_prediction_type():
    plan = schedulers.plan_from_hf(
        {"_class_name": "DDIMScheduler", "prediction_type": "v_prediction"}, 5)
    assert plan.prediction_type == "v_prediction"
    plan = schedulers.plan_from_hf({"_class_name": "PNDMScheduler"}, 5)
    assert plan.prediction_type == "epsilon"


def test_epsilon_path_unchanged():
    # default plans must be bitwise-identical to pre-v-pred behavior
    rng = np.random.default_rng(2)
    eps = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    lat = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    p1 = schedulers.ddim_plan(5)
    p2 = schedulers.ddim_plan(5, prediction_type="epsilon")
    o1, _ = p1.step(jnp.asarray(eps), 0, jnp.asarray(lat), p1.init_carry(lat.shape))
    o2, _ = p2.step(jnp.asarray(eps), 0, jnp.asarray(lat), p2.init_carry(lat.shape))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
