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


def test_pndm_v_prediction_matches_plms_oracle():
    """PLMS + v_prediction against a float64 NumPy transcription of
    diffusers PNDMScheduler.step_plms (scheduling_pndm.py): raw model
    outputs go into the ets history, the Adams-Bashforth combination runs
    on raw v, and the v->eps conversion applies ONCE to the combination
    at the call's effective alpha/sample (regression: converting per-call
    before the history diverges from call 3 onward)."""
    rng = np.random.default_rng(7)
    num_steps, n_train, ratio, offset = 6, 1000, 1000 // 6, 1
    lat0 = rng.standard_normal((1, 4, 4, 2)).astype(np.float64)
    q = rng.standard_normal((1, 4, 4, 2)).astype(np.float64)

    def model(x, t):  # arbitrary deterministic v-model
        return 0.3 * x + q * np.cos(t / n_train)

    betas = np.asarray(schedulers.make_betas(n_train, 0.00085, 0.012,
                                             "scaled_linear"), np.float64)
    acp = np.cumprod(1.0 - betas)
    final_alpha = acp[0]  # set_alpha_to_one=False

    # ---- oracle: diffusers step_plms transcription (v_prediction) ----
    base = (np.arange(num_steps) * ratio).round().astype(int) + offset
    seq = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1]
    lat, ets, cur_sample = lat0.copy(), [], None
    for counter, t in enumerate(seq):
        mo = model(lat, t)
        prev_t = t - ratio
        if counter != 1:
            ets = ets[-3:] + [mo]
        else:
            prev_t, t = t, t + ratio
        if len(ets) == 1 and counter == 0:
            comb, cur_sample = mo, lat
        elif len(ets) == 1 and counter == 1:
            comb, lat = (mo + ets[-1]) / 2, cur_sample
        elif len(ets) == 2:
            comb = (3 * ets[-1] - ets[-2]) / 2
        elif len(ets) == 3:
            comb = (23 * ets[-1] - 16 * ets[-2] + 5 * ets[-3]) / 12
        else:
            comb = (55 * ets[-1] - 59 * ets[-2] + 37 * ets[-3]
                    - 9 * ets[-4]) / 24
        a_t = acp[min(t, n_train - 1)]
        a_prev = acp[prev_t] if prev_t >= 0 else final_alpha
        comb = a_t ** 0.5 * comb + (1 - a_t) ** 0.5 * lat  # v -> eps
        sample_coeff = (a_prev / a_t) ** 0.5
        denom = a_t * (1 - a_prev) ** 0.5 + (a_t * (1 - a_t) * a_prev) ** 0.5
        lat = sample_coeff * lat - (a_prev - a_t) * comb / denom

    # ---- ours: same model through the scan-plan interface ----
    plan = schedulers.pndm_plan(num_steps, prediction_type="v_prediction")
    got = lat0.astype(np.float32)
    carry = plan.init_carry(got.shape)
    ts = np.asarray(plan.timesteps)
    np.testing.assert_array_equal(ts, seq)  # same call sequence
    for i in range(plan.num_calls):
        v = model(got.astype(np.float64), ts[i]).astype(np.float32)
        out, carry = plan.step(jnp.asarray(v), i, jnp.asarray(got), carry)
        got = np.asarray(out)
    np.testing.assert_allclose(got, lat, rtol=2e-4, atol=2e-4)
