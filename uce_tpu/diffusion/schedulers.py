"""Diffusion schedulers as scan-fusable pure step functions.

Every scheduler is compiled to a *plan*: host-precomputed static tables
(per-call timesteps, alphas, sigmas, multistep coefficients) so the entire
denoising loop runs as one ``jax.lax.scan`` with zero data-dependent control
flow — the TPU-native replacement for diffusers' stateful Python scheduler
objects driven per step (``evalscripts/debiasing_vl.py:128-143``).

Implemented: DDIM, PNDM (PLMS, the SD v1.x pipeline default), LMSDiscrete
(the reference's hand-rolled eval loops), EulerDiscrete (SDXL default), and
FlowMatchEuler (FLUX). The state a sampler must carry (PLMS eps history,
LMS derivative history) lives in an explicit scan carry.

Algorithms follow the published papers (DDIM: Song et al. 2020; PNDM: Liu
et al. 2022; LMS: Karras et al. 2022 / k-diffusion) with diffusers' default
hyperparameters (scaled_linear betas 0.00085..0.012, leading timestep
spacing with steps_offset=1) so fixed-seed outputs match the reference eval
protocol.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def make_betas(num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
               beta_schedule="scaled_linear") -> np.ndarray:
    if beta_schedule == "scaled_linear":
        return np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                           num_train_timesteps, dtype=np.float64) ** 2
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps,
                           dtype=np.float64)
    raise ValueError(f"unsupported beta_schedule: {beta_schedule}")


def _leading_timesteps(num_train, num_steps, steps_offset=1) -> np.ndarray:
    """diffusers 'leading' spacing: (arange(S) * (N//S)).round()[::-1] + offset."""
    ratio = num_train // num_steps
    return (np.arange(num_steps) * ratio).round()[::-1].astype(np.int64) + steps_offset


@dataclasses.dataclass
class Plan:
    """Static tables for one (scheduler, num_steps) pair.

    num_calls: number of model evaluations (== len(timesteps)).
    timesteps: [num_calls] values fed to the UNet.
    init_noise_sigma: multiply initial gaussian latents by this.
    carry_shape: per-sample history slots (0 = stateless).
    """

    kind: str
    num_calls: int
    timesteps: jnp.ndarray
    init_noise_sigma: float
    tables: dict
    history_slots: int = 0
    prediction_type: str = "epsilon"  # or "v_prediction" (SD 2.x-768)

    def init_carry(self, sample_shape, dtype=jnp.float32):
        if self.history_slots == 0:
            return jnp.zeros((0,), dtype)
        return jnp.zeros((self.history_slots,) + tuple(sample_shape), dtype)

    def scale_model_input(self, x, i):
        if self.kind in ("lms", "euler"):
            sigma = self.tables["sigmas"][i]
            # scale in fp32 (tables are fp32) but return the MODEL input
            # dtype: promoting bf16 latents here used to crash the bf16
            # lms/euler path at the UNet's first conv (dtype mismatch)
            return (x / jnp.sqrt(sigma ** 2 + 1.0)).astype(x.dtype)
        return x

    def step(self, eps, i, sample, carry):
        return _STEP_FNS[self.kind](self, eps, i, sample, carry)


def _plan_flatten(p: "Plan"):
    table_keys = tuple(sorted(p.tables))
    children = (p.timesteps,) + tuple(p.tables[k] for k in table_keys)
    aux = (p.kind, p.num_calls, p.init_noise_sigma, p.history_slots,
           table_keys, p.prediction_type)
    return children, aux


def _plan_unflatten(aux, children):
    kind, num_calls, init_sigma, slots, table_keys, pred_type = aux
    return Plan(
        kind=kind, num_calls=num_calls, timesteps=children[0],
        init_noise_sigma=init_sigma,
        tables=dict(zip(table_keys, children[1:])),
        history_slots=slots, prediction_type=pred_type,
    )


jax.tree_util.register_pytree_node(Plan, _plan_flatten, _plan_unflatten)


# ---------------------------------------------------------------------------
# DDIM
# ---------------------------------------------------------------------------

def ddim_plan(num_steps: int, num_train_timesteps=1000, beta_start=0.00085,
              beta_end=0.012, beta_schedule="scaled_linear", steps_offset=1,
              set_alpha_to_one=False, prediction_type="epsilon") -> Plan:
    betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
    acp = np.cumprod(1.0 - betas)
    ts = _leading_timesteps(num_train_timesteps, num_steps, steps_offset)
    prev = ts - num_train_timesteps // num_steps
    final_alpha = 1.0 if set_alpha_to_one else acp[0]
    # clip BOTH ends: with num_steps == num_train_timesteps and
    # steps_offset=1 the leading timestep equals num_train_timesteps,
    # one past the end of acp (pndm_plan clips identically).
    alpha_t = acp[np.clip(ts, 0, num_train_timesteps - 1)]
    alpha_prev = np.where(
        prev >= 0, acp[np.clip(prev, 0, num_train_timesteps - 1)], final_alpha)
    return Plan(
        kind="ddim", num_calls=num_steps,
        timesteps=jnp.asarray(ts, jnp.float32),
        init_noise_sigma=1.0,
        tables={
            "alpha_t": jnp.asarray(alpha_t, jnp.float32),
            "alpha_prev": jnp.asarray(alpha_prev, jnp.float32),
        },
        prediction_type=prediction_type,
    )


def _to_eps_alpha(plan, model_output, i, sample):
    """v_prediction -> epsilon at the call's alpha (diffusers conversion):
    eps = sqrt(a_t) v + sqrt(1 - a_t) x."""
    if plan.prediction_type != "v_prediction":
        return model_output
    a_t = plan.tables["alpha_t"][i]
    return jnp.sqrt(a_t) * model_output + jnp.sqrt(1.0 - a_t) * sample


def _sigma_derivative(plan, model_output, i, sample):
    """Derivative for sigma-space steps; eps-pred derivative IS eps, the
    v-pred derivative comes from pred_x0 = -sigma v/sqrt(s^2+1) + x/(s^2+1)
    (diffusers EulerDiscrete/LMSDiscrete)."""
    if plan.prediction_type != "v_prediction":
        return model_output
    sigma = plan.tables["sigmas"][i]
    pred_x0 = (model_output * (-sigma / jnp.sqrt(sigma ** 2 + 1.0))
               + sample / (sigma ** 2 + 1.0))
    return (sample - pred_x0) / sigma


def _ddim_step(plan, eps, i, sample, carry):
    eps = _to_eps_alpha(plan, eps, i, sample)
    a_t = plan.tables["alpha_t"][i]
    a_prev = plan.tables["alpha_prev"][i]
    x0 = (sample - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
    return prev, carry


# ---------------------------------------------------------------------------
# PNDM (PLMS variant, skip_prk_steps=True — the SD v1.x default)
# ---------------------------------------------------------------------------

def pndm_plan(num_steps: int, num_train_timesteps=1000, beta_start=0.00085,
              beta_end=0.012, beta_schedule="scaled_linear",
              steps_offset=1, set_alpha_to_one=False,
              prediction_type="epsilon") -> Plan:
    betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
    acp = np.cumprod(1.0 - betas)
    ratio = num_train_timesteps // num_steps
    base = (np.arange(num_steps) * ratio).round().astype(np.int64) + steps_offset
    # PLMS call sequence: descending with the second timestep repeated
    # (Heun-style warmup corrector on the first interval).
    seq = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1].copy()
    n_calls = len(seq)  # num_steps + 1

    # Per-call effective (t, t_prev): call 1 re-steps the first interval.
    t_eff = seq.copy()
    t_prev = seq - ratio
    if n_calls >= 2:
        t_eff[1] = seq[1] + ratio
        t_prev[1] = seq[1]

    final_alpha = 1.0 if set_alpha_to_one else acp[0]
    alpha_t = acp[np.clip(t_eff, 0, num_train_timesteps - 1)]
    alpha_prev = np.where(
        t_prev >= 0, acp[np.clip(t_prev, 0, num_train_timesteps - 1)], final_alpha
    )

    # Adams-Bashforth coefficient schedule over [eps_new, h1, h2, h3]
    coeffs = np.zeros((n_calls, 4))
    for i in range(n_calls):
        if i == 0:
            coeffs[i] = [1, 0, 0, 0]
        elif i == 1:
            coeffs[i] = [0.5, 0.5, 0, 0]
        elif i == 2:
            coeffs[i] = [1.5, -0.5, 0, 0]
        elif i == 3:
            coeffs[i] = [23 / 12, -16 / 12, 5 / 12, 0]
        else:
            coeffs[i] = [55 / 24, -59 / 24, 37 / 24, -9 / 24]
    append = np.ones(n_calls, bool)
    if n_calls >= 2:
        append[1] = False  # corrector call does not extend the history
    use_held = np.zeros(n_calls, bool)
    if n_calls >= 2:
        use_held[1] = True  # corrector restarts from the held sample

    return Plan(
        kind="pndm", num_calls=n_calls,
        timesteps=jnp.asarray(seq, jnp.float32),
        init_noise_sigma=1.0,
        tables={
            "alpha_t": jnp.asarray(alpha_t, jnp.float32),
            "alpha_prev": jnp.asarray(alpha_prev, jnp.float32),
            "coeffs": jnp.asarray(coeffs, jnp.float32),
            "append": jnp.asarray(append),
            "use_held": jnp.asarray(use_held),
        },
        history_slots=4,  # 3 eps history + 1 held sample
        prediction_type=prediction_type,
    )


def _pndm_step(plan, eps, i, sample, carry):
    t = plan.tables
    hist, held = carry[:3], carry[3]
    sample = jnp.where(t["use_held"][i], held, sample)
    c = t["coeffs"][i]
    # History stores RAW model outputs; the Adams-Bashforth combination
    # runs on raw outputs and the v->eps conversion applies ONCE to the
    # combined output at the call's effective alpha/sample — diffusers
    # step_plms appends model_output to self.ets before conversion and
    # _get_prev_sample converts the combination (scheduling_pndm.py).
    out_eff = c[0] * eps + c[1] * hist[0] + c[2] * hist[1] + c[3] * hist[2]
    eps_eff = _to_eps_alpha(plan, out_eff, i, sample)

    a_t, a_prev = t["alpha_t"][i], t["alpha_prev"][i]
    b_t, b_prev = 1.0 - a_t, 1.0 - a_prev
    sample_coeff = jnp.sqrt(a_prev / a_t)
    denom = a_t * jnp.sqrt(b_prev) + jnp.sqrt(a_t * b_t * a_prev)
    prev = sample_coeff * sample - (a_prev - a_t) * eps_eff / denom

    new_hist = jnp.where(
        t["append"][i],
        jnp.stack([eps, hist[0], hist[1]]),
        hist,
    )
    new_held = jnp.where(i == 0, sample, held)
    return prev, jnp.concatenate([new_hist, new_held[None]], axis=0)


# ---------------------------------------------------------------------------
# LMSDiscrete (k-diffusion linear multistep, order 4)
# ---------------------------------------------------------------------------

def lms_plan(num_steps: int, num_train_timesteps=1000, beta_start=0.00085,
             beta_end=0.012, beta_schedule="scaled_linear", order=4,
             prediction_type="epsilon") -> Plan:
    betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
    acp = np.cumprod(1.0 - betas)
    sig_all = np.sqrt((1 - acp) / acp)
    t_float = np.linspace(0, num_train_timesteps - 1, num_steps, dtype=np.float64)[::-1]
    sigmas = np.interp(t_float, np.arange(num_train_timesteps), sig_all)
    sigmas = np.concatenate([sigmas, [0.0]])

    from scipy.integrate import quad

    def lms_coeff(o, t, j):
        def fn(tau):
            prod = 1.0
            for k in range(o):
                if k == j:
                    continue
                prod *= (tau - sigmas[t - k]) / (sigmas[t - j] - sigmas[t - k])
            return prod

        return quad(fn, sigmas[t], sigmas[t + 1], epsrel=1e-4)[0]

    coeffs = np.zeros((num_steps, order))
    for t in range(num_steps):
        o = min(t + 1, order)
        for j in range(o):
            coeffs[t, j] = lms_coeff(o, t, j)

    return Plan(
        kind="lms", num_calls=num_steps,
        timesteps=jnp.asarray(t_float.copy(), jnp.float32),
        init_noise_sigma=float(sigmas.max()),
        tables={
            "sigmas": jnp.asarray(sigmas, jnp.float32),
            "coeffs": jnp.asarray(coeffs, jnp.float32),
        },
        history_slots=order,
        prediction_type=prediction_type,
    )


def _lms_step(plan, eps, i, sample, carry):
    t = plan.tables
    # eps-prediction: pred_x0 = sample - sigma*eps; derivative = eps
    derivative = _sigma_derivative(plan, eps, i, sample)
    hist = jnp.concatenate([derivative[None], carry[:-1]], axis=0)
    c = t["coeffs"][i]  # [order]
    delta = jnp.tensordot(c, hist, axes=1)
    return sample + delta, hist


# ---------------------------------------------------------------------------
# EulerDiscrete (SDXL default)
# ---------------------------------------------------------------------------

def euler_plan(num_steps: int, num_train_timesteps=1000, beta_start=0.00085,
               beta_end=0.012, beta_schedule="scaled_linear",
               timestep_spacing="leading", steps_offset=1,
               prediction_type="epsilon") -> Plan:
    betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
    acp = np.cumprod(1.0 - betas)
    sig_all = np.sqrt((1 - acp) / acp)
    if timestep_spacing == "linspace":
        t_float = np.linspace(0, num_train_timesteps - 1, num_steps,
                              dtype=np.float64)[::-1].copy()
    elif timestep_spacing == "leading":
        t_float = _leading_timesteps(
            num_train_timesteps, num_steps, steps_offset
        ).astype(np.float64)
    elif timestep_spacing == "trailing":
        t_float = np.arange(num_train_timesteps, 0,
                            -num_train_timesteps / num_steps).round() - 1
    else:
        raise ValueError(timestep_spacing)
    sigmas = np.interp(t_float, np.arange(num_train_timesteps), sig_all)
    sigmas = np.concatenate([sigmas, [0.0]])
    return Plan(
        kind="euler", num_calls=num_steps,
        timesteps=jnp.asarray(t_float, jnp.float32),
        # diffusers: max sigma for linspace/trailing, sqrt(max^2+1) for leading
        init_noise_sigma=float(sigmas.max()
                               if timestep_spacing in ("linspace", "trailing")
                               else np.sqrt(sigmas.max() ** 2 + 1)),
        tables={"sigmas": jnp.asarray(sigmas, jnp.float32)},
        prediction_type=prediction_type,
    )


def _euler_step(plan, eps, i, sample, carry):
    sigmas = plan.tables["sigmas"]
    d = _sigma_derivative(plan, eps, i, sample)
    return sample + (sigmas[i + 1] - sigmas[i]) * d, carry


# ---------------------------------------------------------------------------
# FlowMatchEuler (FLUX)
# ---------------------------------------------------------------------------

def flow_match_euler_plan(num_steps: int, num_train_timesteps=1000,
                          shift: float = 1.0, use_dynamic_shifting=False,
                          mu: float | None = None) -> Plan:
    sigmas = np.linspace(1.0, 1.0 / num_steps, num_steps, dtype=np.float64)
    if use_dynamic_shifting and mu is not None:
        sigmas = np.exp(mu) / (np.exp(mu) + (1 / sigmas - 1))
    else:
        sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    timesteps = sigmas * num_train_timesteps
    sigmas = np.concatenate([sigmas, [0.0]])
    return Plan(
        kind="flow_euler", num_calls=num_steps,
        timesteps=jnp.asarray(timesteps, jnp.float32),
        init_noise_sigma=1.0,
        tables={"sigmas": jnp.asarray(sigmas, jnp.float32)},
    )


def _flow_euler_step(plan, v, i, sample, carry):
    sigmas = plan.tables["sigmas"]
    return sample + (sigmas[i + 1] - sigmas[i]) * v, carry


_STEP_FNS = {
    "ddim": _ddim_step,
    "pndm": _pndm_step,
    "lms": _lms_step,
    "euler": _euler_step,
    "flow_euler": _flow_euler_step,
}

_PLANNERS = {
    "ddim": ddim_plan,
    "pndm": pndm_plan,
    "plms": pndm_plan,
    "lms": lms_plan,
    "euler": euler_plan,
    "flow_euler": flow_match_euler_plan,
}


def make_plan(name: str, num_steps: int, **kwargs) -> Plan:
    return _PLANNERS[name](num_steps, **kwargs)


SCHEDULER_CLASS_FOR_NAME = {
    "ddim": "DDIMScheduler",
    "pndm": "PNDMScheduler",
    "plms": "PNDMScheduler",
    "lms": "LMSDiscreteScheduler",
    "euler": "EulerDiscreteScheduler",
    "flow_euler": "FlowMatchEulerDiscreteScheduler",
}


def plan_from_hf_as(name: str, cfg: Mapping, num_steps: int) -> Plan:
    """Build a plan of the requested scheduler TYPE (short key, e.g.
    'lms') while inheriting the model's scheduler hyperparameters from its
    diffusers config (prediction_type, beta schedule, num_train_timesteps,
    steps_offset).  A bare ``make_plan(name, n)`` would silently reset
    those to the SD v1 defaults — stepping a v-prediction model (SD 2.x
    768) as epsilon produces pure noise."""
    cls = SCHEDULER_CLASS_FOR_NAME.get(name, name)
    return plan_from_hf(dict(cfg, _class_name=cls), num_steps)


def _reject_unsupported_hf_options(cfg: Mapping, cls: str) -> None:
    """Fail LOUDLY on diffusers config options that change the step math
    but are not implemented here — silently ignoring them would break the
    module's fixed-seed parity contract (tests/torch_pipeline_mirror.py).
    SD-family configs (the reference's models) pass untouched: they set
    clip_sample=false, skip_prk_steps=true, no karras/thresholding."""
    pred = cfg.get("prediction_type", "epsilon")
    if pred not in ("epsilon", "v_prediction"):
        raise ValueError(
            f"prediction_type {pred!r} is not implemented (epsilon / "
            "v_prediction only); stepping it as epsilon would produce "
            "noise")
    if cfg.get("trained_betas") is not None:
        raise ValueError("trained_betas tables are not supported; plans "
                         "derive betas from beta_schedule")
    if cfg.get("thresholding", False):
        raise ValueError("dynamic thresholding is not implemented")
    if cfg.get("use_karras_sigmas", False):
        raise ValueError("use_karras_sigmas is not implemented "
                         "(linear-interpolated sigma tables only)")
    if cls == "DDIMScheduler" and cfg.get("clip_sample", False):
        # This module's DDIM (and its oracle, torch_pipeline_mirror.py)
        # implements the SD convention clip_sample=False; a config that
        # explicitly asks for per-step x0 clamping must fail loudly.
        # (Missing key = False here: SD configs are PNDM-sourced, and the
        # diffusers class default of True is a known trap when switching
        # SD to DDIM.)
        raise ValueError(
            "DDIM clip_sample=true (per-step x0 clamping) is not "
            "implemented; this module follows the SD convention "
            "clip_sample=false")
    if cls == "PNDMScheduler" and not cfg.get("skip_prk_steps", True):
        raise ValueError(
            "PNDM with Runge-Kutta warmup (skip_prk_steps=false) is not "
            "implemented — only the PLMS path SD uses")
    if cls == "EulerDiscreteScheduler" and \
            cfg.get("interpolation_type", "linear") != "linear":
        raise ValueError("EulerDiscrete interpolation_type "
                         f"{cfg['interpolation_type']!r} is not implemented")


def plan_from_hf(cfg: Mapping, num_steps: int,
                 mu: float | None = None) -> Plan:
    """Build a plan from a diffusers scheduler_config.json dict.

    ``mu``: resolution-dependent shift exponent for FlowMatchEuler
    configs with ``use_dynamic_shifting`` (compute via
    pipeline_flux.compute_shift_mu from the packed sequence length);
    ignored for other classes. Dynamic-shifting configs without a ``mu``
    fall back to the static shift with a warning."""
    cls = cfg.get("_class_name", "PNDMScheduler")
    _reject_unsupported_hf_options(cfg, cls)
    common = dict(
        num_train_timesteps=cfg.get("num_train_timesteps", 1000),
        beta_start=cfg.get("beta_start", 0.00085),
        beta_end=cfg.get("beta_end", 0.012),
        beta_schedule=cfg.get("beta_schedule", "scaled_linear"),
        prediction_type=cfg.get("prediction_type", "epsilon"),
    )
    if cls == "PNDMScheduler":
        return pndm_plan(num_steps, steps_offset=cfg.get("steps_offset", 1),
                         set_alpha_to_one=cfg.get("set_alpha_to_one", False),
                         **common)
    if cls == "DDIMScheduler":
        # diffusers' DDIMScheduler CLASS default for set_alpha_to_one is
        # True (SD-family configs carry an explicit False); mirror that
        # for configs missing the key
        return ddim_plan(num_steps, steps_offset=cfg.get("steps_offset", 1),
                         set_alpha_to_one=cfg.get("set_alpha_to_one", True),
                         **common)
    if cls == "LMSDiscreteScheduler":
        return lms_plan(num_steps, **common)
    if cls == "EulerDiscreteScheduler":
        return euler_plan(
            num_steps,
            timestep_spacing=cfg.get("timestep_spacing", "leading"),
            steps_offset=cfg.get("steps_offset", 1), **common)
    if cls == "FlowMatchEulerDiscreteScheduler":
        use_dyn = cfg.get("use_dynamic_shifting", False)
        if use_dyn and mu is None:
            logger.warning(
                "scheduler config requests use_dynamic_shifting but no mu "
                "was provided; using the static shift=%s schedule "
                "(pass mu=compute_shift_mu(seq_len, ...))",
                cfg.get("shift", 1.0))
        return flow_match_euler_plan(
            num_steps, num_train_timesteps=cfg.get("num_train_timesteps", 1000),
            shift=cfg.get("shift", 1.0),
            use_dynamic_shifting=use_dyn, mu=mu)
    raise ValueError(f"unsupported scheduler class: {cls}")
