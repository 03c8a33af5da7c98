"""Fused denoising loop: CFG + scheduler step inside one ``jax.lax.scan``.

The reference's hot loop — per-step Python iteration calling the UNet twice
and a stateful scheduler (``evalscripts/debiasing_vl.py:128-143``) — becomes
a single scan body: one batched UNet call over [uncond; cond] (or the
baselines' multi-branch batches), guidance combine, and the scheduler's
table-driven step, jitted once and compiled by XLA with donated latents.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from uce_tpu.diffusion.schedulers import Plan


def cfg_combine(eps_branches: jnp.ndarray, guidance_scale) -> jnp.ndarray:
    """Standard classifier-free guidance over [uncond; cond] stacking."""
    eps_u, eps_c = jnp.split(eps_branches, 2, axis=0)
    return eps_u + guidance_scale * (eps_c - eps_u)


@dataclasses.dataclass(frozen=True)
class FastConfig:
    """Opt-in inference accelerations BEYOND the reference protocol.

    The reference's eval protocol (50 steps, CFG at every step —
    ``evalscripts/generate-images-sd.py:58-62``) is what bench.py's
    headline and all parity tests measure; these modes trade exactness
    for throughput and are therefore never on by default.

    cfg_interval: ``(lo, hi)`` — run classifier-free guidance only for
        scheduler calls ``lo <= i < hi``; outside the window only the
        cond branch runs (half the UNet batch). Guidance confined to a
        middle interval is quality-NEUTRAL-or-better at same step count
        (Kynkaanniemi et al. 2024, arXiv:2404.07724). ``None`` = CFG
        everywhere (reference protocol).
    cache_interval: DeepCache N (arXiv:2312.00858) — the deep UNet
        levels run every N-th call and their output feature is reused
        in between; cached calls execute only the shallow path.
        1 = no caching (exact).
    cache_level: how many full-resolution levels stay live on cached
        calls (see ``models/unet.deep_feature_shape``).
    """

    cfg_interval: tuple | None = None
    cache_interval: int = 1
    cache_level: int = 1

    def __post_init__(self):
        if self.cache_interval < 1:
            raise ValueError("cache_interval must be >= 1")
        if self.cache_level < 1:
            # the per-model upper bound is checked in the model's apply();
            # catch the lower bound here rather than failing at trace time
            # with a negative-shift error from deep_feature_shape
            raise ValueError("cache_level must be >= 1")
        if self.cfg_interval is not None:
            lo, hi = self.cfg_interval
            if lo < 0 or hi < lo:
                raise ValueError("cfg_interval must satisfy 0 <= lo <= hi")

    @property
    def is_noop(self) -> bool:
        return self.cfg_interval is None and self.cache_interval == 1

    def segments(self, total: int) -> list:
        """Split ``total`` scheduler calls into up to three statically
        shaped scan segments ``(start, end, cond_only)``: cond-only
        before the CFG window, guided inside it, cond-only after. The
        single source of truth for the window semantics — used by the
        SD sampler, the HiDream pipeline, and bench.py (``lo``/``hi``
        are clamped into ``[0, total]``; empty segments are dropped)."""
        if self.cfg_interval is None:
            return [(0, total, False)]
        lo = min(max(int(self.cfg_interval[0]), 0), total)
        hi = min(max(int(self.cfg_interval[1]), lo), total)
        return [s for s in ((0, lo, True), (lo, hi, False),
                            (hi, total, True)) if s[1] > s[0]]

    @classmethod
    def from_spec(cls, spec: str) -> "FastConfig":
        """Parse the CLI spec: ``cfg_interval=lo:hi,cache=N,level=L``.

        Every key is optional; ``--fast cache=3`` or
        ``--fast cfg_interval=5:40`` alone are valid. Unknown keys raise.
        """
        kw = {}
        for part in spec.split(","):
            part = part.strip()
            if not part:
                continue
            key, _, val = part.partition("=")
            key, val = key.strip(), val.strip()
            if key == "cfg_interval":
                lo, colon, hi = val.partition(":")
                if not colon or not lo.strip() or not hi.strip():
                    raise ValueError(
                        f"cfg_interval wants 'lo:hi' (got {val!r}), "
                        "e.g. cfg_interval=5:30")
                kw["cfg_interval"] = (int(lo), int(hi))
            elif key == "cache":
                kw["cache_interval"] = int(val)
            elif key == "level":
                kw["cache_level"] = int(val)
            else:
                raise ValueError(
                    f"unknown --fast key {key!r} "
                    "(expected cfg_interval=lo:hi, cache=N, level=L)")
        return cls(**kw)


def denoise(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    plan: Plan,
    latents: jnp.ndarray,
    *,
    guidance_fn: Callable[..., jnp.ndarray],
    num_branches: int = 2,
    guidance_state=None,
) -> jnp.ndarray:
    """Run the full denoising scan.

    model_fn(latents_in [num_branches*B, H, W, C], t) -> eps for each branch
    (closure carries text embeddings / added conditioning).
    guidance_fn: either eps_branches -> eps (stateless), or
    (eps_branches, step_index, state) -> (eps, state) when
    ``guidance_state`` is given (e.g. SLD safety momentum).
    ``latents`` are the raw unit gaussians; init_noise_sigma scaling happens
    here (reference: ``debiasing_vl.py:122``).
    """
    latents = latents * plan.init_noise_sigma
    # Multistep history is kept fp32 regardless of the compute dtype — the
    # scheduler arithmetic is precision-sensitive and tiny next to the UNet.
    carry0 = plan.init_carry(latents.shape, jnp.float32)
    stateful = guidance_state is not None
    gstate0 = guidance_state if stateful else jnp.zeros((0,), jnp.float32)

    def body(carry, i):
        lat, hist, gstate = carry
        lat_in = jnp.concatenate([lat] * num_branches, axis=0)
        lat_in = plan.scale_model_input(lat_in, i)
        t = plan.timesteps[i]
        eps_branches = model_fn(lat_in, t)
        if stateful:
            eps, gstate = guidance_fn(eps_branches, i, gstate)
        else:
            eps = guidance_fn(eps_branches)
        eps = eps.astype(lat.dtype)
        new_lat, hist = plan.step(
            eps.astype(jnp.float32), i, lat.astype(jnp.float32), hist
        )
        return (new_lat.astype(lat.dtype), hist, gstate), None

    (final, _, _), _ = jax.lax.scan(
        body, (latents, carry0, gstate0), jnp.arange(plan.num_calls)
    )
    return final


def denoise_fast(
    model_factory: Callable[[bool, bool, bool], Callable],
    plan: Plan,
    latents: jnp.ndarray,
    *,
    guidance_scale,
    fast: FastConfig,
) -> jnp.ndarray:
    """Denoising scan with the FastConfig accelerations.

    ``model_factory(cond_only, cached, want_deep)`` returns the model
    closure for one static variant:

    * ``cached=False, want_deep=False``: ``f(lat_in, t) -> eps``
    * ``cached=False, want_deep=True``:  ``f(lat_in, t) -> (eps, deep)``
    * ``cached=True``:                   ``f(lat_in, t, deep) -> eps``

    with ``lat_in`` batched over [uncond; cond] unless ``cond_only``.
    The deep-feature carry's shape AND dtype come from ``jax.eval_shape``
    of the full variant (the model may compute its mid-network feature in
    a different dtype than the latents), so the scan carry initializes
    without running the model.

    The CFG interval splits the run into up to three statically-shaped
    scan segments (cond-only at batch B, guided at 2B, cond-only at B);
    within a segment DeepCache picks full vs shallow per step with
    ``lax.cond`` on ``i % cache_interval``. The deep cache survives the
    guided -> cond boundary (slice the cond half); entering a guided
    segment the uncond half has no cache, so that segment's first step
    is forced full.
    """
    latents = latents * plan.init_noise_sigma
    hist = plan.init_carry(latents.shape, jnp.float32)
    bsz = latents.shape[0]
    total = plan.num_calls
    n_cache = fast.cache_interval
    segs = fast.segments(total)

    lat = latents
    deep = None
    for seg_start, seg_end, cond_only in segs:
        branches = 1 if cond_only else 2
        if cond_only:
            def guidance(e):
                return e
        else:
            def guidance(e):
                return cfg_combine(e, guidance_scale)

        if n_cache == 1:
            f_full = model_factory(cond_only, False, False)

            def body(carry, i, f_full=f_full, guidance=guidance,
                     branches=branches):
                l, h = carry
                lat_in = (jnp.concatenate([l] * branches, axis=0)
                          if branches > 1 else l)
                lat_in = plan.scale_model_input(lat_in, i)
                # cast chain mirrors denoise() exactly so the no-op
                # FastConfig reproduces the baseline bit-for-bit
                eps = guidance(f_full(lat_in, plan.timesteps[i]))
                eps = eps.astype(l.dtype)
                new_l, h = plan.step(eps.astype(jnp.float32), i,
                                     l.astype(jnp.float32), h)
                return (new_l.astype(l.dtype), h), None

            (lat, hist), _ = jax.lax.scan(
                body, (lat, hist), jnp.arange(seg_start, seg_end))
            continue

        f_full = model_factory(cond_only, False, True)
        f_cached = model_factory(cond_only, True, False)
        deep_sds = jax.eval_shape(
            lambda li, t: f_full(li, t)[1],
            jax.ShapeDtypeStruct((branches * bsz,) + lat.shape[1:],
                                 lat.dtype),
            jax.ShapeDtypeStruct((), plan.timesteps.dtype),
        )
        force_full = None
        if deep is not None and deep.shape[0] == 2 * bsz and branches == 1:
            deep = deep[bsz:]  # guided -> cond: keep the cond half's cache
        elif deep is None or deep.shape != deep_sds.shape:
            deep = jnp.zeros(deep_sds.shape, deep_sds.dtype)
            force_full = seg_start  # cache invalid until the first full step

        def body(carry, i, f_full=f_full, f_cached=f_cached,
                 guidance=guidance, branches=branches, force_full=force_full):
            l, h, d = carry
            lat_in = (jnp.concatenate([l] * branches, axis=0)
                      if branches > 1 else l)
            lat_in = plan.scale_model_input(lat_in, i)
            t = plan.timesteps[i]
            is_full = (i % n_cache) == 0
            if force_full is not None:
                is_full = is_full | (i == force_full)
            eps, d = jax.lax.cond(
                is_full,
                lambda li, dd: f_full(li, t),
                lambda li, dd: (f_cached(li, t, dd), dd),
                lat_in, d,
            )
            eps = guidance(eps).astype(l.dtype)
            new_l, h = plan.step(eps.astype(jnp.float32), i,
                                 l.astype(jnp.float32), h)
            return (new_l.astype(l.dtype), h, d), None

        (lat, hist, deep), _ = jax.lax.scan(
            body, (lat, hist, deep), jnp.arange(seg_start, seg_end))
    return lat
