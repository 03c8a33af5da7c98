"""Fused denoising loop: CFG + scheduler step inside one ``jax.lax.scan``.

The reference's hot loop — per-step Python iteration calling the UNet twice
and a stateful scheduler (``evalscripts/debiasing_vl.py:128-143``) — becomes
a single scan body: one batched UNet call over [uncond; cond] (or the
baselines' multi-branch batches), guidance combine, and the scheduler's
table-driven step, jitted once and compiled by XLA with donated latents.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from uce_tpu.diffusion.schedulers import Plan


def cfg_combine(eps_branches: jnp.ndarray, guidance_scale) -> jnp.ndarray:
    """Standard classifier-free guidance over [uncond; cond] stacking."""
    eps_u, eps_c = jnp.split(eps_branches, 2, axis=0)
    return eps_u + guidance_scale * (eps_c - eps_u)


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
