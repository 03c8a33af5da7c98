"""Attention entry point: Pallas flash attention on TPU, XLA einsum fallback.

One function, ``dot_product_attention``, used by every model in the zoo
(CLIP text/vision, SD UNet, T5, Llama, FLUX DiT). On TPU with MXU-friendly
shapes it dispatches to the Pallas TPU flash-attention kernel; everywhere
else (CPU tests, odd head dims) it uses a fused XLA softmax-attention in
fp32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None,
    causal: bool,
    scale: float,
) -> jnp.ndarray:
    """Reference attention: q,k,v [B, H, T, Dh] -> [B, H, Tq, Dh]."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if causal:
        tq, tk = q.shape[-2], k.shape[-2]
        causal_mask = jnp.tril(jnp.ones((tq, tk), dtype=bool), k=tk - tq)
        logits = jnp.where(causal_mask[None, None], logits, jnp.finfo(jnp.float32).min)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _flash_supported(q, k, v, mask, causal) -> bool:
    if jax.default_backend() != "tpu":
        return False
    if mask is not None:
        return False
    head_dim = q.shape[-1]
    # Pallas flash kernel wants lane-aligned head dims and longish sequences.
    return head_dim % 128 == 0 and q.shape[-2] >= 128 and k.shape[-2] >= 128


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: jnp.ndarray | None = None,
    causal: bool = False,
    scale: float | None = None,
    force_xla: bool = False,
) -> jnp.ndarray:
    """Multi-head attention over [B, H, T, Dh] tensors.

    mask: optional boolean [B, 1|H, Tq, Tk]; True = attend.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if not force_xla and _flash_supported(q, k, v, mask, causal):
        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention,
            )

            return flash_attention(
                q * scale, k, v, causal=causal
            ).astype(q.dtype)
        except Exception:  # pragma: no cover - kernel shape corner cases
            pass
    return _xla_attention(q, k, v, mask, causal, scale)
