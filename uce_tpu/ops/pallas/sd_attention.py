"""Pallas TPU attention for SD UNet shapes: unpadded head dims, whole-row
softmax, K/V resident in VMEM.

Why not the stock flash kernel (jax flash_attention):
  * SD head dims are 40/80/160 — the stock kernel requires lane-width
    inputs, so the caller pads d->128 in HBM: ~7.8 ms of pad plus part of
    ~11 ms of copies per UNet forward (tools/trace_prof.py).  This kernel
    takes q/k/v exactly as produced ([B, H, S, D], any D <= 128-pad
    handled inside VMEM), so those HBM round-trips disappear.
  * SD sequences (<= 4096) let a whole K/V head pair sit in VMEM
    ([4096, 40] lane-padded = 2 MB), so no online-softmax bookkeeping:
    one QK^T, one row softmax, one PV per (batch, head, q-block).
  * The same grid serves cross-attention (kv = 77 CLIP tokens) — the
    second-to-last block dim may equal the full array dim, so no kv
    padding or masking is needed.

MXU note: the contraction dim D=40 is intrinsically 40/128 of the MXU
(Mosaic pads the tile) — identical arithmetic cost to the stock kernel's
padded matmuls; the win is pure HBM traffic.  FLOP floor at s=4096, CFG
batch 16: ~7 ms/call; the stock kernel measures 7.75 ms plus its share
of pads/copies.

Reference: torch scaled_dot_product_attention semantics (diffusers
Attention), fp32 softmax with max subtraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Logits scratch [block_q, S_kv] fp32 is the VMEM driver: 256 x 4096 x 4
# = 4 MB, plus K/V lane-padded (2 x 2 MB at s=4096 d=40) and I/O blocks.
_BLOCK_Q = 256


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]                      # [bq, D] bf16
    k = k_ref[0, 0]                      # [S_kv, D] bf16
    v = v_ref[0, 0]                      # [S_kv, D] bf16
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                            # [bq, S_kv]
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    p = (e / jnp.sum(e, axis=1, keepdims=True)).astype(q.dtype)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def sd_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 scale: float, interpret: bool = False) -> jnp.ndarray:
    """q [B, H, Sq, D], k/v [B, H, Skv, D] (mask-free) -> [B, H, Sq, D].

    D may be any size (lane padding happens in VMEM, not HBM); Sq must be
    divisible by the q block; Skv is kept whole per (batch, head).
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    bq = min(_BLOCK_Q, sq)
    assert sq % bq == 0, (sq, bq)

    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(b, h, sq // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda i, j, r: (i, j, r, 0)),
            pl.BlockSpec((1, 1, skv, d), lambda i, j, r: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, skv, d), lambda i, j, r: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda i, j, r: (i, j, r, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def supported(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    if q.ndim != 4 or q.dtype != jnp.bfloat16:
        return False
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if sq % min(_BLOCK_Q, sq):
        return False
    # logits scratch + K/V residency bound (lane-padded to 128)
    dp = ((d + 127) // 128) * 128
    vmem = min(_BLOCK_Q, sq) * skv * 4 + 2 * skv * dp * 2
    return vmem <= 10 * 1024 * 1024
