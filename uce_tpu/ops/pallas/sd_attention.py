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

# Logits scratch [block_q, S_kv] fp32 is the VMEM driver (Mosaic reuses
# it for the exp/normalize passes), plus lane-padded K/V residency and
# the q/o I/O blocks.  Pallas double-buffers every in/out block across
# grid steps, so K/V and q/o count twice — ignoring that undercounted
# the VAE mid-block shape (s=4096, d=512) by ~4.4 MB and let it through
# to a compile-time scoped-vmem OOM ("exceeded the vmem limit by 1.00M"
# on bf16[12,1,4096,512]).  Anchors at s=4096 d=40: bq=512 9.60 ms, 256
# 10.46, 128 12.01; bq=1024 exceeds the 16 MB scoped-vmem limit
# (compiler reported 20.84 M; this model says 22 M).  Blocks are picked
# per shape: the largest of (512, 256, 128, sq) that divides sq and
# fits the budget.
_BLOCK_CANDIDATES = (512, 256, 128)
_VMEM_BUDGET = 14 * 1024 * 1024  # 16 MB scoped limit minus slack


def _pick_block_q(sq: int, skv: int, d: int) -> int | None:
    import os

    dp = ((d + 127) // 128) * 128
    override = os.environ.get("UCE_SDK_BLOCK_Q")
    if override is not None:
        try:
            override = int(override)
        except ValueError:
            import logging

            logging.getLogger(__name__).warning(
                "ignoring malformed UCE_SDK_BLOCK_Q=%r", override)
            override = None
    cands = ((override,) if override
             else _BLOCK_CANDIDATES + ((sq,) if sq < 128 else ()))
    for bq in cands:
        if bq > sq or sq % bq:
            continue
        # logits scratch (single) + double-buffered K/V residency +
        # double-buffered q/o I/O blocks
        vmem = bq * skv * 4 + 2 * (2 * skv * dp * 2) + 2 * (2 * bq * dp * 2)
        if vmem <= _VMEM_BUDGET:
            return bq
    return None


def _pv_flip_max() -> int:
    """Head-dim threshold below which PV runs transposed (see _kernel).
    Tunable for probes via UCE_SDK_PV_FLIP_MAX; 64 is the measured
    crossover at the production block sizes."""
    import os

    return int(os.environ.get("UCE_SDK_PV_FLIP_MAX", 64))


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
    if v.shape[1] < _pv_flip_max():
        # PV as V^T P^T: contraction (S_kv) and output-N (bq) both fill
        # the 128-lane MXU tiles; the tiny head dim D streams through M
        # — vs P @ V whose N=D pads 40->128 (3.2x waste). Measured win
        # only at d=40 (10.46 vs 11.14 ms at s=4096); at d>=80 the
        # transposed store costs more than the padding saved.
        ot = jax.lax.dot_general(
            v, p, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                # [D, bq]
        o_ref[0, 0] = ot.T.astype(o_ref.dtype)
    else:
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "qk_int8"))
def sd_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 scale: float, interpret: bool = False,
                 qk_int8: bool = False) -> jnp.ndarray:
    """q [B, H, Sq, D], k/v [B, H, Skv, D] (mask-free) -> [B, H, Sq, D].

    D may be any size (lane padding happens in VMEM, not HBM); Sq must be
    divisible by the q block; Skv is kept whole per (batch, head).
    qk_int8 runs the QK^T contraction on the int8 MXU path (see
    ``_kernel_qk8``) — opt-in for quantized serving.
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    bq = _pick_block_q(sq, skv, d)
    assert bq is not None, (sq, skv, d)

    grid = (b, h, sq // bq)
    q_spec = pl.BlockSpec((1, 1, bq, d), lambda i, j, r: (i, j, r, 0))
    kv_spec = pl.BlockSpec((1, 1, skv, d), lambda i, j, r: (i, j, 0, 0))
    out_spec = pl.BlockSpec((1, 1, bq, d), lambda i, j, r: (i, j, r, 0))
    out_shape = jax.ShapeDtypeStruct((b, h, sq, d), q.dtype)

    if qk_int8:
        # K quantization is q-block-invariant, so it runs ONCE here in XLA
        # (one pass over K) instead of once per q-block inside the kernel.
        kf = k.astype(jnp.float32)
        kc = kf - jnp.mean(kf, axis=2, keepdims=True)  # center per channel
        ks = jnp.maximum(jnp.max(jnp.abs(kc), axis=3), 1e-6) / 127.0
        ki = jnp.round(kc / ks[..., None]).astype(jnp.int8)
        return pl.pallas_call(
            functools.partial(_kernel_qk8, scale=scale),
            grid=grid,
            in_specs=[
                q_spec,
                kv_spec,
                pl.BlockSpec((1, 1, 1, skv), lambda i, j, r: (i, j, 0, 0)),
                kv_spec,
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(q, ki, ks[:, :, None, :], v)

    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(q, k, v)


def _kernel_qk8(q_ref, ki_ref, ks_ref, v_ref, o_ref, *, scale: float):
    """Int8 QK^T variant: the MXU runs int8 at 2x the bf16 rate and the
    QK^T contraction (K=d=40/80) is the padded, MXU-bound half of SD
    attention.  Per-token symmetric int8 quantization of q (here) and k
    (hoisted to XLA in ``sd_attention`` — it is q-block-invariant), with
    k mean-centered per channel first — the centering adds a per-row
    constant to the logits, which softmax cancels exactly, and it
    removes the channel-mean outlier mass that would otherwise eat the
    8-bit range (SageAttention-style).  PV stays bf16: its contraction
    (K=s_kv) already fills the lanes, so int8 would buy little and cost
    accuracy on the probability side."""
    q = q_ref[0, 0].astype(jnp.float32)     # [bq, D]
    ki = ki_ref[0, 0]                        # [S_kv, D] int8
    ks = ks_ref[0, 0]                        # [1, S_kv] f32 per-token scale
    v = v_ref[0, 0]                          # [S_kv, D] bf16
    qs = jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True), 1e-6) / 127.0
    qi = jnp.round(q / qs).astype(jnp.int8)
    logits_i = jax.lax.dot_general(
        qi, ki, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                        # [bq, S_kv]
    logits = logits_i.astype(jnp.float32) * (qs * ks) * scale
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    p = (e / jnp.sum(e, axis=1, keepdims=True)).astype(v.dtype)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def supported(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    if q.ndim != 4 or q.dtype != jnp.bfloat16:
        return False
    b, h, sq, d = q.shape
    return _pick_block_q(sq, k.shape[2], d) is not None
