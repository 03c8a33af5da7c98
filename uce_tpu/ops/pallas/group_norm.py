"""Pallas TPU fused GroupNorm(+SiLU) over NHWC maps.

Motivation (tools/trace_prof.py on the target chip): XLA executes each
UNet GroupNorm as a stats tuple-fusion plus an apply fusion at 0.6-2.5 ms
per call — 5-15x over HBM-traffic floor — totalling ~20 ms of the 130 ms
SD UNet forward at CFG batch 16.

Structure: two kernels over the row-flattened [B, H*W, C] view with
full-C blocks (Mosaic requires the last block dim be 128-divisible or
full) and row tiles sized to VMEM:

  * stats kernel  — accumulates per-channel [sum, sum^2] across row tiles
    in fp32 scratch (TPU grids iterate sequentially, so scratch carries
    across a batch row's tiles), then on the last tile folds channel sums
    into group stats via a tiny [C, G] indicator matmul and emits
    per-channel gamma/beta [B, 2, C].
  * apply kernel  — y = x * gamma[b] + beta[b] (+ SiLU), elementwise.

Total HBM traffic: 2 reads + 1 write of x — the floor for any two-pass
normalization.

Reference semantics: torch GroupNorm(32, C, eps) exactly as diffusers
ResnetBlock2D / Transformer2DModel use them (``uce_tpu/models/unet.py``);
the reference delegates this to torch (SURVEY §2.4) — this is the
TPU-native replacement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_BLOCK_BYTES = 2 * 1024 * 1024  # bf16 input bytes per block


def _row_tile(hw: int, c: int) -> int:
    rows = max(8, _ROW_BLOCK_BYTES // (2 * c))
    while hw % rows or rows % 8:
        rows -= 1
        if rows < 8:
            return hw  # tiny maps: single block
    return rows


def _stats_kernel(x_ref, g_ref, b_ref, o_ref, acc_ref, *, groups: int,
                  eps: float, n: float, last_r: int):
    r = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)                     # [rows, C]
    rows, c = x.shape
    cg = c // groups

    @pl.when(r == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[0, :] += jnp.sum(x, axis=0)
    acc_ref[1, :] += jnp.sum(x * x, axis=0)

    @pl.when(r == last_r)
    def _finalize():
        s1c = acc_ref[0, :].reshape(1, c)
        s2c = acc_ref[1, :].reshape(1, c)
        ci = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
        gi = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
        ind = (ci // cg == gi).astype(jnp.float32)       # [C, G]
        s1 = jnp.dot(s1c, ind, preferred_element_type=jnp.float32) / n
        s2 = jnp.dot(s2c, ind, preferred_element_type=jnp.float32) / n
        inv = jax.lax.rsqrt(jnp.maximum(s2 - s1 * s1, 0.0) + eps)   # [1, G]
        inv_c = jnp.dot(ind, inv.reshape(groups, 1),
                        preferred_element_type=jnp.float32).reshape(1, c)
        mu_c = jnp.dot(ind, s1.reshape(groups, 1),
                       preferred_element_type=jnp.float32).reshape(1, c)
        gamma = g_ref[0].astype(jnp.float32).reshape(1, c) * inv_c
        beta = b_ref[0].astype(jnp.float32).reshape(1, c) - mu_c * gamma
        o_ref[0, 0, :] = gamma[0]
        o_ref[0, 1, :] = beta[0]


def _apply_kernel(x_ref, gb_ref, o_ref, *, act: str):
    x = x_ref[0].astype(jnp.float32)
    c = x.shape[-1]
    y = x * gb_ref[0, 0, :].reshape(1, c) + gb_ref[0, 1, :].reshape(1, c)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def supported(x: jnp.ndarray, groups: int) -> bool:
    if x.ndim != 4 or x.dtype != jnp.bfloat16:
        return False
    c = x.shape[-1]
    return c % groups == 0


@functools.partial(jax.jit,
                   static_argnames=("groups", "eps", "act", "interpret"))
def group_norm_act(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                   groups: int = 32, eps: float = 1e-5, act: str = "none",
                   interpret: bool = False) -> jnp.ndarray:
    """x [B, H, W, C] -> GroupNorm(groups, eps) (*SiLU if act='silu')."""
    b, h, w, c = x.shape
    hw = h * w
    cg = c // groups
    rows = _row_tile(hw, c)
    n_r = hw // rows
    x2 = x.reshape(b, hw, c)

    gb = pl.pallas_call(
        functools.partial(_stats_kernel, groups=groups, eps=eps,
                          n=float(hw * cg), last_r=n_r - 1),
        grid=(b, n_r),
        in_specs=[
            pl.BlockSpec((1, rows, c), lambda i, r: (i, r, 0)),
            pl.BlockSpec((1, c), lambda i, r: (0, 0)),
            pl.BlockSpec((1, c), lambda i, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, r: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=interpret,
    )(x2, scale.reshape(1, c), bias.reshape(1, c))

    y = pl.pallas_call(
        functools.partial(_apply_kernel, act=act),
        grid=(b, n_r),
        in_specs=[
            pl.BlockSpec((1, rows, c), lambda i, r: (i, r, 0)),
            pl.BlockSpec((1, 2, c), lambda i, r: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, c), lambda i, r: (i, r, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        interpret=interpret,
    )(x2, gb)
    return y.reshape(b, h, w, c)
