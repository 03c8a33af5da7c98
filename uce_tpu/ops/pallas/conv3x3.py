"""Pallas TPU 3x3 stride-1 convolution (NHWC, bf16).

XLA's native conv at SD UNet shapes measures ~27 TFLOP/s on the target
chip (tools/perf_probe.py convvar); the equivalent 9-tap matmul
decomposition in XLA is HBM-bound because each tap re-reads the input from
HBM. This kernel keeps one image (plus halo) resident in VMEM and runs the
9 taps as unrolled MXU matmuls into a single fp32 accumulator — one HBM
read of x, one write of y, 9x the arithmetic intensity of the XLA
decomposition.

Grid: (batch, cout tiles). Per step: x tile [1, H+2, W+2, Cin] (pre-padded
by the caller in XLA — overlapping halo blocks are not expressible with
Pallas block index maps), w tile [3, 3, Cin, TC], out [1, H, W, TC].

Mosaic gotchas honored (docs/PERF.md): no transposes inside the kernel, no
Precision.HIGHEST, the tap loop is unrolled Python (no fori_loop carries).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, w_ref, o_ref, *, h: int, w: int):
    acc = None
    for ky in range(3):
        for kx in range(3):
            xs = x_ref[0, ky:ky + h, kx:kx + w, :]
            xs = xs.reshape(h * w, xs.shape[-1])
            part = jnp.dot(xs, w_ref[ky, kx],
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    o_ref[0] = acc.reshape(h, w, o_ref.shape[-1]).astype(o_ref.dtype)


def _pick_cout_tile(cin: int, cout: int, h: int, w: int,
                    vmem_budget: int = 14 * 1024 * 1024) -> int:
    """Largest cout tile that fits the 16 MB scoped-VMEM limit.

    Pallas double-buffers every in/out block across grid steps (docs/
    PERF.md), so the x/weight/out blocks count TWICE; the fp32 accumulator
    is kernel-local scratch and counts once. Budget leaves ~2 MB headroom
    under the 16 MB Mosaic limit.
    """
    # Every candidate must DIVIDE cout (the grid covers cout // tc tiles;
    # a non-divisor would leave trailing channels unwritten) AND satisfy
    # Mosaic's block-shape rule: the last block dim is either the FULL
    # array dim or a multiple of 128 (a partial non-lane-aligned tile like
    # 160/320 is rejected at lowering on real TPUs — interpret mode does
    # not enforce this, so don't trust CPU tests alone here).
    candidates = [d for d in range(1, cout + 1)
                  if cout % d == 0 and (d == cout or d % 128 == 0)]
    for tc in sorted(candidates, reverse=True):
        weights = 9 * cin * tc * 2
        acc = h * w * tc * 4
        xtile = (h + 2) * (w + 2) * cin * 2
        otile = h * w * tc * 2
        if 2 * (weights + xtile + otile) + acc <= vmem_budget:
            return tc
    return 0  # nothing fits (the x tile alone blows VMEM) -> unsupported


def supported(x, kernel) -> bool:
    """True when this kernel can handle the call: 3x3 HWIO kernel, 4-D
    NHWC input, and some cout tile fits the scoped-VMEM budget."""
    if x.ndim != 4 or kernel.ndim != 4 or kernel.shape[:2] != (3, 3):
        return False
    b, h, w, cin = x.shape
    return _pick_cout_tile(cin, kernel.shape[-1], h, w) > 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
            bias: jnp.ndarray | None = None,
            interpret: bool = False) -> jnp.ndarray:
    """x [B, H, W, Cin] (NHWC), kernel [3, 3, Cin, Cout] (HWIO), stride 1,
    SAME padding. Returns [B, H, W, Cout] in x.dtype."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    tc = _pick_cout_tile(cin, cout, h, w)
    if tc <= 0:
        raise ValueError(
            f"conv3x3: no cout tile fits scoped VMEM for shape {x.shape} "
            f"x {kernel.shape}")
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w),
        grid=(b, cout // tc),
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2, cin), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((3, 3, cin, tc), lambda i, j: (0, 0, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, h, w, tc), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        interpret=interpret,
    )(xp, kernel)
    if bias is not None:
        out = out + bias
    return out
