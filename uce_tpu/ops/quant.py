"""Post-training W8A8 int8 quantization for the diffusion compute path.

TPU-native rationale: the v5e MXU runs int8 x int8 -> int32 at 2x the
bf16 rate (394 vs 197 TOP/s).  The SD denoising step is ~76% conv +
projection matmuls by FLOPs (tools/flop_count.py), all of which tolerate
8-bit quantization well-studied in diffusion inference (Q-Diffusion,
SmoothQuant-style W8A8).  This module provides:

  * ``quantize_weight(w)``       -- per-output-channel symmetric int8
  * ``qlinear(x, qw, b)``        -- dynamic per-token activation quant
  * ``qconv2d(x, qk, b, ...)``   -- dynamic per-image activation quant,
                                    int8 matmul formulation (9-tap shifts
                                    for 3x3; direct matmul for 1x1)

Quantized tensors are plain dicts ``{"qint8": int8 vals, "scale": f32}``
so they ride the param pytree through jit without custom pytree nodes.
``uce_tpu/models/quantize.py`` decides which layers get quantized.

A second, weight-only mode (``{"w8int": int8, "scale": f32}``) keeps the
arithmetic in bf16: the int8 weight is cast to the activation dtype inside
the matmul/conv (XLA fuses the convert into the operand read) and the
per-output-channel scale is applied to the output, which is exact because
it commutes with the contraction.  This mode exists for MEMORY, not MXU
rate — it halves weight HBM residency and bandwidth, which is what lets
the full 12 B-param FLUX DiT serve on a single 16 GB v5e chip
(``bench.py --flux_w8``), while sidestepping this toolchain's int8-op
compile cliffs (docs/PERF.md "int8 measured reality").

The reference has no quantization story (fp32/bf16 torch throughout,
``trainscripts/uce_sd_erase.py:117``); this is an opt-in deployment
feature — the edit algebra and default pipelines stay bf16/fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

QKEY = "qint8"
WKEY = "w8int"


def is_quantized(w) -> bool:
    """True for W8A8 dicts (int8 x int8 MXU path)."""
    return isinstance(w, dict) and QKEY in w


def is_weight_only(w) -> bool:
    """True for weight-only int8 dicts (bf16 arithmetic, int8 storage)."""
    return isinstance(w, dict) and WKEY in w


def concat_weights(ws):
    """Concatenate weights along the output (last) axis for fused
    projections (e.g. QKV).  Handles all-raw, all-W8A8, and all-weight-only
    inputs (per-output-channel scales concatenate losslessly); returns
    ``None`` for mixed inputs so the caller can fall back to separate
    matmuls."""
    for key in (QKEY, WKEY):
        flags = [isinstance(w, dict) and key in w for w in ws]
        if all(flags):
            return {
                key: jnp.concatenate([w[key] for w in ws], axis=-1),
                "scale": jnp.concatenate([w["scale"] for w in ws], axis=-1),
            }
        if any(flags):
            return None
    return jnp.concatenate(ws, axis=-1)


def quantize_weight(w: jnp.ndarray, out_axis: int = -1,
                    weight_only: bool = False) -> dict:
    """Symmetric per-output-channel int8 quantization.

    w: float weight; ``out_axis`` is the output-channel axis (last for
    both [in, out] linear weights and HWIO conv kernels).
    ``weight_only=True`` produces a ``{"w8int", "scale"}`` dict consumed
    by the bf16-arithmetic ``wlinear``/``wconv2d`` path instead of the
    int8-MXU ``qlinear``/``qconv2d`` path.
    """
    w = jnp.asarray(w, jnp.float32)
    axes = tuple(i for i in range(w.ndim) if i != w.ndim + out_axis
                 and i != out_axis)
    amax = jnp.max(jnp.abs(w), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {WKEY if weight_only else QKEY: q,
            "scale": scale.astype(jnp.float32)}


def _quant_act(x: jnp.ndarray, axes) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic symmetric int8 quantization of activations over ``axes``."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def qlinear(x: jnp.ndarray, qw: dict, b: jnp.ndarray | None = None):
    """x [..., in] @ int8 weight [in, out] with per-token activation quant."""
    xq, xs = _quant_act(x, axes=(-1,))
    y = jax.lax.dot_general(
        xq, qw[QKEY],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    w_scale = qw["scale"].reshape((1,) * (y.ndim - 1) + (-1,))
    y = y.astype(jnp.float32) * (xs * w_scale)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def qconv2d(x: jnp.ndarray, qk: dict, b: jnp.ndarray | None = None,
            stride: int = 1, padding: int = 1):
    """NHWC conv with int8 HWIO kernel, per-image activation scales.

    3x3 kernels use the 9-shifted-tap int8 matmul formulation (each tap is
    an int8 x int8 -> int32 MXU matmul; the pad/slice taps are cheap); 1x1
    kernels are a single matmul.  Per-image (not per-pixel) activation
    scales commute with the spatial sum, so dequantization is exact given
    the quantized operands.
    """
    k = qk[QKEY]
    kh, kw, cin, cout = k.shape
    xq, xs = _quant_act(x, axes=(1, 2, 3))  # per-image scale [B,1,1,1]
    bsz, h, w, _ = x.shape

    if (kh, kw) == (1, 1):
        if padding:
            # Match the float conv path's output shape for padded 1x1
            # convs; zero pads are exact in the quantized domain (0 -> 0).
            xq = jnp.pad(xq, ((0, 0), (padding, padding),
                              (padding, padding), (0, 0)))
        if stride != 1:
            # a strided 1x1 conv only ever reads the strided grid — slice
            # BEFORE the matmul (exact; saves stride^2 x the int8 MXU
            # work and the full-resolution int32 intermediate)
            xq = xq[:, ::stride, ::stride]
        y = jax.lax.dot_general(
            xq, k.reshape(cin, cout),
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    else:
        xp = jnp.pad(xq, ((0, 0), (padding, padding), (padding, padding),
                          (0, 0)))
        oh = (h + 2 * padding - kh) // stride + 1
        ow = (w + 2 * padding - kw) // stride + 1
        y = None
        for dy in range(kh):
            for dx in range(kw):
                tap = jax.lax.slice(
                    xp, (0, dy, dx, 0),
                    (bsz, dy + (oh - 1) * stride + 1,
                     dx + (ow - 1) * stride + 1, cin),
                    (1, stride, stride, 1))
                t = jax.lax.dot_general(
                    tap, k[dy, dx],
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                y = t if y is None else y + t

    w_scale = qk["scale"].reshape(1, 1, 1, cout)
    yf = y.astype(jnp.float32) * (xs * w_scale)
    if b is not None:
        yf = yf + b.astype(jnp.float32)
    return yf.astype(x.dtype)


def wlinear(x: jnp.ndarray, qw: dict, b: jnp.ndarray | None = None):
    """x [..., in] @ weight-only-int8 [in, out], bf16 arithmetic.

    The int8 weight is cast to the activation dtype inside the dot (one
    fused convert on the operand read — half the weight HBM bytes of a
    bf16 weight) and the per-output-channel scale is applied to the
    output, where it commutes exactly with the contraction.
    """
    w = qw[WKEY]
    y = jax.lax.dot_general(
        x, w.astype(x.dtype),
        dimension_numbers=(((x.ndim - 1,), (w.ndim - 2,)), ((), ())),
    )
    scale = qw["scale"].reshape((1,) * (y.ndim - 1) + (-1,))
    y = y * scale.astype(y.dtype)
    if b is not None:
        y = y + b
    return y


def wconv2d(x: jnp.ndarray, qk: dict, b: jnp.ndarray | None = None,
            stride: int = 1, padding=1):
    """NHWC conv with weight-only-int8 HWIO kernel, bf16 arithmetic.

    Same output-side per-channel rescale as ``wlinear`` (exact: the scale
    commutes with the spatial+channel contraction).
    """
    k = qk[WKEY]
    pad = ([(padding, padding), (padding, padding)]
           if isinstance(padding, int) else padding)
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y * qk["scale"].reshape(1, 1, 1, -1).astype(y.dtype)
    if b is not None:
        y = y + b
    return y
