"""Shared NN building blocks, NHWC layout (TPU-native).

diffusers checkpoints are NCHW/OIHW torch; loaders convert conv kernels to
HWIO and linear weights to [in, out] once at load so every forward is plain
``x @ w`` / ``conv_general_dilated`` with MXU-friendly layouts.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from uce_tpu.ops import quant
from uce_tpu.utils.ablate import ablated  # noqa: F401  (re-export)


_conv_pallas_warned = False


def conv2d(x: jnp.ndarray, kernel, bias: jnp.ndarray | None = None,
           stride: int = 1, padding: int | str = 1) -> jnp.ndarray:
    """NHWC conv. kernel HWIO, or a quantized-int8 dict (ops/quant.py).

    ``UCE_CONV_IMPL=pallas`` routes eligible 3x3 stride-1 convs through
    the Pallas implicit-GEMM kernel (ops/pallas/conv3x3.py: one HBM read
    of x, 9 unrolled MXU taps into an fp32 accumulator) — opt-in for
    end-to-end A/B against XLA's native conv, like UCE_GN_IMPL.
    """
    if quant.is_weight_only(kernel):
        return quant.wconv2d(x, kernel, bias, stride, padding)
    if quant.is_quantized(kernel):
        if not isinstance(padding, int):
            raise ValueError("quantized conv supports integer padding only")
        return quant.qconv2d(x, kernel, bias, stride, padding)
    if (os.environ.get("UCE_CONV_IMPL") == "pallas"
            and jax.default_backend() == "tpu"
            and x.dtype == jnp.bfloat16
            and stride == 1 and padding == 1
            and getattr(kernel, "shape", ())[:2] == (3, 3)):
        from uce_tpu.ops.pallas import conv3x3 as conv_pallas

        if conv_pallas.supported(x, kernel):
            try:
                return conv_pallas.conv3x3(x, kernel, bias)
            except (ValueError, NotImplementedError, RuntimeError) as exc:
                global _conv_pallas_warned
                if not _conv_pallas_warned:
                    _conv_pallas_warned = True
                    import logging

                    logging.getLogger(__name__).warning(
                        "Pallas conv3x3 failed (%s: %s); falling back to "
                        "XLA conv for the rest of this process.",
                        type(exc).__name__, exc)
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = padding
    y = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias
    return y


def linear(x: jnp.ndarray, w, b: jnp.ndarray | None = None):
    if quant.is_weight_only(w):
        return quant.wlinear(x, w, b)
    if quant.is_quantized(w):
        return quant.qlinear(x, w, b)
    y = x @ w
    if b is not None:
        y = y + b
    return y


def mm(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """``x @ p["weight"] (+ p["bias"])`` for param dicts whose weight may
    be raw [in, out] or a weight-only-int8 dict (ops/quant.py) — the
    projection form used by the DiT models (FLUX, HiDream), whose params
    are depth-stacked and sliced inside ``lax.scan``."""
    return linear(x, p["weight"], p.get("bias"))


def group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               num_groups: int = 32, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over NHWC (or N...C) tensors, fp32 statistics.

    bf16 4D inputs take the matmul-statistics path: group sums via a
    channel->group indicator matmul (one elementwise pass + tiny MXU work
    instead of the grouped-reshape reduce, measured ~1.8x faster at SD
    shapes — docs/PERF.md). One-pass E[x^2]-mu^2 variance: its relative
    error (~1e-3 worst case) sits below bf16 input quantization (~4e-3),
    so the perf path is bf16-only; fp32 inputs keep the exact two-pass.
    """
    if ablated("gn"):
        return x
    c = x.shape[-1]
    g = num_groups
    if x.dtype == jnp.bfloat16 and x.ndim == 4:
        return _group_norm_mm(x, scale, bias, g, eps)
    xg = x.astype(jnp.float32).reshape(x.shape[:-1] + (g, c // g))
    axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
    mean = xg.mean(axes, keepdims=True)
    var = xg.var(axes, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = xg.reshape(x.shape) * scale + bias
    return y.astype(x.dtype)


def _group_norm_mm(x, scale, bias, g, eps):
    b, h, w, c = x.shape
    ind = jnp.asarray(
        np.kron(np.eye(g, dtype=np.float32), np.ones((c // g, 1), np.float32)))
    x32 = x.astype(jnp.float32)
    n = h * w * (c // g)
    if os.environ.get("UCE_GN_STATS") == "reduce":
        # A/B variant: plain channel-keeping reductions ('bhwc->bc') are
        # consumer-fusible into the producing conv/elementwise fusion
        # (dots are not), potentially making the stats read free; the
        # tiny [b,c]@[c,g] dot then folds channel sums into group sums.
        s1 = (x32.sum((1, 2)) @ ind) / n
        s2 = ((x32 * x32).sum((1, 2)) @ ind) / n
    else:
        s1 = jnp.einsum("bhwc,cg->bg", x32, ind) / n
        s2 = jnp.einsum("bhwc,cg->bg", x32 * x32, ind) / n
    inv = jax.lax.rsqrt(jnp.maximum(s2 - s1 * s1, 0.0) + eps)
    scale32 = scale.astype(jnp.float32).reshape(g, c // g)
    bias32 = bias.astype(jnp.float32).reshape(g, c // g)
    gamma = (scale32 * inv[:, :, None]).reshape(b, 1, 1, c)
    beta = (bias32 - (s1 * inv)[:, :, None] * scale32).reshape(b, 1, 1, c)
    return (x32 * gamma + beta).astype(x.dtype)


_gn_pallas_warned = False


def group_norm_act(x, scale, bias, num_groups: int = 32, eps: float = 1e-5,
                   act: str = "none"):
    """GroupNorm followed by optional SiLU.

    A Pallas fused kernel exists (ops/pallas/group_norm.py, traffic-floor
    2R+1W) but is opt-in via ``UCE_GN_IMPL=pallas``: measured IN CONTEXT
    it is a net loss (UNet fwd 129.8 -> 142.9 ms at CFG batch 16,
    tools/trace_prof.py) because XLA already fuses the GN stats/apply
    into the surrounding convs and the custom call breaks those fusion
    chains.  Kept for A/B and for toolchains where that fusion regresses.
    """
    global _gn_pallas_warned
    if ablated("gn"):
        return silu(x) if act == "silu" else x
    if (os.environ.get("UCE_GN_IMPL") == "pallas"
            and jax.default_backend() == "tpu"
            and x.dtype == jnp.bfloat16):
        from uce_tpu.ops.pallas import group_norm as gn_pallas

        if gn_pallas.supported(x, num_groups):
            try:
                return gn_pallas.group_norm_act(
                    x, scale, bias, num_groups, eps, act)
            except (ValueError, NotImplementedError, RuntimeError) as exc:
                if not _gn_pallas_warned:
                    _gn_pallas_warned = True
                    import logging

                    logging.getLogger(__name__).warning(
                        "Pallas group_norm failed (%s: %s); falling back "
                        "to XLA for the rest of this process.",
                        type(exc).__name__, exc)
    y = group_norm(x, scale, bias, num_groups, eps)
    return silu(y) if act == "silu" else y


def group_norm_act_split(xs, scale, bias, num_groups: int = 32,
                         eps: float = 1e-5, act: str = "none"):
    """GroupNorm(+SiLU) over the CHANNEL CONCATENATION of ``xs`` without
    materializing the concat.

    Exact by construction: group sums are additive over any channel
    partition (groups need not align with the part boundary — per-channel
    gamma/beta are gathered from the per-group stats), so this computes
    the same statistics as ``group_norm(concat(xs, -1))``. Used by the
    UNet up-block skip path (UCE_SPLIT_SKIP) to avoid the concat copy.
    Returns one normalized tensor per input part.
    """
    if ablated("gn"):  # keep parity with group_norm_act under UCE_ABLATE
        return [silu(x) if act == "silu" else x for x in xs]
    g = num_groups
    widths = [x.shape[-1] for x in xs]
    c_total = sum(widths)
    gsz = c_total // g
    b = xs[0].shape[0]
    n = xs[0].shape[1] * xs[0].shape[2] * gsz

    s1 = jnp.zeros((b, g), jnp.float32)
    s2 = jnp.zeros((b, g), jnp.float32)
    offset = 0
    parts32 = []
    for x, w in zip(xs, widths):
        ind = np.zeros((w, g), np.float32)
        ind[np.arange(w), (offset + np.arange(w)) // gsz] = 1.0
        ind = jnp.asarray(ind)
        x32 = x.astype(jnp.float32)
        parts32.append(x32)
        s1 = s1 + jnp.einsum("bhwc,cg->bg", x32, ind)
        s2 = s2 + jnp.einsum("bhwc,cg->bg", x32 * x32, ind)
        offset += w
    s1, s2 = s1 / n, s2 / n
    inv = jax.lax.rsqrt(jnp.maximum(s2 - s1 * s1, 0.0) + eps)  # [b, g]

    group_of = np.arange(c_total) // gsz
    scale32 = scale.astype(jnp.float32)
    bias32 = bias.astype(jnp.float32)
    gamma = scale32[None, :] * inv[:, group_of]            # [b, c_total]
    beta = bias32[None, :] - s1[:, group_of] * gamma
    outs = []
    offset = 0
    for x, x32, w in zip(xs, parts32, widths):
        ga = gamma[:, offset:offset + w][:, None, None, :]
        be = beta[:, offset:offset + w][:, None, None, :]
        y = x32 * ga + be
        if act == "silu":
            y = jax.nn.silu(y)
        outs.append(y.astype(x.dtype))
        offset += w
    return outs


def layer_norm(x, scale, bias, eps: float = 1e-5):
    """LayerNorm over the last axis, fp32 statistics.

    bf16 inputs take the matmul-statistics path (same trick as
    ``group_norm``): row sums via tiny MXU matmuls instead of fp32 reduce
    passes, then a single fused scale-shift pass.  The second moment is
    computed on the row-CENTERED values (x - mu): the one-pass
    E[x^2]-mu^2 form cancels catastrophically for rows with mu/sigma
    beyond ~2^12 (variance clamps to eps and the output blows up), and
    activation ranges are not bounded enough to rule that out.  Centering
    costs one extra elementwise pass; the matmul reduction is kept.
    """
    if ablated("ln"):
        return x
    if x.dtype == jnp.bfloat16:
        c = x.shape[-1]
        x32 = x.astype(jnp.float32)
        ones = jnp.ones((c, 1), jnp.float32)
        s1 = (x32 @ ones) / c                    # [..., 1] row mean
        xc = x32 - s1
        var = ((xc * xc) @ ones) / c             # [..., 1] centered moment
        inv = jax.lax.rsqrt(var + eps)
        gamma = scale.astype(jnp.float32) * inv
        beta = bias.astype(jnp.float32) - s1 * gamma
        return (x32 * gamma + beta).astype(x.dtype)
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def silu(x):
    return jax.nn.silu(x)


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding).

    timesteps [B] -> [B, dim]; default flags match UNet2DConditionModel
    (flip_sin_to_cos=True, freq_shift=0).
    """
    half = dim // 2
    exponent = -np.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


# ---------------------------------------------------------------------------
# weight conversion helpers (torch state dict -> our layouts)
# ---------------------------------------------------------------------------

def conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def linear_weight(w: np.ndarray) -> np.ndarray:
    """[out, in] -> [in, out]."""
    return np.swapaxes(w, -1, -2)
