"""Attention entry point used by every model in the zoo.

Policy (measured on the target chip — see docs/PERF.md):
  * XLA einsum attention with logits in the compute dtype and an fp32
    softmax wins at SD shapes: head dims 40/80/160 would need padding to
    the 128-lane MXU for the Pallas flash kernel, which measured 2.6-3.4x
    slower than XLA at seq 4096 despite avoiding the logits
    materialization.
  * The Pallas flash kernel remains available (``impl='flash'``) for
    lane-aligned head dims (FLUX: 128) and long sequences.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)
_fallback_warned = False          # flash kernel (kept name: tests patch it)
_sdk_fallback_warned = False      # sd kernel has its own once-flag
_not_applicable_warned = False    # informational notice, not a failure


def _warn_flash_fallback(exc: Exception, kernel: str = "flash") -> None:
    """Log a kernel->fallback degradation once per process PER KERNEL so a
    tuned-kernel regression (e.g. after a toolchain bump) is visible in
    stderr instead of silently halving throughput.  Separate flags: an sdk
    failure must not consume the flash kernel's only warning."""
    global _fallback_warned, _sdk_fallback_warned
    if kernel == "sdk":
        if _sdk_fallback_warned:
            return
        _sdk_fallback_warned = True
        logger.warning(
            "Pallas sd attention kernel failed (%s: %s); falling back to "
            "the flash/XLA path for the rest of this process.",
            type(exc).__name__, exc)
        return
    if not _fallback_warned:
        _fallback_warned = True
        logger.warning(
            "Pallas flash attention failed (%s: %s); falling back to XLA "
            "attention for the rest of this process.",
            type(exc).__name__, exc)


def _xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None,
    causal: bool,
    scale: float,
) -> jnp.ndarray:
    """Reference attention: q,k,v [B, H, T, Dh] -> [B, H, Tq, Dh].

    Logits are computed in the input dtype (bf16 matmul on the MXU, ~25%
    faster than fp32 accumulation at SD shapes); the softmax itself runs in
    fp32 with max subtraction, which keeps bf16 logits numerically safe.
    """
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * jnp.asarray(scale, q.dtype)
    logits = logits.astype(jnp.float32)
    if causal:
        tq, tk = q.shape[-2], k.shape[-2]
        causal_mask = jnp.tril(jnp.ones((tq, tk), dtype=bool), k=tk - tq)
        logits = jnp.where(causal_mask[None, None], logits,
                           jnp.finfo(jnp.float32).min)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


def _flash_block_sizes(sq: int, skv: int):
    """Measured-optimal blocks on the target chip: bq=512/bk=1024 runs the
    s=4096, d=40->128 self-attention in 3.4 ms vs 10.3 ms for XLA and
    34 ms for the kernel's default blocks.  q blocks derive from the QUERY
    length and k blocks from the KV length — deriving both from Skv broke
    every mixed-length shape (e.g. cross-attention kv=77: bq=77 does not
    divide Sq)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    bq = min(512, sq)
    bk = min(1024, skv)
    return BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_q_dkv=bq, block_k_dkv=bk,
        block_q_dq=bq, block_k_dq=bk, block_k_major_dq=bk,
    )


def _flash_attention(q, k, v, scale: float) -> jnp.ndarray:
    """Pallas TPU flash kernel; pads the head dim to the 128 lane width."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention,
    )

    d = q.shape[-1]
    target = ((d + 127) // 128) * 128
    blocks = _flash_block_sizes(q.shape[-2], k.shape[-2])
    if target != d:
        pad = [(0, 0)] * 3 + [(0, target - d)]
        q = jnp.pad(q * jnp.asarray(scale, q.dtype), pad)
        k, v = jnp.pad(k, pad), jnp.pad(v, pad)
        return flash_attention(q, k, v, causal=False, sm_scale=1.0,
                               block_sizes=blocks)[..., :d]
    return flash_attention(q * jnp.asarray(scale, q.dtype), k, v,
                           causal=False, sm_scale=1.0, block_sizes=blocks)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: jnp.ndarray | None = None,
    causal: bool = False,
    scale: float | None = None,
    impl: str = "xla",
    force_xla: bool = False,
    qk_int8: bool = False,
) -> jnp.ndarray:
    """Multi-head attention over [B, H, T, Dh] tensors.

    mask: optional boolean [B, 1|H, Tq, Tk]; True = attend.
    impl: 'xla' (default), 'flash' (always use the Pallas kernel), or
    'auto' (tuned-block flash for long mask-free self-attention — measured
    3x faster than XLA at seq 4096 — XLA otherwise).
    qk_int8: run the QK^T contraction on the int8 MXU path when the sdk
    kernel is selected (W8A8 serving mode; set by quantized call sites).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    import os

    from uce_tpu.utils.ablate import ablated

    if ablated("attn"):  # bench.py --breakdown cost attribution only
        # cheap stand-in that keeps q/k/v projections alive (no DCE) and
        # matches the output shape for any kv length
        return q + v.mean(axis=-2, keepdims=True) + 0.0 * k.mean()

    impl = os.environ.get("UCE_ATTN_IMPL", impl)  # experiment override
    # 'sdk': unpadded-head-dim Pallas kernel (ops/pallas/sd_attention.py).
    # In 'auto' it takes the long mask-free self-attention shapes, where it
    # beats the padded flash path by skipping the HBM d->128 pads (s=4096
    # d=40: 11.1 vs 13.8 ms; s=1024 d=80: 2.2 vs 2.9 ms at CFG batch 16).
    # Cross-attention (kv=77) and s=256 measured SLOWER than XLA (tiny kv
    # blocks underfill the lanes) — those stay on the XLA path.
    auto_long_self = (q.shape[-2] >= 1024 and q.shape[-2] == k.shape[-2])
    use_sdk = impl == "sdk" or (impl == "auto" and auto_long_self)
    kernel_failed = False
    if (use_sdk and not force_xla and mask is None and not causal
            and jax.default_backend() == "tpu"):
        from uce_tpu.ops.pallas import sd_attention as sdk

        if sdk.supported(q, k):
            try:
                return sdk.sd_attention(q, k, v, scale, qk_int8=qk_int8)
            except (ValueError, NotImplementedError, RuntimeError) as exc:
                _warn_flash_fallback(exc, kernel="sdk")
                kernel_failed = True
    # flash: padded d->128 Pallas flash kernel — kept for shapes the sdk
    # kernel's VMEM gate rejects (very long sequences), as impl='flash',
    # and as the degradation path when an explicitly requested sdk kernel
    # failed at runtime (better than dropping straight to XLA).
    use_flash = impl == "flash" or kernel_failed or (
        impl == "auto" and auto_long_self)
    if (use_flash and not force_xla and mask is None and not causal
            and jax.default_backend() == "tpu"):
        try:
            return _flash_attention(q, k, v, scale).astype(q.dtype)
        except (ValueError, NotImplementedError, RuntimeError) as exc:
            # Pallas lowering errors (ValueError/NotImplementedError) and,
            # in EAGER use, Mosaic compile failures (XlaRuntimeError <:
            # RuntimeError). Under an outer jit (the pipelines) the
            # pallas_call is only STAGED here — a Mosaic failure then
            # surfaces at the outer program's compile, outside this
            # except, and aborts it with the Mosaic error; the escape
            # hatch is UCE_ATTN_IMPL=xla. The sdk kernel's supported()
            # VMEM gate exists precisely to keep the default 'auto'
            # routing away from shapes that could fail that way.
            _warn_flash_fallback(exc)
            kernel_failed = True
    if impl in ("flash", "sdk") and not force_xla and not kernel_failed:
        # (kernel_failed calls already warned; a second "not applicable"
        # notice for the same call would be noise.)
        # The caller explicitly requested a Pallas kernel but the routing
        # constraints (mask/causal semantics the kernels don't implement,
        # or a non-TPU backend) force the XLA path — say so once so a
        # benchmark or test doesn't measure XLA believing it measured the
        # kernel.  Uses its OWN once-flag: a routine "not applicable"
        # notice (e.g. the VAE shape under UCE_ATTN_IMPL=sdk) must not
        # consume the kernel-FAILURE warning that flags real regressions.
        global _not_applicable_warned
        if not _not_applicable_warned:
            _not_applicable_warned = True
            logger.warning(
                "impl=%r requested but not applicable to this call "
                "(mask=%s, causal=%s, backend=%r, or unsupported shape); "
                "using XLA.", impl, mask is not None, causal,
                jax.default_backend())
    return _xla_attention(q, k, v, mask, causal, scale)
