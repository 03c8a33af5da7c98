"""Attention-variant probes at every SD1.4 UNet attention shape.

Sweeps (a) Pallas flash block sizes at the mid sequence lengths the
current policy leaves on XLA, and (b) cross-attention (kv=77) variants.
CFG batch 16 (= 8 images), the bench headline config.

Usage: python tools/attn_probe.py [self|cross]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    """Chains the q operand through a scan; everything passed as args."""

    @jax.jit
    def run(q, *rest):
        def step(c, _):
            y = fn(c, *rest)
            return c + (1e-6 * y.mean()).astype(c.dtype), None

        out, _ = jax.lax.scan(step, q, None, length=iters)
        return out.sum()

    r = run(*args)
    float(r)
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / iters


def probe_self():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    B = 16
    for S, D, H in ((1024, 80, 8), (256, 160, 8), (4096, 40, 8)):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)

        def xla_body(q, k, v):
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (D ** -0.5)
            p = jax.nn.softmax(logits.astype(jnp.float32), -1)
            return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)

        t = timeit(xla_body, q, k, v)
        print(f"s={S} d={D}: XLA bf16-logit {t*1000:.2f} ms", flush=True)

        Dp = ((D + 127) // 128) * 128
        pad = [(0, 0)] * 3 + [(0, Dp - D)]
        qp, kp, vp = (jnp.pad(a, pad) for a in (q, k, v))
        for bq in (256, 512, 1024):
            for bk in (256, 512, 1024):
                if bq > S or bk > S:
                    continue

                def fl(q, k, v, bq=bq, bk=bk):
                    bs = BlockSizes(
                        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                        block_q_major_dkv=bq, block_k_major_dkv=bk,
                        block_q_dkv=bq, block_k_dkv=bk,
                        block_q_dq=bq, block_k_dq=bk, block_k_major_dq=bk)
                    return flash_attention(q, k, v, causal=False,
                                           sm_scale=D ** -0.5,
                                           block_sizes=bs)

                try:
                    t = timeit(fl, qp, kp, vp)
                    print(f"  flash d->{Dp} bq{bq}/bk{bk}: {t*1000:.2f} ms",
                          flush=True)
                except Exception as e:
                    print(f"  flash bq{bq}/bk{bk}: FAIL {type(e).__name__}",
                          flush=True)


def probe_cross():
    B, H, KV = 16, 8, 77
    for S, D in ((4096, 40), (1024, 80), (256, 160)):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, H, KV, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, KV, D)), jnp.bfloat16)

        def xla_f32(q, k, v):
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (D ** -0.5)
            p = jax.nn.softmax(logits.astype(jnp.float32), -1)
            return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)

        def xla_bf16_softmax(q, k, v):
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (D ** -0.5)
            m = logits.max(-1, keepdims=True)
            e = jnp.exp((logits - m).astype(jnp.float32)).astype(jnp.bfloat16)
            p = e / e.sum(-1, keepdims=True)
            return jnp.einsum("bhqk,bhkd->bhqd", p, v)

        # kv padded to 128 with -inf mask baked into k? pad k with zeros and
        # rely on softmax weight leakage -> WRONG. Instead pad logits via
        # where. Here: pad kv and mask in fp32.
        KVp = 128
        kp = jnp.pad(k, [(0, 0), (0, 0), (0, KVp - KV), (0, 0)])
        vp = jnp.pad(v, [(0, 0), (0, 0), (0, KVp - KV), (0, 0)])
        neg = jnp.concatenate(
            [jnp.zeros((KV,), jnp.float32),
             jnp.full((KVp - KV,), -1e9, jnp.float32)])

        def xla_padded(q, kp, vp, neg):
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, kp) * (D ** -0.5)
            logits = logits.astype(jnp.float32) + neg
            p = jax.nn.softmax(logits, -1)
            return jnp.einsum("bhqk,bhkd->bhqd", p.astype(vp.dtype), vp)

        for name, fn, args in (
            ("xla fp32-softmax", xla_f32, (q, k, v)),
            ("xla bf16-softmax", xla_bf16_softmax, (q, k, v)),
            ("xla kv-pad128", xla_padded, (q, kp, vp, neg)),
        ):
            t = timeit(fn, *args)
            print(f"cross s={S} d={D} {name}: {t*1000:.2f} ms", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("self", "all"):
        probe_self()
    if which in ("cross", "all"):
        probe_cross()
