"""On-chip microprobes for the SD generation hot path.

Timing methodology (see docs/PERF.md): jit a loop of N calls with distinct
inputs chained through the carry so nothing hoists, then force a D2H of a
scalar checksum. The axon tunnel's block_until_ready can lie; D2H of a
scalar is the only trustworthy barrier.

Usage: python tools/perf_probe.py [attn|gn|conv] ...
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(out).ravel()[0])  # force real completion via D2H
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.asarray(out).ravel()[0])
    t1 = time.perf_counter()
    # fn is expected to internally loop `iters` times via lax.scan on
    # data-dependent carries (no hoisting); single-call timing otherwise.
    return (t1 - t0)


def chain(body, x0, iters):
    """Run body iters times with a data-dependent carry (no hoisting)."""

    def step(c, _):
        return body(c), None

    def run(x):
        y, _ = jax.lax.scan(step, x, None, length=iters)
        return y.sum()

    return jax.jit(run), x0


def probe_attention():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    B, H, D = 16, 8, 40  # CFG batch 16, SD level-0 heads
    for S in (4096, 1024):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)

        def xla_body(c):
            logits = jnp.einsum("bhqd,bhkd->bhqk", c, k) * (D ** -0.5)
            p = jax.nn.softmax(logits.astype(jnp.float32), -1)
            return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)

        fn, x0 = chain(xla_body, q, 10)
        t = timeit(fn, x0) / 10
        print(f"s={S}: XLA bf16-logit {t*1000:.2f} ms")

        dpad = 128
        pad = [(0, 0)] * 3 + [(0, dpad - D)]
        qp, kp, vp = (jnp.pad(t_, pad) for t_ in (q, k, v))
        for bq, bk in ((512, 1024), (1024, 1024), (2048, 1024), (512, 2048),
                       (1024, 2048), (2048, 2048), (256, 4096), (512, 4096),
                       (1024, 4096)):
            if bq > S or bk > S:
                continue
            blocks = BlockSizes(
                block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                block_q_major_dkv=bq, block_k_major_dkv=bk,
                block_q_dkv=bq, block_k_dkv=bk,
                block_q_dq=bq, block_k_dq=bk, block_k_major_dq=bk)

            def fl_body(c, blocks=blocks):
                return flash_attention(c, kp, vp, causal=False, sm_scale=1.0,
                                       block_sizes=blocks)

            try:
                fn, x0 = chain(fl_body, qp, 10)
                t = timeit(fn, x0) / 10
                print(f"s={S}: flash bq{bq}/bk{bk} {t*1000:.2f} ms")
            except Exception as e:
                print(f"s={S}: flash bq{bq}/bk{bk} FAILED "
                      f"{type(e).__name__}")


def probe_gn():
    from uce_tpu.models.layers import group_norm

    for (B, HW, C) in ((16, 64, 320), (16, 32, 640), (16, 16, 1280)):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, HW, HW, C)), jnp.bfloat16)
        scale = jnp.ones((C,), jnp.float32)
        bias = jnp.zeros((C,), jnp.float32)

        def gn_body(c):
            return jax.nn.silu(group_norm(c, scale, bias, 32))

        fn, x0 = chain(gn_body, x, 20)
        t = timeit(fn, x0) / 20
        gb = x.size * 2 * 2 / 1e9  # read+write bf16
        print(f"gn+silu {B}x{HW}^2x{C}: {t*1000:.3f} ms "
              f"({gb/t:.0f} GB/s effective)")

        # matmul-indicator variant: stats via x @ M and (x*x) @ M
        g = 32
        M = jnp.asarray(np.kron(np.eye(g), np.ones((C // g, 1))), jnp.bfloat16)

        def gn_mm_body(c):
            c32 = c.astype(jnp.float32)
            n = c.shape[1] * c.shape[2] * (C // g)
            s1 = jnp.einsum("bhwc,cg->bg", c32, M.astype(jnp.float32)) / n
            s2 = jnp.einsum("bhwc,cg->bg", c32 * c32,
                            M.astype(jnp.float32)) / n
            var = s2 - s1 * s1
            inv = jax.lax.rsqrt(var + 1e-5)
            gamma = (scale.reshape(g, -1) * inv[:, :, None]).reshape(
                c.shape[0], 1, 1, C)
            beta = (bias.reshape(g, -1)
                    - (s1 * inv)[:, :, None] * scale.reshape(g, -1)
                    ).reshape(c.shape[0], 1, 1, C)
            return jax.nn.silu(c.astype(jnp.float32) * gamma + beta
                               ).astype(c.dtype)

        fn, x0 = chain(gn_mm_body, x, 20)
        t = timeit(fn, x0) / 20
        print(f"gn+silu mm-variant {B}x{HW}^2x{C}: {t*1000:.3f} ms")


def probe_conv():
    for (B, HW, C) in ((16, 64, 320), (16, 32, 640), (16, 16, 1280)):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, HW, HW, C)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.02,
                        jnp.bfloat16)

        def conv_body(c):
            return jax.lax.conv_general_dilated(
                c, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        fn, x0 = chain(conv_body, x, 10)
        t = timeit(fn, x0) / 10
        flops = 2 * B * HW * HW * 9 * C * C
        print(f"conv3x3 {B}x{HW}^2x{C}: {t*1000:.2f} ms "
              f"({flops/t/1e12:.1f} TFLOP/s)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("attn", "all"):
        probe_attention()
    if which in ("gn", "all"):
        probe_gn()
    if which in ("conv", "all"):
        probe_conv()


def probe_conv_variants():
    """Alternative conv formulations vs XLA's native conv."""
    for (B, HW, C) in ((16, 64, 320), (16, 32, 640), (16, 16, 1280)):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, HW, HW, C)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.02,
                        jnp.bfloat16)
        flops = 2 * B * HW * HW * 9 * C * C

        def native(c):
            return jax.lax.conv_general_dilated(
                c, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def im2col(c):
            p = jax.lax.conv_general_dilated_patches(
                c, (3, 3), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return (p.reshape(B, HW * HW, 9 * C)
                    @ w.transpose(2, 0, 1, 3).reshape(9 * C, C)
                    ).reshape(B, HW, HW, C)

        def taps9(c):
            pad = jnp.pad(c, ((0, 0), (1, 1), (1, 1), (0, 0)))
            out = None
            for dy in range(3):
                for dx in range(3):
                    shard = pad[:, dy:dy + HW, dx:dx + HW, :]
                    y = shard.reshape(B, HW * HW, C) @ w[dy, dx]
                    out = y if out is None else out + y
            return out.reshape(B, HW, HW, C)

        names = [("native", native), ("im2col", im2col), ("taps9", taps9)]
        for name, body in names:
            try:
                fn, x0 = chain(body, x, 10)
                t = timeit(fn, x0) / 10
                print(f"conv {B}x{HW}^2x{C} {name:8s}: {t*1000:.2f} ms "
                      f"({flops/t/1e12:.1f} TFLOP/s)")
            except Exception as e:
                print(f"conv {B}x{HW}^2x{C} {name}: FAILED {type(e).__name__}: {e}")

        # channel-padded native (multiple of 128 lanes)
        Cp = ((C + 127) // 128) * 128
        if Cp != C:
            xp = jnp.pad(x, ((0, 0),) * 3 + ((0, Cp - C),))
            wp = jnp.pad(w, ((0, 0), (0, 0), (0, Cp - C), (0, Cp - C)))

            def padded(c):
                return jax.lax.conv_general_dilated(
                    c, wp, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            fn, x0 = chain(padded, xp, 10)
            t = timeit(fn, x0) / 10
            print(f"conv {B}x{HW}^2x{C} padded->{Cp}: {t*1000:.2f} ms "
                  f"(effective {flops/t/1e12:.1f} TFLOP/s)")

if __name__ == "__main__" and (len(sys.argv) > 1 and sys.argv[1] == "convvar"):
    probe_conv_variants()
