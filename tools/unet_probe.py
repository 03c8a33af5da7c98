"""Time a single UNet forward / VAE decode on the target chip.

Calibrates MFU against tools/flop_count.py's analytic counts (XLA's
cost_analysis undercounts TPU convs). All tensors are random runtime
arguments so XLA can't constant-fold any branch at compile time.

Usage: python tools/unet_probe.py [--batch N] [--iters N] [--vae]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed_scan(fn, x, iters, *consts):
    """fn(x, *consts)->y; chains x + eps*mean(y) so nothing hoists.

    ``consts`` are passed as jit ARGUMENTS, never closed over: on the
    axon remote-compile platform captured arrays are embedded in the
    compile request (slow upload + constant folding), which both skews
    and sometimes breaks compilation.  Returns seconds per iteration.
    """

    @jax.jit
    def run(x, *consts):
        def step(c, _):
            y = fn(c, *consts)
            return c + (1e-6 * y.mean()).astype(c.dtype), None

        y, _ = jax.lax.scan(step, x, None, length=iters)
        return y.sum()

    t0 = time.perf_counter()
    r = run(x, *consts)
    float(r)  # D2H barrier (axon block_until_ready can lie)
    print(f"  compile+first: {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    float(run(x, *consts))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16,
                    help="CFG batch (2x images)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--vae", action="store_true")
    args = ap.parse_args()

    from uce_tpu.models import unet as unet_mod, vae as vae_mod

    rng = np.random.default_rng(0)
    B = args.batch

    config = unet_mod.SD14_UNET_CONFIG
    params = unet_mod.nest_state_dict(
        unet_mod.init_state_dict(config, rng), jnp.bfloat16)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"UNet params: {n/1e6:.1f} M", flush=True)

    lat = jnp.asarray(rng.standard_normal((B, 64, 64, 4)), jnp.bfloat16)
    ctx = jnp.asarray(rng.standard_normal((B, 77, 768)) * 0.1, jnp.bfloat16)
    jax.block_until_ready((params, lat, ctx))

    def fwd(lat, params, ctx):
        return unet_mod.apply(params, lat, jnp.asarray(500.0), ctx, config)

    t = timed_scan(fwd, lat, args.iters, params, ctx)
    print(f"UNet fwd b{B}: {t*1000:.1f} ms -> "
          f"{B*0.788/t:.1f} TFLOP/s vs XLA-counted 788 GFLOP/sample "
          f"({B*0.788/t/197:.1%} of 197 v5e peak)", flush=True)

    if args.vae:
        vae_config = vae_mod.SD_VAE_CONFIG
        vp = unet_mod.nest_state_dict(
            vae_mod.init_state_dict(vae_config, np.random.default_rng(1)),
            jnp.bfloat16)
        z = jnp.asarray(rng.standard_normal((B // 2, 64, 64, 4)),
                        jnp.bfloat16)
        jax.block_until_ready((vp, z))

        def dec(z, vp):
            img = vae_mod.decode(vp, z, vae_config)
            # fold the mean back into the carry shape
            return jnp.zeros_like(z) + img.mean().astype(z.dtype)

        tv = timed_scan(dec, z, max(2, args.iters // 2), vp)
        bi = B // 2
        print(f"VAE decode b{bi}: {tv*1000:.1f} ms -> "
              f"{bi*2.5036/tv:.1f} TFLOP/s vs XLA-counted 2504 GFLOP/img",
              flush=True)


if __name__ == "__main__":
    main()
