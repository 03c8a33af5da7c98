"""Device-op profiler for the SD UNet forward via jax.profiler.

Captures a trace of N forwards on the current backend, then aggregates
per-op device time by category.  This is the ground-truth attribution
tool (bench.py --breakdown's ablation deltas include fusion side
effects; microbenchmarks carry a ~30 ms dispatch+D2H round-trip on the
axon tunnel — docs/PERF.md).

Usage: python tools/trace_prof.py [--batch 16] [--runs 3] [--quantize]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np


def capture(batch: int, runs: int, quantize: bool, outdir: str) -> None:
    from uce_tpu.models import unet as unet_mod

    config = unet_mod.SD14_UNET_CONFIG
    params = unet_mod.nest_state_dict(
        unet_mod.init_state_dict(config, np.random.default_rng(0)),
        jnp.bfloat16)
    if quantize:
        from uce_tpu.models import quantize as qm

        params = qm.quantize_params(params)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((batch, 64, 64, 4)), jnp.bfloat16)
    ctx = jnp.asarray(rng.standard_normal((batch, 77, 768)) * 0.1,
                      jnp.bfloat16)

    @jax.jit
    def fwd(params, lat, ctx):
        return unet_mod.apply(params, lat, jnp.asarray(500.0), ctx, config)

    out = fwd(params, lat, ctx)
    jax.block_until_ready(out)
    with jax.profiler.trace(outdir):
        for _ in range(runs):
            out = fwd(params, lat, ctx)
        jax.block_until_ready(out)
        float(out.ravel()[0])


def analyze(outdir: str, runs: int, top: int = 25) -> None:
    paths = glob.glob(os.path.join(outdir, "plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace under {outdir}"
    with gzip.open(sorted(paths)[-1]) as f:
        data = json.load(f)
    pids = {e["pid"]: e["args"].get("name", "")
            for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu_pids = {p for p, n in pids.items() if "TPU" in n}
    ops = [e for e in data["traceEvents"]
           if e.get("ph") == "X" and e.get("pid") in tpu_pids
           and not e["name"].startswith("jit_")]
    total = sum(e["dur"] for e in ops) / runs / 1e3
    print(f"per-forward device total: {total:.1f} ms")

    def category(name: str, args) -> str:
        hlo = str((args or {}).get("long_name", ""))
        if name.startswith("flash_attention"):
            return "flash attention"
        if "convolution" in name or "convolution" in hlo:
            return "conv fusions"
        if name.startswith(("copy", "transpose")):
            return "copies/transposes"
        if name.startswith("pad"):
            return "pad"
        if name.startswith("fusion"):
            # GN stats fusions produce ([B,C],[B,C],map) tuples
            if hlo.startswith("%fusion") and "](bf16[" in hlo:
                pass
            return "other fusions"
        return name.split(".")[0]

    cat = collections.Counter()
    agg = collections.Counter()
    args_by = {}
    for e in ops:
        cat[category(e["name"], e.get("args"))] += e["dur"]
        agg[e["name"]] += e["dur"]
        if e.get("args"):
            args_by[e["name"]] = e["args"]
    for c, d in cat.most_common():
        print(f"{d/runs/1e3:8.2f} ms/fwd  {c}")
    print(f"\n-- top {top} ops --")
    for n, d in agg.most_common(top):
        hlo = str(args_by.get(n, {}).get("long_name", ""))[:120]
        print(f"{d/runs/1e3:7.2f} ms  {n:28s} {hlo}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    outdir = tempfile.mkdtemp(prefix="uce_trace_")
    capture(args.batch, args.runs, args.quantize, outdir)
    analyze(outdir, args.runs, args.top)
    print(f"(trace kept at {outdir})")
