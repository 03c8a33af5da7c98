"""HiDream CFG-window sweep: throughput + latent-perturbation per window.

The SD FASTQ sweep (docs/bench/FASTQ_r04.json) showed window POSITION
matters at equal speed (3:25 beat 5:30 on pixel delta). HiDream's fast
path is the CFG window alone (no DeepCache — the MoE DiT has no UNet-
style deep/shallow split), so this sweeps window placements on the same
half-depth w8 DiT bench.py measures (bench_hidream), reporting for each:

  img/s            on-chip throughput (50 steps, CFG 5, 1024px protocol)
  rel_delta        mean |z_fast - z_exact| / mean |z_exact| of the final
                   latents vs the exact 50-step CFG run
  cosine           flattened cosine similarity of final latents

Random weights (throughput + numerical perturbation are value-
independent); the semantic gate on real weights is the HiDream leg of
tools/real_smoke.sh. Picks/prints the best window = fastest among those
within 1.1x of the lowest rel_delta.

Usage: python tools/hidream_fastq.py [--tiny] [--windows 3:25,5:30,...]
Prints one JSON line (docs/bench/HIDREAM_FASTQ artifact format).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=str, default="3:25,5:30,8:33,0:22")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke (tiny DiT, 2 steps, same code path)")
    args = ap.parse_args()

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")

    # no persistent compile cache: each window is a fresh program run
    # ONCE, and on the axon tunnel a cache write serializes the
    # executable back over the ~30 MB/s link (minutes per program —
    # docs/PERF.md "Compile latency")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _Spec
    from uce_tpu.diffusion.pipeline_flux import make_img_ids
    from uce_tpu.diffusion.sampler import FastConfig
    from uce_tpu.models import hidream as hd_mod
    from uce_tpu.models import quantize as quantize_mod

    # same rig as bench.bench_hidream (kept in lockstep with its
    # half-depth w8 honesty note)
    if args.tiny:
        base = dict(in_channels=4, out_channels=4, attention_head_dim=8,
                    num_attention_heads=2, caption_channels=(32, 32),
                    text_emb_dim=24, axes_dims_rope=(4, 2, 2),
                    ffn_multiple_of=8)
        config = hd_mod.HiDreamConfig(num_layers=2, num_single_layers=2,
                                      **base)
        s_t5 = s_ll = 8
        lat_hw, n_steps, batch = 8, 4, 1
    else:
        base = {}
        config = hd_mod.HiDreamConfig(num_layers=8, num_single_layers=16,
                                      **base)
        s_t5 = s_ll = 128
        lat_hw, n_steps, batch = 128, 50, 1

    small = hd_mod.HiDreamConfig(num_layers=1, num_single_layers=1, **base)
    proto = quantize_mod.quantize_params(
        hd_mod.init_params(small, 0, 0.02), quantize_mod.HIDREAM_SKIP,
        mode="w8")
    n_blocks = config.num_layers + config.num_single_layers
    depths = {"double_stream_blocks": config.num_layers,
              "single_stream_blocks": config.num_single_layers}

    def depth_for(top, path, leaf):
        if top in depths:
            return depths[top]
        if top == "caption_projection":
            if any(getattr(p, "key", None) == "llama" for p in path):
                return n_blocks
        return None

    # Device-side RANDOM fill (bench.py's _device_fill_params uses
    # constant fills, fine for throughput but useless for a quality
    # probe: constant weights collapse the cond/uncond divergence the
    # CFG window perturbs). Same shape-widening, jax.random leaves.
    def _respec(top, tree):
        def spec(path, leaf):
            depth = depth_for(top, path, leaf)
            last = getattr(path[-1], "key", None) if path else None
            shape = (depth,) + leaf.shape[1:] if depth else leaf.shape
            if leaf.dtype == jnp.int8:
                return _Spec(shape, "int8", jnp.int8)
            if last == "scale":
                return _Spec(shape, "one", jnp.float32)
            eff_ndim = leaf.ndim - (1 if depth else 0)
            return _Spec(shape, "one" if eff_ndim == 1 else "randn",
                         jnp.bfloat16)

        return jax.tree_util.tree_map_with_path(spec, tree)

    spec_tree = {k: _respec(k, v) for k, v in proto.items()}
    specs, treedef = jax.tree.flatten(
        spec_tree, is_leaf=lambda s: isinstance(s, _Spec))

    @jax.jit
    def _fill():
        out = []
        for i, s in enumerate(specs):
            key = jax.random.PRNGKey(i)
            if s.val == "int8":
                out.append(jax.random.randint(key, s.shape, -127, 128,
                                              jnp.int8))
            elif s.val == "one":
                out.append(jnp.ones(s.shape, s.dtype))
            else:
                out.append((jax.random.normal(key, s.shape, jnp.float32)
                            * 0.02).astype(s.dtype))
        return out

    params = jax.tree.unflatten(treedef, _fill())
    del proto

    rng = np.random.default_rng(0)
    s_img = (lat_hw // config.patch_size) ** 2
    feat = config.in_channels * config.patch_size ** 2
    x = jnp.asarray(rng.standard_normal((batch, s_img, feat)), jnp.bfloat16)
    t5 = jnp.asarray(
        rng.standard_normal((2 * batch, s_t5, config.caption_channels[0]))
        * 0.1, jnp.bfloat16)
    llama = jnp.asarray(
        rng.standard_normal(
            (n_blocks, 2 * batch, s_ll, config.caption_channels[1])) * 0.1,
        jnp.bfloat16)
    pooled = jnp.asarray(
        rng.standard_normal((2 * batch, config.text_emb_dim)) * 0.1,
        jnp.bfloat16)
    img_ids = make_img_ids(lat_hw, lat_hw)
    sigmas = jnp.linspace(1.0, 0.0, n_steps + 1)

    def make_generate(window):
        @jax.jit
        def generate(params, x, t5, llama, pooled):
            def make_step(cond_only):
                def step(z, i):
                    n_rows = batch if cond_only else 2 * batch
                    t = jnp.full((n_rows,), sigmas[i] * 1000.0, jnp.float32)
                    if cond_only:
                        v = hd_mod.apply(
                            params, z, t5[batch:], llama[:, batch:],
                            pooled[batch:], t, img_ids, config)
                    else:
                        v = hd_mod.apply(
                            params, jnp.concatenate([z, z], axis=0), t5,
                            llama, pooled, t, img_ids, config)
                        vu, vc = v[:batch], v[batch:]
                        v = vu + 5.0 * (vc - vu)
                    return (z - (sigmas[i + 1] - sigmas[i]) * v).astype(
                        z.dtype), None
                return step

            if window is not None:
                segs = FastConfig(cfg_interval=window).segments(n_steps)
            else:
                segs = [(0, n_steps, False)]
            z = x
            for s, e, cond_only in segs:
                z, _ = jax.lax.scan(make_step(cond_only), z,
                                    jnp.arange(s, e))
            return z

        return generate

    def run(window):
        gen = make_generate(window)
        z = np.asarray(gen(params, x, t5, llama, pooled))  # compile+run
        n_runs = 2
        t0 = time.perf_counter()
        outs = [gen(params, x, t5, llama, pooled) for _ in range(n_runs)]
        for o in outs:
            np.asarray(o)
        return z.astype(np.float32), batch * n_runs / (
            time.perf_counter() - t0)

    z_exact, exact_img_s = run(None)
    print(f"exact: {exact_img_s:.4f} img/s", file=sys.stderr)
    runs, seen = [], set()
    for w in args.windows.split(","):
        lo, hi = (int(v) for v in w.strip().split(":"))
        if args.tiny:  # scale the 50-step windows onto the tiny run
            lo, hi = lo * n_steps // 50, max(lo * n_steps // 50 + 1,
                                             hi * n_steps // 50)
        if (lo, hi) in seen:
            continue
        seen.add((lo, hi))
        z, img_s = run((lo, hi))
        d = np.abs(z - z_exact)
        rel = float(d.mean() / (np.abs(z_exact).mean() + 1e-9))
        cos = float((z * z_exact).sum() / (np.linalg.norm(z)
                                           * np.linalg.norm(z_exact) + 1e-9))
        runs.append({"window": f"{lo}:{hi}", "img_per_s": round(img_s, 4),
                     "speedup": round(img_s / exact_img_s, 3),
                     "rel_delta": round(rel, 4), "cosine": round(cos, 5)})
        print(f"window {lo}:{hi}: {img_s:.4f} img/s "
              f"({img_s / exact_img_s:.2f}x), rel_delta {rel:.4f}, "
              f"cos {cos:.5f}", file=sys.stderr)

    best_delta = min(r["rel_delta"] for r in runs)
    candidates = [r for r in runs if r["rel_delta"] <= 1.1 * best_delta]
    best = max(candidates, key=lambda r: r["img_per_s"])
    print(json.dumps({
        "metric": "hidream_fastq_sweep",
        "protocol": {"steps": n_steps, "cfg": 5.0,
                     "depth": "half-w8" if not args.tiny else "tiny",
                     "weights": "random-real-shape"},
        "exact_img_per_s": round(exact_img_s, 4),
        "runs": runs,
        "recommended_window": best["window"],
        "rule": "fastest among windows within 1.1x of the lowest rel_delta",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
