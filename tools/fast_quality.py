"""Fast-mode quality A/B at SD v1.4 scale: exact vs --fast images.

Measures the image-space perturbation of a FastConfig (CFG interval +
DeepCache) against the exact reference protocol (50 steps, CFG 7.5,
512^2 — ``evalscripts/generate-images-sd.py:58-62``) on the SAME seeds
and prompts: per-image mean/max uint8 delta, PSNR, and the fraction of
pixels moved by more than 2 levels.

Runs on real-shape RANDOM weights (no model download exists here), which
quantifies the numerical perturbation of the approximation for this
architecture; the semantic quality gate on real weights (CLIP score +
LPIPS fast-vs-exact) is scripted as step 6 of tools/real_smoke.sh and
must be recorded in docs/PERF.md before --fast is used for evals.

Usage: python tools/fast_quality.py --fast 'cfg_interval=3:25,cache=2'
       [--tiny] [--prompts 4] [--steps 50]
Prints one JSON line with the aggregate stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", type=str, required=True,
                    help="FastConfig spec, e.g. 'cfg_interval=3:25,cache=2'")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke mode (tiny shapes, same code path)")
    ap.add_argument("--prompts", type=int, default=4)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--sdxl", action="store_true",
                    help="probe the SDXL pipeline (1024px, added-cond "
                         "path) instead of SD1.4")
    args = ap.parse_args()

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from uce_tpu.utils.compile_cache import enable as enable_cache

    enable_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))

    import numpy as np

    from tools.debias_bench import build_pipeline, build_sdxl_pipeline
    from uce_tpu.diffusion.sampler import FastConfig

    if args.sdxl:
        size = 32 if args.tiny else 1024
        pipe = build_sdxl_pipeline(args.tiny)
    else:
        size = 32 if args.tiny else 512
        pipe = build_pipeline(args.tiny)
    steps = 4 if args.tiny else args.steps
    fast = FastConfig.from_spec(args.fast)
    prompts = ["a photo of a doctor", "van gogh painting of sunflowers",
               "a red sports car", "a snowy mountain village",
               "a bowl of fruit", "city skyline at night"][:args.prompts]
    seeds = list(range(100, 100 + len(prompts)))

    kw = dict(num_inference_steps=steps, guidance_scale=7.5, seed=seeds,
              height=size, width=size)
    exact = pipe(prompts, **kw)
    fast_imgs = pipe(prompts, fast=fast, **kw)
    assert exact.shape == fast_imgs.shape

    d = np.abs(exact.astype(np.int32) - fast_imgs.astype(np.int32))
    mse = ((exact.astype(np.float64) - fast_imgs.astype(np.float64)) ** 2
           ).mean(axis=(1, 2, 3))
    psnr = 10 * np.log10(255.0 ** 2 / np.maximum(mse, 1e-12))
    result = {
        "metric": "fast_quality_pixel_delta",
        "fast_spec": args.fast,
        "protocol": {"steps": steps, "cfg": 7.5, "size": size,
                     "prompts": len(prompts),
                     "weights": ("random-sdxl-shape" if args.sdxl
                                 else "random-sd14-shape")},
        "mean_abs_delta_levels": round(float(d.mean()), 3),
        "max_abs_delta_levels": int(d.max()),
        "frac_pixels_gt2": round(float((d > 2).mean()), 4),
        "psnr_db_mean": round(float(psnr.mean()), 2),
        "psnr_db_min": round(float(psnr.min()), 2),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
