"""On-chip throughput for the L5 metric suite (VERDICT r4 weak #5).

The paper protocol pushes 30,100 COCO images through CLIP score
(``/root/reference/evalscripts/mean_clip.py``, ``data/coco_30k.csv``) and
thousands through LPIPS/DreamSim/NudeNet/ResNet-50. This tool measures
each metric's device path at realistic batch on real-shape RANDOM
weights (throughput is value-independent; no model download exists in
this environment):

  clip_score      ViT-B/32 dual tower, 512px uint8 in (device resize),
                  per-image caption similarity  (mean_clip.py:47-50)
  clip_classify   same tower, cached 2-attribute zero-shot argmax
                  (CLIP_classify.py:37-44)
  lpips           AlexNet-LPIPS pairs at the reference's 64px
                  (lpips_eval.py:22-33)
  dreamsim        3x ViT-B/16 CLS ensemble at 224px (dreamsim_eval.py:36)
  nudenet         YOLOv8-n detect at 320px, batch and CLI (batch-1) paths
  resnet50        ImageNet top-k at 224px (imageclassify.py:29-68)

Prints ONE JSON line: {"metric": "eval_suite_imgs_per_s", "parts": {...},
"coco30k_clip_score_minutes": M}. Images/s counts IMAGES (a pair = 2).

Usage: python tools/eval_bench.py [--tiny] [--only NAME]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_fn(fn, n_warm=1, n_runs=3):
    """Best-of-k seconds per call; fn must force D2H materialization."""
    for _ in range(n_warm):
        fn()
    best = float("inf")
    for _ in range(n_runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_clip(tiny: bool):
    import numpy as np

    from tools.debias_bench import build_clip

    model = build_clip(tiny)
    rng = np.random.default_rng(0)
    b, src = (4, 64) if tiny else (64, 512)
    images = (rng.random((b, src, src, 3)) * 255).astype(np.uint8)

    # clip_score: every row has its OWN caption (mean_clip protocol) ->
    # the text tower runs per flush; rotate caption sets so the
    # embed_texts cache never short-circuits the measurement
    caps = [[f"caption {i} {j}" for i in range(b)] for j in range(8)]
    it = iter(range(10 ** 9))

    def run_score():
        np.asarray(model.logits_per_image(images, caps[next(it) % 8]))

    score_s = _time_fn(run_score)

    labels = ["a man", "a woman"]

    def run_classify():
        np.asarray(model.classify(images, labels))

    classify_s = _time_fn(run_classify)
    return {"clip_score_imgs_per_s": b / score_s,
            "clip_classify_imgs_per_s": b / classify_s,
            "clip_batch": b}


def bench_lpips(tiny: bool):
    import jax
    import numpy as np

    from uce_tpu.eval import lpips as lpips_mod
    from uce_tpu.models import vision_backbones as vb

    rng = np.random.default_rng(1)
    params = {
        "alex": vb.init_alexnet(rng),
        "lins": [np.abs(rng.standard_normal(c)).astype(np.float32)
                 for c in vb.ALEXNET_CHANNELS],
    }
    b = 16 if tiny else 256
    x = rng.uniform(-1, 1, (b, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (b, 64, 64, 3)).astype(np.float32)
    # params as an ARG: closure params become HLO constants, inflating
    # the remote compile payload (HTTP 413 at ViT scale — r5 find)
    dist = jax.jit(lambda p, a, c: lpips_mod.lpips_distance(p, a, c))

    def run():
        np.asarray(dist(params, x, y))

    s = _time_fn(run)
    return {"lpips_pairs_per_s": b / s, "lpips_batch": b}


def bench_dreamsim(tiny: bool, tmp_dir: str):
    import numpy as np
    from safetensors.numpy import save_file

    from uce_tpu.eval.dreamsim import load_dreamsim_jax
    from uce_tpu.models import vision_backbones as vb

    rng = np.random.default_rng(2)
    # the real ensemble: dino_vitb16 + clip_vitb16 + open_clip_vitb16
    if tiny:
        spec = dict(depth=2, dim=32, heads=2, patch=8, image=224)
    else:
        spec = dict(depth=12, dim=768, heads=12, patch=16, image=224)
    tensors, meta = {}, {"models": "dino,clip,open_clip"}
    for m in ("dino", "clip", "open_clip"):
        for k, v in vb.init_vit_timm(rng, **spec).items():
            tensors[f"{m}/{k}"] = v
        meta[f"{m}.num_heads"] = str(spec["heads"])
        meta[f"{m}.mean"] = "0.485,0.456,0.406"
        meta[f"{m}.std"] = "0.229,0.224,0.225"
    path = os.path.join(tmp_dir, "ensemble.safetensors")
    save_file(tensors, path, metadata=meta)
    dist = load_dreamsim_jax(path)

    b = 2 if tiny else 32
    a = rng.uniform(-1, 1, (b, 224, 224, 3)).astype(np.float32)
    c = rng.uniform(-1, 1, (b, 224, 224, 3)).astype(np.float32)

    def run():
        np.asarray(dist(a, c))

    s = _time_fn(run)
    return {"dreamsim_pairs_per_s": b / s, "dreamsim_batch": b}


def bench_nudenet(tiny: bool):
    import jax
    import numpy as np

    from uce_tpu.models import yolo

    params = yolo.params_from_state(yolo.init_yolo_state(seed=3))
    size = 320
    b = 2 if tiny else 16
    x = np.random.default_rng(3).random((b, size, size, 3)).astype(np.float32)
    x1 = x[:1]
    detect = jax.jit(yolo.yolo_detect)

    def run_batch():  # the folder-CLI path (detect_batch, r5): chunks of 16
        np.asarray(detect(params, x))

    def run_single():  # legacy one-dispatch-per-image path, for contrast
        for i in range(b):
            np.asarray(detect(params, x1))

    s_batch = _time_fn(run_batch)
    s_single = _time_fn(run_single)
    return {"nudenet_batch_imgs_per_s": b / s_batch,
            "nudenet_single_imgs_per_s": b / s_single,
            "nudenet_batch": b}


def bench_resnet(tiny: bool):
    import jax
    import numpy as np

    from tests.torch_vision_mirror import random_resnet50_sd
    from uce_tpu.models import vision_backbones as vb

    params = vb.convert_resnet50(random_resnet50_sd(seed=4))
    b = 2 if tiny else 64
    x = np.random.default_rng(4).random((b, 224, 224, 3)).astype(np.float32)
    logits = jax.jit(vb.resnet50_logits)

    def run():
        np.asarray(logits(params, x))

    s = _time_fn(run)
    return {"resnet50_imgs_per_s": b / s, "resnet50_batch": b}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke (tiny shapes, same code paths)")
    ap.add_argument("--only", type=str, default=None,
                    choices=["clip", "lpips", "dreamsim", "nudenet",
                             "resnet"])
    args = ap.parse_args()

    import faulthandler

    faulthandler.enable()
    # the axon tunnel has been observed to wedge a remote call forever;
    # a periodic stack dump makes the blocked frame visible in the log
    faulthandler.dump_traceback_later(180, repeat=True, file=sys.stderr)

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")

    # NO persistent compile cache here (unlike bench.py): on the axon
    # tunnel a cache WRITE serializes the new executable back over the
    # ~30 MB/s link — measured ~4.5 min for one small CLIP program
    # (r5 postmortem; looked like a hang). These metric models compile
    # in 5-12 s each; six cold compiles beat six serializations.

    import tempfile

    parts: dict = {}
    with tempfile.TemporaryDirectory() as td:
        benches = {
            "clip": lambda: bench_clip(args.tiny),
            "lpips": lambda: bench_lpips(args.tiny),
            "dreamsim": lambda: bench_dreamsim(args.tiny, td),
            "nudenet": lambda: bench_nudenet(args.tiny),
            "resnet": lambda: bench_resnet(args.tiny),
        }
        for name, fn in benches.items():
            if args.only and name != args.only:
                continue
            t0 = time.perf_counter()
            parts.update({k: round(v, 2) for k, v in fn().items()})
            print(f"{name}: done in {time.perf_counter() - t0:.1f}s "
                  f"(incl. compile)", file=sys.stderr)

    result = {
        "metric": "eval_suite_imgs_per_s",
        "unit": "img/s (pairs count 1/s per pair)",
        "parts": parts,
        "note": "device path only: PNG decode/disk IO excluded "
                "(host-side, overlappable with device compute)",
    }
    if "clip_score_imgs_per_s" in parts and not args.tiny:
        result["coco30k_clip_score_minutes"] = round(
            30100 / parts["clip_score_imgs_per_s"] / 60, 1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
