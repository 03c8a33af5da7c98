"""LPIPS perceptual distance (AlexNet variant) — evalscripts/lpips_eval.py.

Protocol: pair ``{case}_{num}.png`` across an original-model folder and an
edited-model folder at 64px with (x/255 - 0.5) * 2 normalization
(``lpips_eval.py:22-33,51``); per-case means -> ``{folder}_lpipsloss.csv``.
The reference's dead ``--image`` branch (``:53-58``, calls undefined
helpers) is intentionally not replicated (SURVEY.md do-not-replicate list).

LPIPS weights load from a local file holding the lpips-package state dict
(``lin{i}.model.1.weight`` 1x1 convs) plus torchvision AlexNet features.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from uce_tpu.models.vision_backbones import alexnet_features

# lpips package scaling layer constants
LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_lpips_weights(path: str) -> dict:
    """Load {alexnet state dict + lin weights} from a safetensors/pt file."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = {k: v.numpy() for k, v in torch.load(
            path, map_location="cpu", weights_only=True).items()}
    from uce_tpu.models.vision_backbones import convert_alexnet

    net_sd = {k.split("net.", 1)[1]: v for k, v in sd.items()
              if k.startswith("net.")}
    alex = convert_alexnet(net_sd if net_sd else sd)
    lins = []
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in sd:
                lins.append(jnp.asarray(np.asarray(sd[key]).reshape(-1)))
                break
        else:
            raise KeyError(f"missing LPIPS linear weight lin{i}")
    return {"alex": alex, "lins": lins}


def lpips_distance(params: dict, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """x, y [B,H,W,3] in [-1,1] -> LPIPS distance [B]."""
    def scale(v):
        return (v - LPIPS_SHIFT) / LPIPS_SCALE

    fx = alexnet_features(params["alex"], scale(x))
    fy = alexnet_features(params["alex"], scale(y))
    total = 0.0
    for tap_x, tap_y, lin in zip(fx, fy, params["lins"]):
        nx = tap_x * jax.lax.rsqrt((tap_x ** 2).sum(-1, keepdims=True) + 1e-10)
        ny = tap_y * jax.lax.rsqrt((tap_y ** 2).sum(-1, keepdims=True) + 1e-10)
        diff = (nx - ny) ** 2
        total = total + (diff @ lin).mean(axis=(1, 2))
    return total


def _batch_prep(size: int):
    """One jitted uint8->[-1,1] resize program per BATCH — per-image
    device programs + host round-trips dominated folder evals on slow
    links (~1.5 ms dispatch floor, ~30 MB/s D2H on this environment)."""

    @jax.jit
    def prep(raw):  # uint8 [N, H, W, 3]
        img = raw.astype(jnp.float32) / 255.0
        img = jax.vmap(lambda im: jax.image.resize(
            im, (size, size, 3), method="bilinear"))(img)
        return (img - 0.5) * 2.0

    return prep


def _load_raw(paths) -> np.ndarray:
    from uce_tpu.utils.imaging import load_image, stack_uniform

    return stack_uniform([load_image(p) for p in paths])


def eval_folders(
    params: dict,
    original_path: str,
    edited_path: str,
    prompts_path: str | None = None,
    save_path: str | None = None,
    image_size: int = 64,
    distance_fn=None,
    loss_column="lpips_loss",
    prep_fn=None,
    batch: int = 16,
) -> pd.DataFrame:
    """Per-case mean distances between paired case images — THE shared
    pair-folder protocol (dreamsim passes loss_column='dream_loss';
    styleloss passes a two-column metric + imagenet prep).

    ``distance_fn(orig, edited)`` overrides the metric and may return a
    tuple of per-pair arrays matching a tuple ``loss_column``; defaults
    to LPIPS with ``params``. ``prep_fn`` overrides the batched
    uint8->model-input preprocessing. CSV contract (lpips_eval.py:66-90):
    the full prompts CSV with per-case mean loss column(s) appended.
    """
    if distance_fn is None:
        # ONE jitted program, params as an ARG (eager op chains are
        # ~100x slower per dispatch on the axon tunnel, and closure
        # params would bake into the compile payload — docs/PERF.md
        # "Compile latency", r5)
        jit_dist = jax.jit(lpips_distance)
        distance_fn = lambda a, b: jit_dist(params, a, b)
    columns = ((loss_column,) if isinstance(loss_column, str)
               else tuple(loss_column))

    # collect valid pairs first, then run the metric in batches (one device
    # program per batch instead of one per image pair)
    pairs: list[tuple[int, str, str]] = []
    for name in sorted(n for n in os.listdir(original_path)
                       if n.endswith(".png")):
        edited_file = os.path.join(edited_path, name)
        if not os.path.exists(edited_file):
            continue  # reference skips missing pairs (lpips_eval.py:74-83)
        try:
            case = int(name.split("_")[0])
        except ValueError:
            continue
        pairs.append((case, os.path.join(original_path, name), edited_file))

    cases: dict[int, list[tuple]] = {}
    prep = prep_fn if prep_fn is not None else _batch_prep(image_size)
    for i in range(0, len(pairs), batch):
        chunk = pairs[i:i + batch]
        a = prep(_load_raw([p for _, p, _ in chunk]))
        b = prep(_load_raw([p for _, _, p in chunk]))
        out = distance_fn(a, b)
        outs = [np.asarray(o) for o in
                (out if isinstance(out, tuple) else (out,))]
        for j, (case, _, _) in enumerate(chunk):
            cases.setdefault(case, []).append(
                tuple(float(o[j]) for o in outs))

    if not cases:
        raise FileNotFoundError("no paired case images found")
    df = pd.DataFrame(
        [{"case_number": c,
          **{col: float(np.mean([v[k] for v in vals]))
             for k, col in enumerate(columns)}}
         for c, vals in sorted(cases.items())])
    if prompts_path:
        df = pd.read_csv(prompts_path).merge(df, on="case_number",
                                             how="left")
    if save_path:
        df.to_csv(save_path, index=False)
    return df


def register_cli(sub) -> None:
    p = sub.add_parser("eval-lpips",
                       help="LPIPS distance between original/edited folders")
    p.add_argument("--original_path", type=str, required=True)
    p.add_argument("--edited_path", type=str, required=True)
    p.add_argument("--weights", type=str, required=True,
                   help="local LPIPS+AlexNet state dict (.pt/.safetensors)")
    p.add_argument("--prompts_path", type=str, default=None)
    p.add_argument("--save_path", type=str, default=None)
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--device", type=str, default=None)
    p.set_defaults(func=_cmd)


def _cmd(args) -> int:
    from uce_tpu.cli.main import apply_device_flag

    apply_device_flag(args.device)
    params = load_lpips_weights(args.weights)
    save_path = args.save_path or (
        args.edited_path.rstrip("/") + "_lpipsloss.csv")
    df = eval_folders(params, args.original_path, args.edited_path,
                      prompts_path=args.prompts_path, save_path=save_path,
                      image_size=args.image_size)
    print(f"wrote {save_path} ({len(df)} cases, "
          f"mean {df['lpips_loss'].mean():.4f})")
    return 0
