"""ResNet-50 top-k ImageNet classification — evalscripts/imageclassify.py.

Object-erasure accuracy: classify ``{case}_{num}.png`` images, merge top-k
predictions with the prompts CSV (which carries ``label_idx`` for
imagenet_prompts.csv rows). The reference's ``name_`` NameError when
``--save_path`` is omitted (``imageclassify.py:27-28``) is fixed here: a
default save path is always derived.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd

from uce_tpu.models.vision_backbones import (
    convert_resnet50,
    preprocess_imagenet,
    resnet50_logits,
)


def load_resnet_weights(path: str) -> dict:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return convert_resnet50(load_file(path))
    import torch

    return convert_resnet50(torch.load(path, map_location="cpu",
                                       weights_only=True))


def classify_folder(
    params: dict,
    image_folder: str,
    prompts_path: str | None = None,
    save_path: str | None = None,
    topk: int = 5,
    batch_size: int = 16,
    from_case: int = 0,
    till_case: int = 1_000_000,
    categories: list[str] | None = None,
) -> pd.DataFrame:
    """Reference CSV contract (imageclassify.py:80-87): per-image
    ``index_top{k}``/``scores_top{k}``/``category_top{k}`` columns merged
    with the prompts CSV. ``categories`` maps class index -> name (the
    reference uses torchvision weight metadata); indexes are used as names
    when absent."""
    from uce_tpu.utils.imaging import load_image, stack_uniform

    rows, batch, meta = [], [], []

    def flush():
        if not batch:
            return
        logits = np.asarray(resnet50_logits(
            params, preprocess_imagenet(stack_uniform(batch))))
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        top = np.argsort(-probs, axis=-1)[:, :topk]
        for (case, num), t, p in zip(meta, top, probs):
            row = {"case_number": case, "num": num}
            for i in range(topk):
                idx = int(t[i])
                row[f"category_top{i+1}"] = (
                    categories[idx] if categories else str(idx))
                row[f"index_top{i+1}"] = idx
                row[f"scores_top{i+1}"] = float(p[idx])
            rows.append(row)
        batch.clear()
        meta.clear()

    names = sorted(n for n in os.listdir(image_folder) if n.endswith(".png"))
    for name in names:
        m = re.match(r"(\d+)_(\d+)\.png", name)
        if not m:
            continue
        case, num = int(m.group(1)), int(m.group(2))
        if not (from_case <= case <= till_case):
            continue
        batch.append(load_image(os.path.join(image_folder, name)))
        meta.append((case, num))
        if len(batch) >= batch_size:
            flush()
    flush()
    if not rows:
        raise FileNotFoundError(f"no case images in {image_folder}")

    df = pd.DataFrame(rows)
    if prompts_path:
        prompts = pd.read_csv(prompts_path)
        df = prompts.merge(df, on="case_number", how="inner")
        if "label_idx" in df.columns:
            hits = df[[f"index_top{i+1}" for i in range(topk)]].values
            df["correct"] = (hits == df["label_idx"].values[:, None]).any(-1)
    if save_path:
        df.to_csv(save_path, index=False)
    return df


def register_cli(sub) -> None:
    p = sub.add_parser("eval-imageclassify",
                       help="ResNet-50 top-k classification of case images")
    p.add_argument("--image_folder", type=str, required=True)
    p.add_argument("--weights", type=str, required=True,
                   help="local torchvision resnet50 state dict")
    p.add_argument("--prompts_path", type=str, default=None)
    p.add_argument("--save_path", type=str, default=None)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--labels_path", type=str, default=None,
                   help="text file with one ImageNet category name per "
                        "line (the reference reads torchvision metadata)")
    p.add_argument("--device", type=str, default=None)
    p.add_argument("--from_case", type=int, default=0)
    p.add_argument("--till_case", type=int, default=1_000_000)
    p.set_defaults(func=_cmd)


def _cmd(args) -> int:
    from uce_tpu.cli.main import apply_device_flag

    apply_device_flag(args.device)
    params = load_resnet_weights(args.weights)
    save_path = args.save_path or (
        args.image_folder.rstrip("/") + "_classification.csv")
    categories = None
    if args.labels_path:
        with open(args.labels_path) as f:
            categories = [line.strip() for line in f]
    df = classify_folder(params, args.image_folder,
                         prompts_path=args.prompts_path,
                         save_path=save_path, topk=args.topk,
                         from_case=args.from_case, till_case=args.till_case,
                         categories=categories)
    if "correct" in df.columns:
        print(f"top-{args.topk} accuracy: {df['correct'].mean():.4f}")
    print(f"wrote {save_path} ({len(df)} rows)")
    return 0
