"""Post-hoc CLIP attribute classification (evalscripts/CLIP_classify.py).

Folder of ``{case}_{num}.png`` images + ``--attributes`` -> per-case mean
attribute ratios merged into the prompts CSV, written as
``{model}_{col}_classify.csv``. Images batch through the JAX CLIP model
instead of one-at-a-time PIL->torch hops.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd


def sorted_nicely(names):
    """Natural sort (reference ``CLIP_classify.py:10-13``)."""
    def key(s):
        return [int(t) if t.isdigit() else t.lower()
                for t in re.split(r"(\d+)", s)]

    return sorted(names, key=key)


def classify_folder(
    clip_model,
    image_folder: str,
    attributes: list[str],
    prompts_path: str | None = None,
    save_path: str | None = None,
    from_case: int = 0,
    till_case: int = 1_000_000,
    batch_size: int = 32,
) -> pd.DataFrame:
    from uce_tpu.utils.imaging import load_image, stack_uniform

    names = sorted_nicely(
        [n for n in os.listdir(image_folder) if n.endswith(".png")])
    rows = []
    batch_imgs, batch_meta = [], []

    def flush():
        if not batch_imgs:
            return
        imgs = stack_uniform(batch_imgs)
        pred = clip_model.classify(imgs, attributes)
        for (case, num), p in zip(batch_meta, pred):
            one_hot = np.zeros(len(attributes))
            one_hot[int(p)] = 1.0
            rows.append({"case_number": case, "num": num,
                         **{a: one_hot[i] for i, a in enumerate(attributes)}})
        batch_imgs.clear()
        batch_meta.clear()

    for name in names:
        m = re.match(r"(\d+)_(\d+)\.png", name)
        if not m:
            continue
        case, num = int(m.group(1)), int(m.group(2))
        if not (from_case <= case <= till_case):
            continue
        batch_imgs.append(load_image(os.path.join(image_folder, name)))
        batch_meta.append((case, num))
        if len(batch_imgs) >= batch_size:
            flush()
    flush()

    df = pd.DataFrame(rows)
    if df.empty:
        raise FileNotFoundError(f"no case images found in {image_folder}")
    means = df.groupby("case_number")[attributes].mean().reset_index()
    # reference column naming: '{attribute with _}_bias' (CLIP_classify.py:26)
    means = means.rename(columns={
        a: f"{a.replace(' ', '_')}_bias" for a in attributes})
    if prompts_path:
        # reference keeps every prompts row (NaN where no images)
        prompts = pd.read_csv(prompts_path)
        means = prompts.merge(means, on="case_number", how="left")
    if save_path:
        means.to_csv(save_path, index=False)
    return means


def register_cli(sub) -> None:
    p = sub.add_parser("eval-clip-classify",
                       help="zero-shot attribute ratios per case")
    p.add_argument("--image_folder", type=str, required=True)
    p.add_argument("--attributes", type=str, default="a man,a woman",
                   help="comma-separated candidate labels")
    p.add_argument("--prompts_path", type=str, default=None)
    p.add_argument("--save_path", type=str, default=None)
    p.add_argument("--clip_model_id", type=str,
                   default="openai/clip-vit-base-patch32")
    p.add_argument("--device", type=str, default=None)
    p.add_argument("--from_case", type=int, default=0)
    p.add_argument("--till_case", type=int, default=1_000_000)
    p.add_argument("--column_name", type=str, default="gender")
    p.set_defaults(func=_cmd)


def _cmd(args) -> int:
    from uce_tpu.cli.main import apply_device_flag

    apply_device_flag(args.device)
    from uce_tpu.models.clip import CLIPModel

    clip_model = CLIPModel.from_pretrained(args.clip_model_id)
    attributes = [a.strip() for a in args.attributes.split(",")]
    save_path = args.save_path or (
        args.image_folder.rstrip("/") + f"_{args.column_name}_classify.csv")
    df = classify_folder(
        clip_model, args.image_folder, attributes,
        prompts_path=args.prompts_path, save_path=save_path,
        from_case=args.from_case, till_case=args.till_case)
    print(f"wrote {save_path} ({len(df)} cases)")
    return 0
