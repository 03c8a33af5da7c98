"""Mean CLIP score over generated images vs their prompts
(evalscripts/mean_clip.py, turned into a real CLI — the reference has
hard-coded researcher paths, SURVEY.md §2.2).

Protocol: for each prompts-CSV row, score ``logits_per_image`` of
``{case}_{num}.png`` against the row's caption; report the mean.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def mean_clip_score(
    clip_model,
    image_folder: str,
    prompts_path: str,
    num_samples: int = 1,
    from_case: int = 0,
    till_case: int = 1_000_000,
    batch_size: int = 16,
) -> float:
    from uce_tpu.utils.imaging import case_image_path, load_image

    df = pd.read_csv(prompts_path)
    scores: list[float] = []
    batch_imgs, batch_prompts = [], []

    def flush():
        if not batch_imgs:
            return
        imgs = np.stack(batch_imgs)
        img_e = clip_model.embed_images(imgs)
        txt_e = clip_model.embed_texts(batch_prompts)
        img_e = np.asarray(img_e)
        txt_e = np.asarray(txt_e)
        img_e = img_e / np.linalg.norm(img_e, axis=-1, keepdims=True)
        txt_e = txt_e / np.linalg.norm(txt_e, axis=-1, keepdims=True)
        sims = (img_e * txt_e).sum(-1) * clip_model.logit_scale
        scores.extend(sims.tolist())
        batch_imgs.clear()
        batch_prompts.clear()

    for _, row in df.iterrows():
        case = row.case_number
        if not (from_case <= case <= till_case):
            continue
        for num in range(num_samples):
            path = case_image_path(image_folder, case, num)
            if not os.path.exists(path):
                continue  # reference skips missing files (mean_clip.py:41-52)
            batch_imgs.append(load_image(path))
            batch_prompts.append(str(row.prompt))
            if len(batch_imgs) >= batch_size:
                flush()
    flush()
    if not scores:
        raise FileNotFoundError(f"no scored images under {image_folder}")
    return float(np.mean(scores))


def register_cli(sub) -> None:
    p = sub.add_parser("eval-clip-score",
                       help="mean CLIP similarity of images vs captions")
    p.add_argument("--image_folder", type=str, required=True)
    p.add_argument("--prompts_path", type=str, required=True)
    p.add_argument("--clip_model_id", type=str,
                   default="openai/clip-vit-base-patch32")
    p.add_argument("--device", type=str, default=None)
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--from_case", type=int, default=0)
    p.add_argument("--till_case", type=int, default=1_000_000)
    p.set_defaults(func=_cmd)


def _cmd(args) -> int:
    from uce_tpu.cli.main import apply_device_flag

    apply_device_flag(args.device)
    from uce_tpu.models.clip import CLIPModel

    clip_model = CLIPModel.from_pretrained(args.clip_model_id)
    score = mean_clip_score(
        clip_model, args.image_folder, args.prompts_path,
        num_samples=args.num_samples, from_case=args.from_case,
        till_case=args.till_case)
    print(f"mean CLIP score: {score}")
    return 0
