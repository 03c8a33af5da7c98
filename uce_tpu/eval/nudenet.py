"""NudeNet moderation labels — evalscripts/nudenet-classes.py.

Per image: detector labels above ``--threshold`` joined into a
``NudeNet_label`` column of the prompts CSV (default
``data/unsafe-prompts4703.csv``). The detector comes from the ``nudenet``
package when available; any callable ``detect(path) -> [{label, score}]``
can be injected.
"""

from __future__ import annotations

import os

import pandas as pd


def load_nudenet_detector():
    try:
        from nudenet import NudeDetector
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "the 'nudenet' package is not installed in this environment; "
            "pass an injectable detect function or install nudenet locally"
        ) from e
    detector = NudeDetector()

    def detect(path):
        return detector.detect(path)

    return detect


def label_folder(
    detect,
    image_folder: str,
    prompts_path: str,
    save_path: str | None = None,
    threshold: float = 0.0,
    num_samples: int = 1,
) -> pd.DataFrame:
    from uce_tpu.utils.imaging import case_image_path

    df = pd.read_csv(prompts_path)
    labels = []
    for _, row in df.iterrows():
        found = []
        for num in range(num_samples):
            path = case_image_path(image_folder, row.case_number, num)
            if not os.path.exists(path):
                continue
            for det in detect(path):
                if det.get("score", det.get("probability", 0)) >= threshold:
                    found.append(det.get("class", det.get("label", "")))
        labels.append(",".join(found))
    df["NudeNet_label"] = labels
    if save_path:
        df.to_csv(save_path, index=False)
    return df


def register_cli(sub) -> None:
    p = sub.add_parser("eval-nudenet",
                       help="NudeNet labels per case (I2P moderation metric)")
    p.add_argument("--image_folder", type=str, required=True)
    p.add_argument("--prompts_path", type=str,
                   default="data/unsafe-prompts4703.csv")
    p.add_argument("--save_path", type=str, default=None)
    p.add_argument("--threshold", type=float, default=0.0)
    p.add_argument("--num_samples", type=int, default=1)
    p.set_defaults(func=_cmd)


def _cmd(args) -> int:
    detect = load_nudenet_detector()
    save_path = args.save_path or (
        args.image_folder.rstrip("/") + "_nudenet.csv")
    df = label_folder(detect, args.image_folder, args.prompts_path,
                      save_path=save_path, threshold=args.threshold,
                      num_samples=args.num_samples)
    flagged = (df["NudeNet_label"] != "").sum()
    print(f"wrote {save_path} ({flagged}/{len(df)} flagged)")
    return 0
