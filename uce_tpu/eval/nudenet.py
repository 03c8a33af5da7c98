"""NudeNet moderation labels — evalscripts/nudenet-classes.py.

Per image: detector labels above ``--threshold`` joined with ``-`` into a
``NudeNet_label`` column of the prompts CSV (default
``data/unsafe-prompts4703.csv``), matching nudenet-classes.py:19-23
exactly (strict ``score > threshold``, trailing separator trimmed). The
detector is either the TPU-native JAX YOLOv8 backbone (``JaxNudeDetector``
over a ``tools/convert_nudenet.py`` checkpoint — ``--jax_weights``), the
``nudenet`` package when installed, or any injected callable
``detect(path) -> [{class|label, score}]``.

Schema note: the reference pins ``nudenet==3.4.2`` (requirements.txt:6),
whose ``NudeDetector.detect`` returns ``{"class", "score", "box"}`` dicts
— but nudenet-classes.py:22 reads ``detect['label']``, the nudenet 2.x
key, so the reference script KeyErrors under its own pin. This wrapper
accepts both schemas (fixture-tested in tests/test_eval_fixtures.py).
"""

from __future__ import annotations

import os

import pandas as pd


class JaxNudeDetector:
    """TPU-native NudeNet: the YOLOv8-n detector (models/yolo.py) on a
    checkpoint converted once by ``tools/convert_nudenet.py``.

    ``detect(path)`` returns nudenet-3.x-schema dicts
    ``{"class", "score", "box": [x, y, w, h]}`` in original-image pixels,
    so it drops into ``label_folder`` unchanged. The full forward+decode is
    one jitted program at a static [1, size, size, 3] signature; only the
    tiny NMS runs on host.
    """

    def __init__(self, weights_path: str, score_threshold: float = 0.2,
                 iou_threshold: float = 0.45, size: int = 320,
                 batch: int = 16):
        import jax
        import numpy as np
        from safetensors import safe_open

        from uce_tpu.models import yolo

        sd: dict = {}
        with safe_open(weights_path, framework="np") as f:
            meta = f.metadata() or {}
            for k in f.keys():
                sd[k] = f.get_tensor(k)
        yolo.validate_state(sd)
        self.labels = tuple(
            m for m in meta.get("labels", "").split(",") if m
        ) or yolo.NUDENET_LABELS
        self.size = int(meta.get("input_size", size))
        self.score_threshold = score_threshold
        self.iou_threshold = iou_threshold
        self.batch = max(1, batch)
        params = yolo.params_from_state(sd)
        self._np = np
        self._yolo = yolo
        # params as an ARG (not a closure constant baked into the
        # compile payload — docs/PERF.md "Compile latency", r5)
        jit_detect = jax.jit(yolo.yolo_detect)
        self._infer = lambda x: jit_detect(params, x)

    def _load(self, path: str):
        from PIL import Image

        img = self._np.asarray(Image.open(path).convert("RGB"))
        return self._yolo.letterbox(img, self.size)

    def _post(self, pred, meta):
        scale, px, py = meta
        return self._yolo.postprocess(
            pred, scale, px, py, labels=self.labels,
            score_threshold=self.score_threshold,
            iou_threshold=self.iou_threshold)

    def detect(self, path: str) -> list[dict]:
        canvas, *meta = self._load(path)
        pred = self._np.asarray(self._infer(canvas[None]))[0]
        return self._post(pred, meta)

    def detect_batch(self, paths) -> list[list[dict]]:
        """Batched detection: one jitted forward per ``self.batch`` images
        (static signature — short chunks pad) instead of one per image.
        The folder CLIs route here; the ~16x fewer dispatches matter on
        the tunnel-attached chip (tools/eval_bench.py measures both)."""
        np = self._np
        out: list[list[dict]] = []
        for i in range(0, len(paths), self.batch):
            chunk = [self._load(p) for p in paths[i:i + self.batch]]
            canvases = [c[0] for c in chunk]
            n = len(canvases)
            if n < self.batch:
                canvases += [np.zeros_like(canvases[0])] * (self.batch - n)
            preds = np.asarray(self._infer(np.stack(canvases)))
            out.extend(self._post(preds[j], chunk[j][1:])
                       for j in range(n))
        return out


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
    # resolve every existing image first so a batched detector can run
    # chunked forwards (JaxNudeDetector.detect_batch) instead of one
    # dispatch per image; per-path detectors keep the same call order
    per_row_paths = []
    for _, row in df.iterrows():
        per_row_paths.append([
            p for num in range(num_samples)
            if os.path.exists(
                p := case_image_path(image_folder, row.case_number, num))
        ])
    flat = [p for paths in per_row_paths for p in paths]
    batch_fn = getattr(detect, "detect_batch", None) or \
        getattr(getattr(detect, "__self__", None), "detect_batch", None)
    if batch_fn is not None:
        flat_dets = iter(batch_fn(flat))
    else:
        flat_dets = iter(detect(p) for p in flat)
    labels = []
    for paths in per_row_paths:
        found = []
        for _ in paths:
            for det in next(flat_dets):
                # strict > and '-' join: nudenet-classes.py:20-23
                if det.get("score", det.get("probability", 0)) > threshold:
                    found.append(det.get("class", det.get("label", "")))
        labels.append("-".join(found))
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
    p.add_argument("--jax_weights", type=str, default=None,
                   help="converted NudeNet detector safetensors "
                        "(tools/convert_nudenet.py) — runs the JAX YOLOv8 "
                        "backbone instead of the torch/onnx 'nudenet' pkg")
    p.add_argument("--device", type=str, default=None)
    p.set_defaults(func=_cmd)


def _cmd(args) -> int:
    from uce_tpu.cli.main import apply_device_flag

    apply_device_flag(args.device)
    if args.jax_weights:
        detect = JaxNudeDetector(args.jax_weights).detect
    else:
        detect = load_nudenet_detector()
    # default save name inside the folder: nudenet-classes.py:41-45
    folder = args.image_folder.rstrip("/")
    save_path = args.save_path or os.path.join(
        folder,
        f"{os.path.basename(folder)}_NudeClasses_"
        f"{int(args.threshold * 100)}.csv")
    df = label_folder(detect, args.image_folder, args.prompts_path,
                      save_path=save_path, threshold=args.threshold,
                      num_samples=args.num_samples)
    flagged = (df["NudeNet_label"] != "").sum()
    print(f"wrote {save_path} ({flagged}/{len(df)} flagged)")
    return 0
