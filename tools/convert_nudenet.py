"""Convert NudeNet's ONNX detector into the JAX loader's safetensors format.

Run ONCE wherever the detector file exists — either from the installed
``nudenet`` package (which bundles ``320n.onnx``; the reference pins
nudenet==3.4.2, requirements.txt:6) or from an explicit ``--onnx`` path:

    python tools/convert_nudenet.py --out nudenet_320n.safetensors
    python tools/convert_nudenet.py --onnx 320n.onnx --out nudenet_320n.safetensors

then moderate anywhere with:

    uce eval-nudenet --jax_weights nudenet_320n.safetensors ...

What it does: reads the graph initializers (via the ``onnx`` package when
installed, else the self-contained wire-format reader in
``uce_tpu.utils.onnx_lite`` — no dependency needed), validates the
parameter-name set against the fused-YOLOv8 layout ``models/yolo.py``
implements (HARD-FAIL on drift: a renamed or re-architected future export
must surface here, not as silently-wrong detections), and writes one
safetensors file with the class-label order in metadata (taken from the
installed nudenet package when available, else the pinned 3.x list).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def find_packaged_onnx() -> str | None:
    try:
        import nudenet
    except ImportError:
        return None
    pkg_dir = os.path.dirname(nudenet.__file__)
    hits = sorted(glob.glob(os.path.join(pkg_dir, "*.onnx")))
    return hits[0] if hits else None


def read_onnx_initializers(path: str) -> dict:
    try:
        import onnx

        model = onnx.load(path)
        from onnx.numpy_helper import to_array

        return {t.name: to_array(t) for t in model.graph.initializer}
    except ImportError:
        from uce_tpu.utils.onnx_lite import read_initializers

        return read_initializers(path)


def package_labels() -> list[str]:
    from uce_tpu.models.yolo import NUDENET_LABELS

    try:
        import nudenet

        for attr in ("__labels", "all_labels", "LABELS"):
            labels = getattr(nudenet.nudenet, attr, None) or getattr(
                nudenet, attr, None)
            if labels:
                return list(labels)
    except ImportError:
        pass
    return list(NUDENET_LABELS)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--onnx", type=str, default=None,
                    help="path to the detector ONNX (default: the file "
                         "bundled with the installed nudenet package)")
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args(argv)

    path = args.onnx or find_packaged_onnx()
    if not path:
        print("no --onnx given and no installed nudenet package to take "
              "the bundled detector from", file=sys.stderr)
        return 1

    import numpy as np

    from uce_tpu.models.yolo import validate_state

    init = read_onnx_initializers(path)
    # keep only the named parameters; exports may carry anonymous
    # constants (anchors/strides/shape tensors) the decode re-derives
    params = {k: np.asarray(v, np.float32) for k, v in init.items()
              if k.startswith("model.") and v.ndim >= 1}
    validate_state(params)

    labels = package_labels()
    nc = int(params["model.22.cv3.2.2.bias"].shape[0])
    if len(labels) != nc:
        print(f"label list ({len(labels)}) does not match the head's class "
              f"count ({nc}) — refusing to write a mislabeled checkpoint",
              file=sys.stderr)
        return 1

    from safetensors.numpy import save_file

    save_file(params, args.out,
              metadata={"labels": ",".join(labels),
                        "source": os.path.basename(path),
                        "input_size": "320"})
    total = sum(v.size for v in params.values())
    print(f"wrote {args.out}: {len(params)} tensors, {total / 1e6:.1f} M "
          f"params, {nc} classes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
