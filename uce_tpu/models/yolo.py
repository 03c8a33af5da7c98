"""YOLOv8-family detector in JAX — the NudeNet 3.x backbone.

The reference's moderation metric (``evalscripts/nudenet-classes.py:11-25``)
runs the ``nudenet`` package, whose ``NudeDetector`` is an ONNX export of an
ultralytics YOLOv8-n trained on 18 body-part classes at 320x320. This module
re-implements that detector TPU-natively: NHWC convs feeding the MXU, the
whole forward one jitted program, DFL/anchor decode inside the graph, and
only the (tiny, data-dependent) NMS on host.

Weight format: a FLAT dict keyed by the torch/ONNX parameter names of the
*fused* export ("model.0.conv.weight", "model.22.cv3.0.2.bias", ...) — the
exact names found as initializers in nudenet's ``320n.onnx``
(ultralytics fuses Conv+BN before export, so every Conv is conv+bias+SiLU).
``params_from_state`` converts that dict (numpy, OIHW) to the JAX form
(HWIO); ``tools/convert_nudenet.py`` produces the flat dict from the ONNX
file. The architecture is inferred from weight shapes, so any yolov8 scale
(n/s/m/...) loads — nudenet ships the -n scale.

Cross-validated against an independent eager-torch transcription
(tests/torch_yolo_mirror.py) on shared random weights; the decode path is
additionally pinned to a hand-rolled numpy oracle (tests/test_yolo.py).
"""

from __future__ import annotations

import math
import re
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from uce_tpu.models.layers import conv2d, conv_kernel

REG_MAX = 16
STRIDES = (8, 16, 32)

# nudenet 3.x detector classes, in model output order (nudenet/nudenet.py).
NUDENET_LABELS = (
    "FEMALE_GENITALIA_COVERED",
    "FACE_FEMALE",
    "BUTTOCKS_EXPOSED",
    "FEMALE_BREAST_EXPOSED",
    "FEMALE_GENITALIA_EXPOSED",
    "MALE_BREAST_EXPOSED",
    "ANUS_EXPOSED",
    "FEET_EXPOSED",
    "BELLY_COVERED",
    "FEET_COVERED",
    "ARMPITS_COVERED",
    "ARMPITS_EXPOSED",
    "FACE_MALE",
    "BELLY_EXPOSED",
    "MALE_GENITALIA_EXPOSED",
    "ANUS_COVERED",
    "FEMALE_BREAST_COVERED",
    "BUTTOCKS_COVERED",
)


# ---------------------------------------------------------------------------
# parameter handling
# ---------------------------------------------------------------------------

def params_from_state(sd: Mapping) -> dict:
    """Flat torch/ONNX state dict (OIHW numpy) -> JAX param dict (HWIO)."""
    out = {}
    for k, v in sd.items():
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                       else v, np.float32)
        if v.ndim == 4:
            v = conv_kernel(v)
        out[k] = jnp.asarray(v)
    return out


def _n_bottlenecks(params: Mapping, idx: int) -> int:
    pat = re.compile(rf"^model\.{idx}\.m\.(\d+)\.cv1\.")
    js = {int(m.group(1)) for k in params if (m := pat.match(k))}
    return 1 + max(js) if js else 0


def init_yolo_state(seed: int = 0, nc: int = 18,
                    widths=(16, 32, 64, 128, 256),
                    depths=(1, 2, 2, 1)) -> dict:
    """Random flat state dict (OIHW numpy) with yolov8 structure.

    Defaults are the -n scale nudenet ships. Used by tests (shared weights
    for the torch mirror) and for shape smoke; real weights come from
    ``tools/convert_nudenet.py``.
    """
    rng = np.random.default_rng(seed)
    sd: dict[str, np.ndarray] = {}

    def conv(name, c1, c2, k):
        fan = c1 * k * k
        sd[name + ".conv.weight"] = rng.normal(
            0, 1 / math.sqrt(fan), (c2, c1, k, k)).astype(np.float32)
        sd[name + ".conv.bias"] = rng.normal(0, 0.02, c2).astype(np.float32)

    def plain(name, c1, c2):  # final 1x1 Conv2d of a Detect branch
        sd[name + ".weight"] = rng.normal(
            0, 1 / math.sqrt(c1), (c2, c1, 1, 1)).astype(np.float32)
        sd[name + ".bias"] = rng.normal(0, 0.02, c2).astype(np.float32)

    def c2f(name, c1, c2, n):
        c = c2 // 2
        conv(name + ".cv1", c1, 2 * c, 1)
        conv(name + ".cv2", (2 + n) * c, c2, 1)
        for j in range(n):
            conv(f"{name}.m.{j}.cv1", c, c, 3)
            conv(f"{name}.m.{j}.cv2", c, c, 3)

    w0, w1, w2, w3, w4 = widths
    n1, n2, n3, n4 = depths
    conv("model.0", 3, w0, 3)
    conv("model.1", w0, w1, 3)
    c2f("model.2", w1, w1, n1)
    conv("model.3", w1, w2, 3)
    c2f("model.4", w2, w2, n2)
    conv("model.5", w2, w3, 3)
    c2f("model.6", w3, w3, n3)
    conv("model.7", w3, w4, 3)
    c2f("model.8", w4, w4, n4)
    conv("model.9.cv1", w4, w4 // 2, 1)
    conv("model.9.cv2", 2 * w4, w4, 1)
    c2f("model.12", w4 + w3, w3, n1)
    c2f("model.15", w3 + w2, w2, n1)
    conv("model.16", w2, w2, 3)
    c2f("model.18", w2 + w3, w3, n1)
    conv("model.19", w3, w3, 3)
    c2f("model.21", w3 + w4, w4, n1)
    ch = (w2, w3, w4)
    cdfl = max(16, ch[0] // 4, 4 * REG_MAX)
    ccls = max(ch[0], min(nc, 100))
    for i, c in enumerate(ch):
        conv(f"model.22.cv2.{i}.0", c, cdfl, 3)
        conv(f"model.22.cv2.{i}.1", cdfl, cdfl, 3)
        plain(f"model.22.cv2.{i}.2", cdfl, 4 * REG_MAX)
        conv(f"model.22.cv3.{i}.0", c, ccls, 3)
        conv(f"model.22.cv3.{i}.1", ccls, ccls, 3)
        plain(f"model.22.cv3.{i}.2", ccls, nc)
    # the DFL "conv" is a frozen arange(16) expectation — present in the
    # ONNX export; the decode below computes it directly.
    sd["model.22.dfl.conv.weight"] = (
        np.arange(REG_MAX, dtype=np.float32).reshape(1, REG_MAX, 1, 1))
    return sd


EXPECTED_KEY_RE = re.compile(
    r"^model\.(0|1|3|5|7|16|19)\.conv\.(weight|bias)$"
    r"|^model\.(2|4|6|8|12|15|18|21)\.(cv1|cv2)\.conv\.(weight|bias)$"
    r"|^model\.(2|4|6|8|12|15|18|21)\.m\.\d+\.(cv1|cv2)\.conv\.(weight|bias)$"
    r"|^model\.9\.(cv1|cv2)\.conv\.(weight|bias)$"
    r"|^model\.22\.(cv2|cv3)\.[012]\.[01]\.conv\.(weight|bias)$"
    r"|^model\.22\.(cv2|cv3)\.[012]\.2\.(weight|bias)$"
    r"|^model\.22\.dfl\.conv\.weight$")


def validate_state(sd: Mapping) -> None:
    """Hard-fail on any unrecognized/missing key — first-contact guard for
    converted checkpoints (an architecture drift in a future nudenet export
    must surface here, not as silently-wrong detections)."""
    unknown = sorted(k for k in sd if not EXPECTED_KEY_RE.match(k))
    if unknown:
        raise ValueError(
            f"unrecognized detector parameters (architecture drift?): "
            f"{unknown[:8]}{' ...' if len(unknown) > 8 else ''}")
    need = ["model.0.conv.weight", "model.22.cv3.2.2.bias",
            "model.9.cv2.conv.weight", "model.22.dfl.conv.weight"]
    missing = [k for k in need if k not in sd]
    if missing:
        raise ValueError(f"detector checkpoint is missing {missing}")
    # decode() computes the DFL expectation directly as arange(REG_MAX);
    # refuse an export whose frozen DFL conv disagrees (it would decode
    # to silently-wrong boxes)
    dfl = np.asarray(sd["model.22.dfl.conv.weight"],
                     np.float32).reshape(-1)
    if dfl.shape != (REG_MAX,) or not np.allclose(
            dfl, np.arange(REG_MAX, dtype=np.float32)):
        raise ValueError(
            "DFL weights are not the standard arange(16) expectation — "
            "this export's decode differs from the implemented one")


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _cbs(p, name, x, stride=1):
    """Fused Conv+BN+SiLU block (export form: conv bias + silu)."""
    w = p[name + ".conv.weight"]
    k = w.shape[0]
    return jax.nn.silu(conv2d(x, w, p[name + ".conv.bias"],
                              stride=stride, padding=k // 2))


def _c2f(p, name, x, shortcut):
    h = _cbs(p, name + ".cv1", x)
    c = h.shape[-1] // 2
    ys = [h[..., :c], h[..., c:]]
    for j in range(_n_bottlenecks(p, int(name.split(".")[1]))):
        b = _cbs(p, f"{name}.m.{j}.cv2", _cbs(p, f"{name}.m.{j}.cv1", ys[-1]))
        ys.append(ys[-1] + b if shortcut else b)
    return _cbs(p, name + ".cv2", jnp.concatenate(ys, axis=-1))


def _sppf(p, name, x):
    h = _cbs(p, name + ".cv1", x)
    pool = lambda t: jax.lax.reduce_window(
        t, -jnp.inf, jax.lax.max, (1, 5, 5, 1), (1, 1, 1, 1),
        [(0, 0), (2, 2), (2, 2), (0, 0)])
    p1 = pool(h)
    p2 = pool(p1)
    p3 = pool(p2)
    return _cbs(p, name + ".cv2", jnp.concatenate([h, p1, p2, p3], axis=-1))


def _up2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def yolo_raw(params: Mapping, x: jnp.ndarray) -> list[jnp.ndarray]:
    """NHWC [B,S,S,3] in [0,1] -> per-scale head maps [B,h,w,64+nc]."""
    h = _cbs(params, "model.0", x, stride=2)
    h = _cbs(params, "model.1", h, stride=2)
    h = _c2f(params, "model.2", h, True)
    h = _cbs(params, "model.3", h, stride=2)
    p3 = _c2f(params, "model.4", h, True)
    h = _cbs(params, "model.5", p3, stride=2)
    p4 = _c2f(params, "model.6", h, True)
    h = _cbs(params, "model.7", p4, stride=2)
    h = _c2f(params, "model.8", h, True)
    p5 = _sppf(params, "model.9", h)

    t = _c2f(params, "model.12", jnp.concatenate([_up2(p5), p4], -1), False)
    o3 = _c2f(params, "model.15", jnp.concatenate([_up2(t), p3], -1), False)
    h = _cbs(params, "model.16", o3, stride=2)
    o4 = _c2f(params, "model.18", jnp.concatenate([h, t], -1), False)
    h = _cbs(params, "model.19", o4, stride=2)
    o5 = _c2f(params, "model.21", jnp.concatenate([h, p5], -1), False)

    outs = []
    for i, f in enumerate((o3, o4, o5)):
        box = _cbs(params, f"model.22.cv2.{i}.1",
                   _cbs(params, f"model.22.cv2.{i}.0", f))
        box = conv2d(box, params[f"model.22.cv2.{i}.2.weight"],
                     params[f"model.22.cv2.{i}.2.bias"], padding=0)
        cls = _cbs(params, f"model.22.cv3.{i}.1",
                   _cbs(params, f"model.22.cv3.{i}.0", f))
        cls = conv2d(cls, params[f"model.22.cv3.{i}.2.weight"],
                     params[f"model.22.cv3.{i}.2.bias"], padding=0)
        outs.append(jnp.concatenate([box, cls], axis=-1))
    return outs


def decode(outs: list[jnp.ndarray]) -> jnp.ndarray:
    """Per-scale head maps -> [B, A, 4+nc]: xywh in input pixels + sigmoid
    class scores (the ONNX graph's output, transposed to anchors-first)."""
    flat, anchors, strides = [], [], []
    for o, s in zip(outs, STRIDES):
        b, hh, ww, c = o.shape
        flat.append(o.reshape(b, hh * ww, c))
        yy, xx = jnp.meshgrid(jnp.arange(hh), jnp.arange(ww), indexing="ij")
        anchors.append(jnp.stack(
            [xx.reshape(-1) + 0.5, yy.reshape(-1) + 0.5], axis=-1))
        strides.append(jnp.full((hh * ww, 1), s, jnp.float32))
    o = jnp.concatenate(flat, axis=1)
    anchor = jnp.concatenate(anchors, axis=0).astype(jnp.float32)
    stride = jnp.concatenate(strides, axis=0)

    box, cls = o[..., :4 * REG_MAX], o[..., 4 * REG_MAX:]
    # DFL: softmax expectation over the 16 bins per side distance
    b, a = box.shape[:2]
    dist = jax.nn.softmax(box.reshape(b, a, 4, REG_MAX), axis=-1)
    dist = (dist * jnp.arange(REG_MAX, dtype=jnp.float32)).sum(-1)
    lt, rb = dist[..., :2], dist[..., 2:]
    x1y1 = anchor - lt
    x2y2 = anchor + rb
    xywh = jnp.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1], -1) * stride
    return jnp.concatenate([xywh, jax.nn.sigmoid(cls)], axis=-1)


def yolo_detect(params: Mapping, x: jnp.ndarray) -> jnp.ndarray:
    """Jittable full forward: [B,S,S,3] in [0,1] -> [B, A, 4+nc]."""
    return decode(yolo_raw(params, x))


# ---------------------------------------------------------------------------
# pre/post-processing (host side, like nudenet's cv2 stage)
# ---------------------------------------------------------------------------

def letterbox(img: np.ndarray, size: int = 320):
    """Aspect-preserving resize + centered zero pad to ``size``.

    Returns (canvas [size,size,3] float32 in [0,1], scale, pad_x, pad_y);
    a model-space coordinate maps back via (v - pad) * scale, where scale
    is original-pixels per canvas-pixel.
    """
    from PIL import Image

    h, w = img.shape[:2]
    scale = size / max(h, w)
    nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
    im = Image.fromarray(img).resize((nw, nh), Image.BILINEAR)
    canvas = np.zeros((size, size, 3), np.float32)
    px, py = (size - nw) // 2, (size - nh) // 2
    canvas[py:py + nh, px:px + nw] = np.asarray(im, np.float32) / 255.0
    return canvas, w / nw, px, py


def nms(boxes_xywh: np.ndarray, scores: np.ndarray,
        iou_threshold: float = 0.45) -> list[int]:
    """Greedy class-agnostic NMS (nudenet runs cv2.dnn.NMSBoxes over the
    max-class boxes). boxes are [N,4] xywh (top-left x,y)."""
    if len(boxes_xywh) == 0:
        return []
    x1, y1 = boxes_xywh[:, 0], boxes_xywh[:, 1]
    x2, y2 = x1 + boxes_xywh[:, 2], y1 + boxes_xywh[:, 3]
    area = np.maximum(0.0, x2 - x1) * np.maximum(0.0, y2 - y1)
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        iw = np.maximum(0.0, np.minimum(x2[i], x2[rest])
                        - np.maximum(x1[i], x1[rest]))
        ih = np.maximum(0.0, np.minimum(y2[i], y2[rest])
                        - np.maximum(y1[i], y1[rest]))
        inter = iw * ih
        iou = inter / np.maximum(area[i] + area[rest] - inter, 1e-9)
        order = rest[iou <= iou_threshold]
    return keep


def postprocess(pred: np.ndarray, scale: float, pad_x: int, pad_y: int,
                labels=NUDENET_LABELS, score_threshold: float = 0.2,
                iou_threshold: float = 0.45) -> list[dict]:
    """One image's decoded output [A, 4+nc] -> nudenet-schema detections
    [{"class", "score", "box": [x, y, w, h]}] in original-image pixels."""
    xywh, cls = pred[:, :4], pred[:, 4:]
    best = cls.argmax(-1)
    score = cls[np.arange(len(cls)), best]
    m = score >= score_threshold
    if not m.any():
        return []
    xywh, best, score = xywh[m], best[m], score[m]
    tl = np.stack([(xywh[:, 0] - xywh[:, 2] / 2 - pad_x) * scale,
                   (xywh[:, 1] - xywh[:, 3] / 2 - pad_y) * scale,
                   xywh[:, 2] * scale, xywh[:, 3] * scale], axis=-1)
    keep = nms(tl, score, iou_threshold)
    return [{"class": labels[best[i]], "score": float(score[i]),
             "box": [int(round(v)) for v in tl[i]]} for i in keep]
