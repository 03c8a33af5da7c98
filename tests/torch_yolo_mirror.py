"""Independent eager-torch transcription of the fused YOLOv8 detector.

Cross-implementation oracle for ``uce_tpu/models/yolo.py`` (the NudeNet
backbone), in the same spirit as torch_unet_mirror / torch_flux_mirror /
torch_hidream_mirror: NCHW eager torch following the ultralytics module
graph (Conv+SiLU, C2f split/append, SPPF, PAN head, Detect with DFL
decode — the architecture nudenet's ``320n.onnx`` is an export of),
consuming the same flat OIHW state dict. Deliberately written against the
*upstream* module structure, not by translating the JAX code: C2f here
uses chunk() and a module-like bottleneck loop; the decode builds
ultralytics' [B, 4+nc, A] layout first and transposes at the end.
"""

from __future__ import annotations

import re

import torch
import torch.nn.functional as F

REG_MAX = 16
STRIDES = (8, 16, 32)


def _t(sd, key):
    return torch.as_tensor(sd[key], dtype=torch.float32)


def conv_silu(x, sd, name, stride=1):
    w = _t(sd, name + ".conv.weight")
    b = _t(sd, name + ".conv.bias")
    y = F.conv2d(x, w, b, stride=stride, padding=w.shape[-1] // 2)
    return F.silu(y)


def bottleneck(x, sd, name, add):
    y = conv_silu(conv_silu(x, sd, name + ".cv1"), sd, name + ".cv2")
    return x + y if add else y


def c2f(x, sd, name, shortcut):
    y = conv_silu(x, sd, name + ".cv1")
    parts = list(y.chunk(2, dim=1))
    n = 0
    pat = re.compile(re.escape(name) + r"\.m\.(\d+)\.cv1\.conv\.weight$")
    for k in sd:
        m = pat.match(k)
        if m:
            n = max(n, int(m.group(1)) + 1)
    for j in range(n):
        parts.append(bottleneck(parts[-1], sd, f"{name}.m.{j}", shortcut))
    return conv_silu(torch.cat(parts, dim=1), sd, name + ".cv2")


def sppf(x, sd, name):
    y = conv_silu(x, sd, name + ".cv1")
    p1 = F.max_pool2d(y, 5, stride=1, padding=2)
    p2 = F.max_pool2d(p1, 5, stride=1, padding=2)
    p3 = F.max_pool2d(p2, 5, stride=1, padding=2)
    return conv_silu(torch.cat([y, p1, p2, p3], dim=1), sd, name + ".cv2")


def detect_branch(x, sd, name):
    y = conv_silu(conv_silu(x, sd, name + ".0"), sd, name + ".1")
    return F.conv2d(y, _t(sd, name + ".2.weight"), _t(sd, name + ".2.bias"))


@torch.no_grad()
def yolo_forward(sd, x):
    """x: [B,3,S,S] float in [0,1] -> [B, A, 4+nc] (xywh pixels + sigmoid
    class scores), matching uce_tpu.models.yolo.yolo_detect."""
    h = conv_silu(x, sd, "model.0", stride=2)
    h = conv_silu(h, sd, "model.1", stride=2)
    h = c2f(h, sd, "model.2", True)
    h = conv_silu(h, sd, "model.3", stride=2)
    p3 = c2f(h, sd, "model.4", True)
    h = conv_silu(p3, sd, "model.5", stride=2)
    p4 = c2f(h, sd, "model.6", True)
    h = conv_silu(p4, sd, "model.7", stride=2)
    h = c2f(h, sd, "model.8", True)
    p5 = sppf(h, sd, "model.9")

    up = lambda t: F.interpolate(t, scale_factor=2, mode="nearest")
    t = c2f(torch.cat([up(p5), p4], dim=1), sd, "model.12", False)
    o3 = c2f(torch.cat([up(t), p3], dim=1), sd, "model.15", False)
    h = conv_silu(o3, sd, "model.16", stride=2)
    o4 = c2f(torch.cat([h, t], dim=1), sd, "model.18", False)
    h = conv_silu(o4, sd, "model.19", stride=2)
    o5 = c2f(torch.cat([h, p5], dim=1), sd, "model.21", False)

    feats, anchors, strides = [], [], []
    for i, (f, s) in enumerate(zip((o3, o4, o5), STRIDES)):
        box = detect_branch(f, sd, f"model.22.cv2.{i}")
        cls = detect_branch(f, sd, f"model.22.cv3.{i}")
        y = torch.cat([box, cls], dim=1)  # [B, 64+nc, h, w]
        b, c, hh, ww = y.shape
        feats.append(y.view(b, c, hh * ww))
        sy, sx = torch.meshgrid(torch.arange(hh), torch.arange(ww),
                                indexing="ij")
        anchors.append(torch.stack(
            (sx.reshape(-1) + 0.5, sy.reshape(-1) + 0.5), dim=0).float())
        strides.append(torch.full((1, hh * ww), float(s)))
    y = torch.cat(feats, dim=2)  # [B, 64+nc, A]
    anchor = torch.cat(anchors, dim=1)  # [2, A]
    stride = torch.cat(strides, dim=1)  # [1, A]

    box, cls = y[:, :4 * REG_MAX], y[:, 4 * REG_MAX:]
    b, _, a = box.shape
    # DFL via the frozen arange conv, as ultralytics does
    dfl_w = _t(sd, "model.22.dfl.conv.weight")
    dist = F.conv2d(box.view(b, 4, REG_MAX, a).transpose(1, 2).softmax(1),
                    dfl_w).view(b, 4, a)
    lt, rb = dist[:, :2], dist[:, 2:]
    x1y1 = anchor.unsqueeze(0) - lt
    x2y2 = anchor.unsqueeze(0) + rb
    xywh = torch.cat(((x1y1 + x2y2) / 2, x2y2 - x1y1), dim=1) * stride
    out = torch.cat([xywh, cls.sigmoid()], dim=1)  # [B, 4+nc, A]
    return out.transpose(1, 2)
