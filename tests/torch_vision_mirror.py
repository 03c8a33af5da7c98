"""Hand-written torch mirrors of the eval-suite vision stacks.

torchvision and the lpips package are not installed in this image, so these
transcribe their published architectures (torchvision AlexNet/VGG19/
ResNet-50 v1.5 and lpips.LPIPS(net='alex') v0.1) functionally from the
state dicts, for cross-validating the JAX NHWC implementations in
``uce_tpu/models/vision_backbones.py`` on shared random weights
(reference anchors: evalscripts/lpips_eval.py:22-51,
evalscripts/styleloss.py:113-202, evalscripts/imageclassify.py:29-68).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

# --------------------------------------------------------------------------
# AlexNet .features (torchvision): convs at indices 0,3,6,8,10
# --------------------------------------------------------------------------

ALEXNET_SHAPES = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
                  (256, 384, 3, 3), (256, 256, 3, 3)]
_ALEXNET_IDX = (0, 3, 6, 8, 10)


def random_alexnet_sd(seed: int = 0) -> dict:
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for idx, shape in zip(_ALEXNET_IDX, ALEXNET_SHAPES):
        sd[f"features.{idx}.weight"] = torch.randn(shape, generator=g) * 0.05
        sd[f"features.{idx}.bias"] = torch.randn(shape[0], generator=g) * 0.01
    return sd


def alexnet_features_torch(sd: dict, x: torch.Tensor) -> list[torch.Tensor]:
    """x [B,3,H,W] -> the 5 post-ReLU conv taps (LPIPS tap points)."""
    def cw(i):
        return sd[f"features.{i}.weight"], sd[f"features.{i}.bias"]

    taps = []
    h = F.relu(F.conv2d(x, *cw(0), stride=4, padding=2))
    taps.append(h)
    h = F.max_pool2d(h, 3, 2)
    h = F.relu(F.conv2d(h, *cw(3), padding=2))
    taps.append(h)
    h = F.max_pool2d(h, 3, 2)
    h = F.relu(F.conv2d(h, *cw(6), padding=1))
    taps.append(h)
    h = F.relu(F.conv2d(h, *cw(8), padding=1))
    taps.append(h)
    h = F.relu(F.conv2d(h, *cw(10), padding=1))
    taps.append(h)
    return taps


# --------------------------------------------------------------------------
# lpips.LPIPS(net='alex'), version 0.1: scaling layer -> alexnet taps ->
# channel-unit-normalize -> squared diff -> 1x1 lin conv -> spatial mean ->
# sum over layers.
# --------------------------------------------------------------------------


def lpips_torch(alex_sd: dict, lins: list[torch.Tensor],
                x: torch.Tensor, y: torch.Tensor) -> torch.Tensor:
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    fx = alexnet_features_torch(alex_sd, (x - shift) / scale)
    fy = alexnet_features_torch(alex_sd, (y - shift) / scale)
    total = torch.zeros(x.shape[0])
    for tx, ty, lin in zip(fx, fy, lins):
        nx = tx / (tx.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        ny = ty / (ty.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (nx - ny).pow(2)
        total = total + F.conv2d(d, lin.view(1, -1, 1, 1)).mean(dim=(2, 3))[:, 0]
    return total


# --------------------------------------------------------------------------
# VGG19 .features: 3x3 convs (pad 1) + ReLU, 2x2 max pools per layout
# --------------------------------------------------------------------------

VGG19_LAYOUT = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
                512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def random_vgg19_sd(seed: int = 0, num_convs: int = 5) -> dict:
    g = torch.Generator().manual_seed(seed)
    sd, idx, cin, conv_i = {}, 0, 3, 0
    for item in VGG19_LAYOUT:
        if item == "M":
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = (
            torch.randn((item, cin, 3, 3), generator=g) * 0.05)
        sd[f"features.{idx}.bias"] = torch.randn(item, generator=g) * 0.01
        cin = item
        idx += 2
        conv_i += 1
        if conv_i >= num_convs:
            break
    return sd


def vgg19_conv_taps_torch(sd: dict, x: torch.Tensor,
                          num_convs: int = 5) -> list[torch.Tensor]:
    """Pre-ReLU conv outputs conv_1..conv_N — the reference styleloss
    assembly inserts the loss modules directly after each Conv2d."""
    taps, idx, conv_i = [], 0, 0
    h = x
    for item in VGG19_LAYOUT:
        if item == "M":
            h = F.max_pool2d(h, 2, 2)
            idx += 1
            continue
        h = F.conv2d(h, sd[f"features.{idx}.weight"],
                     sd[f"features.{idx}.bias"], padding=1)
        taps.append(h)
        conv_i += 1
        idx += 2
        if conv_i >= num_convs:
            break
        h = F.relu(h)
    return taps


def gram_torch(feat: torch.Tensor) -> torch.Tensor:
    """Reference styleloss.py:49-60 gram (single image [1,C,H,W])."""
    a, b, c, d = feat.shape
    f = feat.view(a * b, c * d)
    return (f @ f.t()) / (a * b * c * d)


def style_content_loss_torch(sd: dict, image: torch.Tensor,
                             style_ref: torch.Tensor,
                             content_ref: torch.Tensor,
                             style_weight: float = 1e6,
                             content_weight: float = 1.0):
    """Per-image reference semantics (batch must be 1 per call, like the
    reference's per-image loop)."""
    ti = vgg19_conv_taps_torch(sd, image)
    ts = vgg19_conv_taps_torch(sd, style_ref)
    tc = vgg19_conv_taps_torch(sd, content_ref)
    style = sum(F.mse_loss(gram_torch(a), gram_torch(b))
                for a, b in zip(ti, ts))
    content = F.mse_loss(ti[3], tc[3])
    return style_weight * style, content_weight * content


# --------------------------------------------------------------------------
# ResNet-50 (torchvision v1.5: stride on the 3x3 conv2), eval-mode BN
# --------------------------------------------------------------------------

RESNET50_BLOCKS = (3, 4, 6, 3)


def random_resnet50_sd(seed: int = 0, num_classes: int = 1000) -> dict:
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def conv(name, cout, cin, k):
        sd[f"{name}.weight"] = torch.randn((cout, cin, k, k), generator=g) * 0.05

    def bn(name, c):
        sd[f"{name}.weight"] = torch.rand(c, generator=g) + 0.5
        sd[f"{name}.bias"] = torch.randn(c, generator=g) * 0.1
        sd[f"{name}.running_mean"] = torch.randn(c, generator=g) * 0.1
        sd[f"{name}.running_var"] = torch.rand(c, generator=g) + 0.5

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    width = 64
    for li, n_blocks in enumerate(RESNET50_BLOCKS, start=1):
        cout = width * 4
        for bi in range(n_blocks):
            base = f"layer{li}.{bi}"
            conv(f"{base}.conv1", width, cin, 1)
            bn(f"{base}.bn1", width)
            conv(f"{base}.conv2", width, width, 3)
            bn(f"{base}.bn2", width)
            conv(f"{base}.conv3", cout, width, 1)
            bn(f"{base}.bn3", cout)
            if bi == 0:
                conv(f"{base}.downsample.0", cout, cin, 1)
                bn(f"{base}.downsample.1", cout)
            cin = cout
        width *= 2
    sd["fc.weight"] = torch.randn((num_classes, cin), generator=g) * 0.02
    sd["fc.bias"] = torch.randn(num_classes, generator=g) * 0.01
    return sd


def _bn_torch(sd, name, x):
    return F.batch_norm(
        x, sd[f"{name}.running_mean"], sd[f"{name}.running_var"],
        sd[f"{name}.weight"], sd[f"{name}.bias"], training=False, eps=1e-5)


def resnet50_logits_torch(sd: dict, x: torch.Tensor) -> torch.Tensor:
    h = F.conv2d(x, sd["conv1.weight"], stride=2, padding=3)
    h = F.relu(_bn_torch(sd, "bn1", h))
    h = F.max_pool2d(h, 3, 2, padding=1)
    for li, n_blocks in enumerate(RESNET50_BLOCKS, start=1):
        for bi in range(n_blocks):
            base = f"layer{li}.{bi}"
            stride = 2 if (bi == 0 and li > 1) else 1
            idn = h
            o = F.relu(_bn_torch(sd, f"{base}.bn1",
                                 F.conv2d(h, sd[f"{base}.conv1.weight"])))
            o = F.relu(_bn_torch(sd, f"{base}.bn2",
                                 F.conv2d(o, sd[f"{base}.conv2.weight"],
                                          stride=stride, padding=1)))
            o = _bn_torch(sd, f"{base}.bn3",
                          F.conv2d(o, sd[f"{base}.conv3.weight"]))
            if f"{base}.downsample.0.weight" in sd:
                idn = _bn_torch(
                    sd, f"{base}.downsample.1",
                    F.conv2d(h, sd[f"{base}.downsample.0.weight"],
                             stride=stride))
            h = F.relu(o + idn)
    h = h.mean(dim=(2, 3))
    return h @ sd["fc.weight"].t() + sd["fc.bias"]


def to_numpy_sd(sd: dict) -> dict:
    return {k: v.numpy().astype(np.float32) for k, v in sd.items()}


def vit_cls_embed_torch(sd: dict, x: torch.Tensor, num_heads: int,
                        eps: float = 1e-6) -> torch.Tensor:
    """Independent timm-layout ViT forward (DreamSim backbone family):
    NCHW input [B, 3, S, S] already normalized -> CLS embedding [B, D]."""
    w = {k: torch.tensor(v) for k, v in sd.items()}
    D = w["cls_token"].shape[-1]
    x = F.conv2d(x, w["patch_embed.proj.weight"],
                 w["patch_embed.proj.bias"],
                 stride=w["patch_embed.proj.weight"].shape[-1])
    B = x.shape[0]
    x = x.flatten(2).transpose(1, 2)  # [B, S_patches, D]
    cls = w["cls_token"].reshape(1, 1, D).expand(B, -1, -1)
    x = torch.cat([cls, x], dim=1)
    T = x.shape[1]
    x = x + w["pos_embed"].reshape(-1, D)[:T]
    n_blocks = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("blocks."))
    for i in range(n_blocks):
        b = f"blocks.{i}."
        h = F.layer_norm(x, (D,), w[b + "norm1.weight"],
                         w[b + "norm1.bias"], eps)
        qkv = F.linear(h, w[b + "attn.qkv.weight"], w[b + "attn.qkv.bias"])
        q, k, v = qkv.chunk(3, dim=-1)

        def heads(z):
            return z.reshape(B, T, num_heads, -1).transpose(1, 2)

        attn = F.scaled_dot_product_attention(heads(q), heads(k), heads(v))
        attn = attn.transpose(1, 2).reshape(B, T, D)
        x = x + F.linear(attn, w[b + "attn.proj.weight"],
                         w[b + "attn.proj.bias"])
        h = F.layer_norm(x, (D,), w[b + "norm2.weight"],
                         w[b + "norm2.bias"], eps)
        x = x + F.linear(F.gelu(F.linear(h, w[b + "mlp.fc1.weight"],
                                         w[b + "mlp.fc1.bias"])),
                         w[b + "mlp.fc2.weight"], w[b + "mlp.fc2.bias"])
    x = F.layer_norm(x, (D,), w["norm.weight"], w["norm.bias"], eps)
    return x[:, 0]
