"""Vision backbones for the eval suite: AlexNet (LPIPS), VGG19 (style loss),
ResNet-50 (ImageNet classify). NHWC JAX implementations of the torchvision
architectures with loaders for torchvision-format state dicts (weights come
from a local file; this environment has no download path).
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from uce_tpu.models.layers import conv2d, conv_kernel, linear_weight

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _conv(x, p, stride=1, padding=1):
    return conv2d(x, p["weight"], p["bias"], stride=stride, padding=padding)


def max_pool(x, window=3, stride=2, padding=0):
    pads = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1), pads)


def _conv_p(sd, name):
    return {"weight": jnp.asarray(conv_kernel(np.asarray(sd[name + ".weight"]))),
            "bias": jnp.asarray(np.asarray(sd[name + ".bias"]))}


# ---------------------------------------------------------------------------
# AlexNet features (torchvision .features indices 0,3,6,8,10)
# ---------------------------------------------------------------------------

ALEXNET_CONV_IDX = (0, 3, 6, 8, 10)
ALEXNET_CHANNELS = (64, 192, 384, 256, 256)


def convert_alexnet(sd: Mapping) -> dict:
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    prefix = "features." if any(k.startswith("features.") for k in sd) else ""
    return {f"conv{i}": _conv_p(sd, f"{prefix}{idx}")
            for i, idx in enumerate(ALEXNET_CONV_IDX)}


def alexnet_features(params: dict, x: jnp.ndarray) -> list[jnp.ndarray]:
    """x [B,H,W,3] -> relu outputs of the 5 conv stages (LPIPS taps)."""
    taps = []
    h = jax.nn.relu(_conv(x, params["conv0"], stride=4, padding=2))
    taps.append(h)
    h = max_pool(h)
    h = jax.nn.relu(_conv(h, params["conv1"], padding=2))
    taps.append(h)
    h = max_pool(h)
    h = jax.nn.relu(_conv(h, params["conv2"]))
    taps.append(h)
    h = jax.nn.relu(_conv(h, params["conv3"]))
    taps.append(h)
    h = jax.nn.relu(_conv(h, params["conv4"]))
    taps.append(h)
    return taps


def init_alexnet(rng: np.random.Generator) -> dict:
    shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
              (256, 384, 3, 3), (256, 256, 3, 3)]
    out = {}
    for i, s in enumerate(shapes):
        out[f"conv{i}"] = {
            "weight": jnp.asarray(conv_kernel(
                (rng.standard_normal(s) * 0.05).astype(np.float32))),
            "bias": jnp.zeros(s[0]),
        }
    return out


# ---------------------------------------------------------------------------
# VGG19 features
# ---------------------------------------------------------------------------

VGG19_LAYOUT = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
                512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def convert_vgg19(sd: Mapping) -> dict:
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    prefix = "features." if any(k.startswith("features.") for k in sd) else ""
    params, idx, conv_i = {}, 0, 0
    for item in VGG19_LAYOUT:
        if item == "M":
            idx += 1
            continue
        if f"{prefix}{idx}.weight" not in sd:
            break  # truncated snapshot (style loss only needs conv_1..5)
        params[f"conv{conv_i}"] = _conv_p(sd, f"{prefix}{idx}")
        conv_i += 1
        idx += 2  # conv + relu
    return params


def vgg19_features(params: dict, x: jnp.ndarray,
                   num_convs: int | None = None) -> list[jnp.ndarray]:
    """Returns conv outputs (pre-ReLU, matching the reference's
    ``styleloss.py`` model assembly which inserts loss modules directly
    after each Conv2d) in sequential order conv_1, conv_2, ...."""
    taps, conv_i = [], 0
    h = x
    for item in VGG19_LAYOUT:
        if item == "M":
            h = max_pool(h, window=2, stride=2)
            continue
        h = _conv(h, params[f"conv{conv_i}"])
        taps.append(h)
        conv_i += 1
        if num_convs is not None and conv_i >= num_convs:
            break
        h = jax.nn.relu(h)
    return taps


def init_vgg19(rng: np.random.Generator, num_convs: int = 5) -> dict:
    params, cin, conv_i = {}, 3, 0
    for item in VGG19_LAYOUT:
        if item == "M":
            continue
        cout = item
        params[f"conv{conv_i}"] = {
            "weight": jnp.asarray(conv_kernel(
                (rng.standard_normal((cout, cin, 3, 3)) * 0.05)
                .astype(np.float32))),
            "bias": jnp.zeros(cout),
        }
        cin = cout
        conv_i += 1
        if conv_i >= num_convs:
            break
    return params


# ---------------------------------------------------------------------------
# ResNet-50
# ---------------------------------------------------------------------------

RESNET50_BLOCKS = (3, 4, 6, 3)


def convert_resnet50(sd: Mapping) -> dict:
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}

    def bn(name):
        return {
            "scale": jnp.asarray(sd[name + ".weight"]),
            "bias": jnp.asarray(sd[name + ".bias"]),
            "mean": jnp.asarray(sd[name + ".running_mean"]),
            "var": jnp.asarray(sd[name + ".running_var"]),
        }

    def conv(name):
        return jnp.asarray(conv_kernel(np.asarray(sd[name + ".weight"])))

    params = {"conv1": conv("conv1"), "bn1": bn("bn1")}
    for li, n_blocks in enumerate(RESNET50_BLOCKS, start=1):
        for bi in range(n_blocks):
            base = f"layer{li}.{bi}"
            block = {}
            for ci in (1, 2, 3):
                block[f"conv{ci}"] = conv(f"{base}.conv{ci}")
                block[f"bn{ci}"] = bn(f"{base}.bn{ci}")
            if f"{base}.downsample.0.weight" in sd:
                block["ds_conv"] = conv(f"{base}.downsample.0")
                block["ds_bn"] = bn(f"{base}.downsample.1")
            params[f"layer{li}_{bi}"] = block
    params["fc"] = {
        "weight": jnp.asarray(linear_weight(np.asarray(sd["fc.weight"]))),
        "bias": jnp.asarray(sd["fc.bias"]),
    }
    return params


def _bn(x, p, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def _bottleneck(p, x, stride):
    h = jax.nn.relu(_bn(conv2d(x, p["conv1"], padding=0), p["bn1"]))
    h = jax.nn.relu(_bn(conv2d(h, p["conv2"], stride=stride, padding=1),
                        p["bn2"]))
    h = _bn(conv2d(h, p["conv3"], padding=0), p["bn3"])
    if "ds_conv" in p:
        x = _bn(conv2d(x, p["ds_conv"], stride=stride, padding=0), p["ds_bn"])
    return jax.nn.relu(x + h)


def resnet50_logits(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x [B,H,W,3] (ImageNet-normalized) -> logits [B, 1000]."""
    h = conv2d(x, params["conv1"], stride=2, padding=3)
    h = jax.nn.relu(_bn(h, params["bn1"]))
    h = max_pool(h, window=3, stride=2, padding=1)
    for li, n_blocks in enumerate(RESNET50_BLOCKS, start=1):
        for bi in range(n_blocks):
            stride = 2 if (bi == 0 and li > 1) else 1
            h = _bottleneck(params[f"layer{li}_{bi}"], h, stride)
    h = h.mean(axis=(1, 2))
    return h @ params["fc"]["weight"] + params["fc"]["bias"]


def preprocess_imagenet(images: np.ndarray, size: int = 224) -> jnp.ndarray:
    """uint8 [B,H,W,3] -> normalized float (resize 256 + center crop 224)."""
    x = jnp.asarray(images, jnp.float32) / 255.0
    b, h, w, _ = x.shape
    short = min(h, w)
    scale = 256 / short if size == 224 else size / short
    nh, nw = int(round(h * scale)), int(round(w * scale))
    x = jax.image.resize(x, (b, nh, nw, 3), method="bilinear")
    top, left = (nh - size) // 2, (nw - size) // 2
    x = x[:, top:top + size, left:left + size]
    return (x - IMAGENET_MEAN) / IMAGENET_STD


# ---------------------------------------------------------------------------
# Generic pre-norm ViT (timm layout) — the DreamSim backbone family
# (DINO/CLIP/OpenCLIP ViT-B are all this architecture; DreamSim's LoRA
# deltas are merged into the dense weights at conversion time —
# tools/convert_dreamsim.py). Reference metric: evalscripts/dreamsim_eval.py
# ---------------------------------------------------------------------------

def convert_vit_timm(sd: Mapping, num_blocks: int | None = None) -> dict:
    """timm VisionTransformer state dict -> layer-stacked JAX params.

    Expected keys: patch_embed.proj.{weight,bias} (OIHW conv),
    cls_token, pos_embed, blocks.{i}.norm1/attn.qkv/attn.proj/norm2/
    mlp.fc1/mlp.fc2, norm.{weight,bias}; optional head/proj is ignored
    (DreamSim uses the CLS embedding, not a classification head).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if num_blocks is None:
        num_blocks = 1 + max(int(k.split(".")[1]) for k in sd
                             if k.startswith("blocks."))

    def stack(tmpl, transpose=False):
        ws = [sd[tmpl.format(i)] for i in range(num_blocks)]
        w = np.stack(ws)
        return np.swapaxes(w, -1, -2) if transpose else w

    blocks = {
        "ln1_scale": stack("blocks.{}.norm1.weight"),
        "ln1_bias": stack("blocks.{}.norm1.bias"),
        "qkv_w": stack("blocks.{}.attn.qkv.weight", transpose=True),
        "qkv_b": stack("blocks.{}.attn.qkv.bias"),
        "o_w": stack("blocks.{}.attn.proj.weight", transpose=True),
        "o_b": stack("blocks.{}.attn.proj.bias"),
        "ln2_scale": stack("blocks.{}.norm2.weight"),
        "ln2_bias": stack("blocks.{}.norm2.bias"),
        "fc1_w": stack("blocks.{}.mlp.fc1.weight", transpose=True),
        "fc1_b": stack("blocks.{}.mlp.fc1.bias"),
        "fc2_w": stack("blocks.{}.mlp.fc2.weight", transpose=True),
        "fc2_b": stack("blocks.{}.mlp.fc2.bias"),
    }
    return jax.tree_util.tree_map(jnp.asarray, {
        "patch_kernel": np.transpose(sd["patch_embed.proj.weight"],
                                     (2, 3, 1, 0)),  # OIHW -> HWIO
        "patch_bias": sd["patch_embed.proj.bias"],
        "cls_token": sd["cls_token"].reshape(1, 1, -1),
        "pos_embed": sd["pos_embed"].reshape(
            sd["pos_embed"].shape[-2], sd["pos_embed"].shape[-1]),
        "blocks": blocks,
        "ln_scale": sd["norm.weight"],
        "ln_bias": sd["norm.bias"],
    })


def vit_cls_embed(params: dict, pixels: jnp.ndarray, num_heads: int,
                  eps: float = 1e-6) -> jnp.ndarray:
    """pixels [B, S, S, 3] (already model-normalized) -> CLS embedding
    [B, D] after the final norm (timm forward_features CLS slot)."""
    from uce_tpu.ops.attention import dot_product_attention

    p = params
    D = p["cls_token"].shape[-1]
    ps = p["patch_kernel"].shape[0]
    x = jax.lax.conv_general_dilated(
        pixels, p["patch_kernel"], window_strides=(ps, ps),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    B = x.shape[0]
    x = x.reshape(B, -1, D) + p["patch_bias"]
    cls = jnp.broadcast_to(p["cls_token"], (B, 1, D))
    x = jnp.concatenate([cls, x], axis=1)
    T = x.shape[1]
    x = x + p["pos_embed"][:T]

    def _ln(v, scale, bias):
        v32 = v.astype(jnp.float32)
        mu = v32.mean(-1, keepdims=True)
        var = v32.var(-1, keepdims=True)
        return ((v32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias
                ).astype(v.dtype)

    Dh = D // num_heads

    def block(x, bp):
        h = _ln(x, bp["ln1_scale"], bp["ln1_bias"])
        qkv = h @ bp["qkv_w"] + bp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):
            return z.reshape(B, T, num_heads, Dh).transpose(0, 2, 1, 3)

        attn = dot_product_attention(heads(q), heads(k), heads(v))
        attn = attn.transpose(0, 2, 1, 3).reshape(B, T, D)
        x = x + attn @ bp["o_w"] + bp["o_b"]
        h = _ln(x, bp["ln2_scale"], bp["ln2_bias"])
        x = x + jax.nn.gelu(h @ bp["fc1_w"] + bp["fc1_b"],
                            approximate=False) @ bp["fc2_w"] + bp["fc2_b"]
        return x, None

    x, _ = jax.lax.scan(block, x, p["blocks"])
    x = _ln(x, p["ln_scale"], p["ln_bias"])
    return x[:, 0]


def init_vit_timm(rng: np.random.Generator, depth: int = 2, dim: int = 32,
                  heads: int = 2, patch: int = 8, image: int = 32,
                  mlp_ratio: int = 4) -> dict[str, np.ndarray]:
    """Random flat timm-format ViT state dict (tests/benches)."""
    n = lambda *s: (rng.standard_normal(s) * 0.05).astype(np.float32)
    n_pos = (image // patch) ** 2 + 1
    sd = {
        "patch_embed.proj.weight": n(dim, 3, patch, patch),
        "patch_embed.proj.bias": np.zeros(dim, np.float32),
        "cls_token": n(1, 1, dim),
        "pos_embed": n(1, n_pos, dim),
        "norm.weight": np.ones(dim, np.float32),
        "norm.bias": np.zeros(dim, np.float32),
    }
    for i in range(depth):
        b = f"blocks.{i}."
        for ln in ("norm1", "norm2"):
            sd[b + ln + ".weight"] = np.ones(dim, np.float32)
            sd[b + ln + ".bias"] = np.zeros(dim, np.float32)
        sd[b + "attn.qkv.weight"] = n(3 * dim, dim)
        sd[b + "attn.qkv.bias"] = np.zeros(3 * dim, np.float32)
        sd[b + "attn.proj.weight"] = n(dim, dim)
        sd[b + "attn.proj.bias"] = np.zeros(dim, np.float32)
        sd[b + "mlp.fc1.weight"] = n(mlp_ratio * dim, dim)
        sd[b + "mlp.fc1.bias"] = np.zeros(mlp_ratio * dim, np.float32)
        sd[b + "mlp.fc2.weight"] = n(dim, mlp_ratio * dim)
        sd[b + "mlp.fc2.bias"] = np.zeros(dim, np.float32)
    return sd
