"""AutoencoderKL (SD VAE) in JAX, NHWC — decoder for the generation path
(latents -> pixels, 1/0.18215 scaling per ``evalscripts/debiasing_vl.py:146``),
encoder included for completeness.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from uce_tpu.models.layers import (
    conv2d,
    group_norm,
    group_norm_act,
    linear,
    silu,
)
from uce_tpu.models.unet import nest_state_dict
from uce_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    shift_factor: float = 0.0  # FLUX VAE: 0.1159

    @classmethod
    def from_hf(cls, cfg: Mapping) -> "VAEConfig":
        return cls(
            in_channels=cfg.get("in_channels", 3),
            out_channels=cfg.get("out_channels", 3),
            latent_channels=cfg.get("latent_channels", 4),
            block_out_channels=tuple(cfg["block_out_channels"]),
            layers_per_block=cfg.get("layers_per_block", 2),
            norm_num_groups=cfg.get("norm_num_groups", 32),
            scaling_factor=cfg.get("scaling_factor", 0.18215),
            shift_factor=cfg.get("shift_factor") or 0.0,
        )


SD_VAE_CONFIG = VAEConfig()


def _resnet(p, x, groups):
    h = group_norm_act(x, p["norm1"]["weight"], p["norm1"]["bias"], groups,
                       eps=1e-6, act="silu")
    h = conv2d(h, p["conv1"]["weight"], p["conv1"]["bias"])
    h = group_norm_act(h, p["norm2"]["weight"], p["norm2"]["bias"], groups,
                       eps=1e-6, act="silu")
    h = conv2d(h, p["conv2"]["weight"], p["conv2"]["bias"])
    if "conv_shortcut" in p:
        x = conv2d(x, p["conv_shortcut"]["weight"], p["conv_shortcut"]["bias"],
                   padding=0)
    return x + h


def _attn(p, x, groups):
    """Single-head VAE self-attention (qkv linear WITH bias)."""
    b, h, w, c = x.shape
    res = x
    y = group_norm(x, p["group_norm"]["weight"], p["group_norm"]["bias"],
                   groups, eps=1e-6).reshape(b, h * w, c)
    q = linear(y, p["to_q"]["weight"], p["to_q"]["bias"])[:, None]
    k = linear(y, p["to_k"]["weight"], p["to_k"]["bias"])[:, None]
    v = linear(y, p["to_v"]["weight"], p["to_v"]["bias"])[:, None]
    out = dot_product_attention(q, k, v, impl="auto")[:, 0]
    out = linear(out, p["to_out"]["0"]["weight"], p["to_out"]["0"]["bias"])
    return res + out.reshape(b, h, w, c)


def decode(params: dict, latents: jnp.ndarray, config: VAEConfig) -> jnp.ndarray:
    """latents [B,h,w,4] (already divided by scaling_factor) -> [B,H,W,3]
    in [-1, 1]."""
    cfg = config
    g = cfg.norm_num_groups
    x = conv2d(latents, params["post_quant_conv"]["weight"],
               params["post_quant_conv"]["bias"], padding=0)
    d = params["decoder"]
    x = conv2d(x, d["conv_in"]["weight"], d["conv_in"]["bias"])
    m = d["mid_block"]
    x = _resnet(m["resnets"]["0"], x, g)
    x = _attn(m["attentions"]["0"], x, g)
    x = _resnet(m["resnets"]["1"], x, g)
    n_up = len(cfg.block_out_channels)
    for bi in range(n_up):
        bp = d["up_blocks"][str(bi)]
        for li in range(cfg.layers_per_block + 1):
            x = _resnet(bp["resnets"][str(li)], x, g)
        if "upsamplers" in bp:
            b_, h_, w_, c_ = x.shape
            x = jax.image.resize(x, (b_, h_ * 2, w_ * 2, c_), method="nearest")
            x = conv2d(x, bp["upsamplers"]["0"]["conv"]["weight"],
                       bp["upsamplers"]["0"]["conv"]["bias"])
    x = group_norm(x, d["conv_norm_out"]["weight"], d["conv_norm_out"]["bias"],
                   g, eps=1e-6)
    x = conv2d(silu(x), d["conv_out"]["weight"], d["conv_out"]["bias"])
    return x


def encode_moments(params: dict, images: jnp.ndarray, config: VAEConfig):
    """images [B,H,W,3] in [-1,1] -> (mean, logvar) each [B,h,w,4]."""
    cfg = config
    g = cfg.norm_num_groups
    e = params["encoder"]
    x = conv2d(images, e["conv_in"]["weight"], e["conv_in"]["bias"])
    for bi in range(len(cfg.block_out_channels)):
        bp = e["down_blocks"][str(bi)]
        for li in range(cfg.layers_per_block):
            x = _resnet(bp["resnets"][str(li)], x, g)
        if "downsamplers" in bp:
            # diffusers encoder downsample: asymmetric pad then stride-2 conv
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = conv2d(x, bp["downsamplers"]["0"]["conv"]["weight"],
                       bp["downsamplers"]["0"]["conv"]["bias"],
                       stride=2, padding=0)
    m = e["mid_block"]
    x = _resnet(m["resnets"]["0"], x, g)
    x = _attn(m["attentions"]["0"], x, g)
    x = _resnet(m["resnets"]["1"], x, g)
    x = group_norm(x, e["conv_norm_out"]["weight"], e["conv_norm_out"]["bias"],
                   g, eps=1e-6)
    x = conv2d(silu(x), e["conv_out"]["weight"], e["conv_out"]["bias"])
    x = conv2d(x, params["quant_conv"]["weight"], params["quant_conv"]["bias"],
               padding=0)
    mean, logvar = jnp.split(x, 2, axis=-1)
    return mean, logvar


# ---------------------------------------------------------------------------
# init (tests / benches) — enumerates the diffusers key contract
# ---------------------------------------------------------------------------

def init_state_dict(config: VAEConfig, rng: np.random.Generator,
                    scale: float = 0.02) -> dict[str, np.ndarray]:
    cfg = config
    sd: dict[str, np.ndarray] = {}

    def conv(name, cin, cout, k=3):
        sd[name + ".weight"] = (rng.standard_normal((cout, cin, k, k)) * scale
                                ).astype(np.float32)
        sd[name + ".bias"] = np.zeros(cout, np.float32)

    def lin(name, cin, cout):
        sd[name + ".weight"] = (rng.standard_normal((cout, cin)) * scale
                                ).astype(np.float32)
        sd[name + ".bias"] = np.zeros(cout, np.float32)

    def norm(name, c):
        sd[name + ".weight"] = np.ones(c, np.float32)
        sd[name + ".bias"] = np.zeros(c, np.float32)

    def resnet(name, cin, cout):
        norm(name + ".norm1", cin)
        conv(name + ".conv1", cin, cout)
        norm(name + ".norm2", cout)
        conv(name + ".conv2", cout, cout)
        if cin != cout:
            conv(name + ".conv_shortcut", cin, cout, k=1)

    def attn(name, c):
        norm(name + ".group_norm", c)
        for p in ("to_q", "to_k", "to_v"):
            lin(f"{name}.{p}", c, c)
        lin(name + ".to_out.0", c, c)

    ch = cfg.block_out_channels
    lc = cfg.latent_channels

    # encoder
    conv("encoder.conv_in", cfg.in_channels, ch[0])
    cprev = ch[0]
    for bi, c in enumerate(ch):
        for li in range(cfg.layers_per_block):
            resnet(f"encoder.down_blocks.{bi}.resnets.{li}",
                   cprev if li == 0 else c, c)
        if bi < len(ch) - 1:
            conv(f"encoder.down_blocks.{bi}.downsamplers.0.conv", c, c)
        cprev = c
    resnet("encoder.mid_block.resnets.0", ch[-1], ch[-1])
    attn("encoder.mid_block.attentions.0", ch[-1])
    resnet("encoder.mid_block.resnets.1", ch[-1], ch[-1])
    norm("encoder.conv_norm_out", ch[-1])
    conv("encoder.conv_out", ch[-1], 2 * lc)
    conv("quant_conv", 2 * lc, 2 * lc, k=1)

    # decoder
    conv("post_quant_conv", lc, lc, k=1)
    conv("decoder.conv_in", lc, ch[-1])
    resnet("decoder.mid_block.resnets.0", ch[-1], ch[-1])
    attn("decoder.mid_block.attentions.0", ch[-1])
    resnet("decoder.mid_block.resnets.1", ch[-1], ch[-1])
    rev = list(reversed(ch))
    cprev = rev[0]
    for bi, c in enumerate(rev):
        for li in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{bi}.resnets.{li}",
                   cprev if li == 0 else c, c)
        if bi < len(rev) - 1:
            conv(f"decoder.up_blocks.{bi}.upsamplers.0.conv", c, c)
        cprev = c
    norm("decoder.conv_norm_out", ch[0])
    conv("decoder.conv_out", ch[0], cfg.out_channels)
    return sd


def init_params(config: VAEConfig, seed: int = 0) -> dict:
    return nest_state_dict(init_state_dict(config, np.random.default_rng(seed)))
