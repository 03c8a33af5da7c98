"""Independent torch NCHW implementation of the SD UNet architecture.

Written as a cross-check oracle for ``uce_tpu/models/unet.py``: same
architecture spec (diffusers UNet2DConditionModel), different framework,
different memory layout (NCHW vs NHWC), different control flow (eager
module loop vs scans). Loads the SAME flat diffusers-format state dict, so
layout-conversion or block-wiring mistakes in either implementation show
up as output mismatches. Test-only; torch never appears in the compute
path of the framework itself.
"""

import math

import torch
import torch.nn.functional as F


def _t(sd, key):
    return torch.tensor(sd[key])


def timestep_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float64)
                      / half)
    args = t.double()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1).float()


def group_norm(x, sd, pre, groups):
    return F.group_norm(x, groups, _t(sd, pre + ".weight"),
                        _t(sd, pre + ".bias"), eps=1e-5)


def layer_norm(x, sd, pre):
    return F.layer_norm(x, (x.shape[-1],), _t(sd, pre + ".weight"),
                        _t(sd, pre + ".bias"), eps=1e-5)


def conv(x, sd, pre, stride=1, padding=1):
    return F.conv2d(x, _t(sd, pre + ".weight"), _t(sd, pre + ".bias"),
                    stride=stride, padding=padding)


def linear(x, sd, pre, bias=True):
    return F.linear(x, _t(sd, pre + ".weight"),
                    _t(sd, pre + ".bias") if bias else None)


def resnet(x, emb, sd, pre, groups):
    h = conv(F.silu(group_norm(x, sd, pre + ".norm1", groups)), sd, pre + ".conv1")
    h = h + linear(F.silu(emb), sd, pre + ".time_emb_proj")[:, :, None, None]
    h = conv(F.silu(group_norm(h, sd, pre + ".norm2", groups)), sd, pre + ".conv2")
    if pre + ".conv_shortcut.weight" in sd:
        x = conv(x, sd, pre + ".conv_shortcut", padding=0)
    return x + h


def attention(x, ctx, sd, pre, heads):
    q = linear(x, sd, pre + ".to_q", bias=False)
    k = linear(ctx, sd, pre + ".to_k", bias=False)
    v = linear(ctx, sd, pre + ".to_v", bias=False)
    b, tq, d = q.shape
    dh = d // heads

    def split(z):
        return z.reshape(b, -1, heads, dh).transpose(1, 2)

    out = F.scaled_dot_product_attention(split(q), split(k), split(v))
    out = out.transpose(1, 2).reshape(b, tq, d)
    return linear(out, sd, pre + ".to_out.0")


def tx_block(x, ctx, sd, pre, heads):
    h1 = layer_norm(x, sd, pre + ".norm1")
    x = x + attention(h1, h1, sd, pre + ".attn1", heads)
    x = x + attention(layer_norm(x, sd, pre + ".norm2"), ctx, sd,
                      pre + ".attn2", heads)
    h = layer_norm(x, sd, pre + ".norm3")
    h = linear(h, sd, pre + ".ff.net.0.proj")
    a, gate = h.chunk(2, dim=-1)
    return x + linear(a * F.gelu(gate), sd, pre + ".ff.net.2")


def spatial_transformer(x, ctx, sd, pre, heads, groups, use_linear, depth):
    b, c, h, w = x.shape
    res = x
    x = F.group_norm(x, groups, _t(sd, pre + ".norm.weight"),
                     _t(sd, pre + ".norm.bias"), eps=1e-6)
    if use_linear:
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        x = linear(x, sd, pre + ".proj_in")
    else:
        x = conv(x, sd, pre + ".proj_in", padding=0)
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
    for d_i in range(depth):
        x = tx_block(x, ctx, sd, f"{pre}.transformer_blocks.{d_i}", heads)
    if use_linear:
        x = linear(x, sd, pre + ".proj_out")
        x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
    else:
        x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        x = conv(x, sd, pre + ".proj_out", padding=0)
    return x + res


@torch.no_grad()
def unet_forward(sd, sample, t, ctx, config, added_cond=None):
    """sample NCHW, t [B], ctx [B, T, D]. config: the uce_tpu UNetConfig.

    added_cond (SDXL 'text_time'): dict with torch tensors
    ``text_embeds`` [B, P] and ``time_ids`` [B, 6] — diffusers
    UNet2DConditionModel aug_emb path (add_time_proj of flattened
    time_ids, concat with text_embeds, 2-layer MLP, added to emb).
    """
    cfg = config
    groups = cfg.norm_num_groups
    temb = timestep_embedding(t, cfg.block_out_channels[0])
    emb = linear(temb, sd, "time_embedding.linear_1")
    emb = linear(F.silu(emb), sd, "time_embedding.linear_2")
    if cfg.addition_embed_type == "text_time":
        tid = timestep_embedding(added_cond["time_ids"].reshape(-1),
                                 cfg.addition_time_embed_dim)
        tid = tid.reshape(added_cond["time_ids"].shape[0], -1)
        add = torch.cat([added_cond["text_embeds"], tid], dim=-1)
        add = linear(add, sd, "add_embedding.linear_1")
        add = linear(F.silu(add), sd, "add_embedding.linear_2")
        emb = emb + add

    x = conv(sample, sd, "conv_in")
    stack = [x]
    for bi, btype in enumerate(cfg.down_block_types):
        has_attn = btype == "CrossAttnDownBlock2D"
        for li in range(cfg.layers_per_block):
            x = resnet(x, emb, sd, f"down_blocks.{bi}.resnets.{li}", groups)
            if has_attn:
                x = spatial_transformer(
                    x, ctx, sd, f"down_blocks.{bi}.attentions.{li}",
                    cfg.heads(bi), groups, cfg.use_linear_projection,
                    cfg.tx_layers(bi))
            stack.append(x)
        if bi < len(cfg.down_block_types) - 1:
            x = conv(x, sd, f"down_blocks.{bi}.downsamplers.0.conv", stride=2)
            stack.append(x)

    x = resnet(x, emb, sd, "mid_block.resnets.0", groups)
    x = spatial_transformer(
        x, ctx, sd, "mid_block.attentions.0",
        cfg.heads(len(cfg.block_out_channels) - 1), groups,
        cfg.use_linear_projection,
        cfg.tx_layers(len(cfg.block_out_channels) - 1))
    x = resnet(x, emb, sd, "mid_block.resnets.1", groups)

    n = len(cfg.up_block_types)
    for bi, btype in enumerate(cfg.up_block_types):
        has_attn = btype == "CrossAttnUpBlock2D"
        rev = n - 1 - bi
        for li in range(cfg.layers_per_block + 1):
            x = torch.cat([x, stack.pop()], dim=1)
            x = resnet(x, emb, sd, f"up_blocks.{bi}.resnets.{li}", groups)
            if has_attn:
                x = spatial_transformer(
                    x, ctx, sd, f"up_blocks.{bi}.attentions.{li}",
                    cfg.heads(rev), groups, cfg.use_linear_projection,
                    cfg.tx_layers(rev))
        if bi < n - 1:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = conv(x, sd, f"up_blocks.{bi}.upsamplers.0.conv")
    x = group_norm(x, sd, "conv_norm_out", groups)
    return conv(F.silu(x), sd, "conv_out")


# ---------------------------------------------------------------------------
# VAE decoder mirror (AutoencoderKL decode path)
# ---------------------------------------------------------------------------

def _vae_resnet(x, sd, pre, groups):
    h = F.group_norm(x, groups, _t(sd, pre + ".norm1.weight"),
                     _t(sd, pre + ".norm1.bias"), eps=1e-6)
    h = conv(F.silu(h), sd, pre + ".conv1")
    h = F.group_norm(h, groups, _t(sd, pre + ".norm2.weight"),
                     _t(sd, pre + ".norm2.bias"), eps=1e-6)
    h = conv(F.silu(h), sd, pre + ".conv2")
    if pre + ".conv_shortcut.weight" in sd:
        x = conv(x, sd, pre + ".conv_shortcut", padding=0)
    return x + h


def _vae_attn(x, sd, pre, groups):
    b, c, h, w = x.shape
    res = x
    y = F.group_norm(x, groups, _t(sd, pre + ".group_norm.weight"),
                     _t(sd, pre + ".group_norm.bias"), eps=1e-6)
    y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
    q = linear(y, sd, pre + ".to_q")
    k = linear(y, sd, pre + ".to_k")
    v = linear(y, sd, pre + ".to_v")
    out = F.scaled_dot_product_attention(q[:, None], k[:, None], v[:, None])[:, 0]
    out = linear(out, sd, pre + ".to_out.0")
    return res + out.reshape(b, h, w, c).permute(0, 3, 1, 2)


@torch.no_grad()
def vae_decode(sd, latents, config):
    """latents NCHW (already unscaled) -> image NCHW in [-1, 1]."""
    cfg = config
    g = cfg.norm_num_groups
    x = conv(latents, sd, "post_quant_conv", padding=0)
    x = conv(x, sd, "decoder.conv_in")
    x = _vae_resnet(x, sd, "decoder.mid_block.resnets.0", g)
    x = _vae_attn(x, sd, "decoder.mid_block.attentions.0", g)
    x = _vae_resnet(x, sd, "decoder.mid_block.resnets.1", g)
    n = len(cfg.block_out_channels)
    for bi in range(n):
        for li in range(cfg.layers_per_block + 1):
            x = _vae_resnet(x, sd, f"decoder.up_blocks.{bi}.resnets.{li}", g)
        if bi < n - 1:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = conv(x, sd, f"decoder.up_blocks.{bi}.upsamplers.0.conv")
    x = F.group_norm(x, g, _t(sd, "decoder.conv_norm_out.weight"),
                     _t(sd, "decoder.conv_norm_out.bias"), eps=1e-6)
    return conv(F.silu(x), sd, "decoder.conv_out")
