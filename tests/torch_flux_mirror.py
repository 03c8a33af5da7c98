"""Independent torch implementation of the FLUX DiT spec (test-only).

Cross-check oracle for ``uce_tpu/models/flux.py``: eager module-by-module
torch against the JAX layer-stacked scans, sharing one flat diffusers-format
state dict. Catches stacking, AdaLN-chunk, RoPE and stream-ordering bugs.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F


def _t(sd, key):
    return torch.tensor(sd[key])


def linear(x, sd, pre):
    return F.linear(x, _t(sd, pre + ".weight"), _t(sd, pre + ".bias"))


def ln(x):
    return F.layer_norm(x, (x.shape[-1],), eps=1e-6)


def rms(x, sd, key, eps=1e-6):
    w = _t(sd, key)
    var = x.float().pow(2).mean(-1, keepdim=True)
    return (x.float() * torch.rsqrt(var + eps)).to(x.dtype) * w


def timestep_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0)
                      * torch.arange(half, dtype=torch.float64) / half)
    args = t.double()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], -1).float()


def mlp_embed(v, sd, pre):
    h = linear(v, sd, pre + ".linear_1")
    return linear(F.silu(h), sd, pre + ".linear_2")


def rope_cos_sin(ids, axes_dims, theta=10000.0):
    cos_parts, sin_parts = [], []
    for axis, dim in enumerate(axes_dims):
        freqs = 1.0 / (theta ** (np.arange(0, dim, 2) / dim))
        angles = np.asarray(ids)[:, axis:axis + 1] * freqs
        cos_parts.append(np.repeat(np.cos(angles), 2, -1))
        sin_parts.append(np.repeat(np.sin(angles), 2, -1))
    return (torch.tensor(np.concatenate(cos_parts, -1), dtype=torch.float32),
            torch.tensor(np.concatenate(sin_parts, -1), dtype=torch.float32))


def apply_rope(x, cos, sin):
    xr = x.float().reshape(*x.shape[:-1], -1, 2)
    rot = torch.stack([-xr[..., 1], xr[..., 0]], -1).reshape(x.shape)
    return x.float() * cos + rot * sin


def attention(q, k, v):
    return F.scaled_dot_product_attention(q, k, v)


def heads(x, h):
    b, s, d = x.shape
    return x.reshape(b, s, h, d // h).transpose(1, 2)


def unheads(x):
    b, h, s, dh = x.shape
    return x.transpose(1, 2).reshape(b, s, h * dh)


@torch.no_grad()
def flux_forward(sd, latents, t5, pooled, timestep, img_ids, txt_ids, config,
                 guidance=None):
    cfg = config
    H = cfg.num_attention_heads
    x = linear(latents, sd, "x_embedder")
    enc = linear(t5, sd, "context_embedder")

    temb = mlp_embed(timestep_embedding(timestep * 1000.0, 256), sd,
                     "time_text_embed.timestep_embedder")
    if cfg.guidance_embeds:
        temb = temb + mlp_embed(
            timestep_embedding(guidance * 1000.0, 256), sd,
            "time_text_embed.guidance_embedder")
    temb = temb + mlp_embed(pooled, sd, "time_text_embed.text_embedder")
    temb_act = F.silu(temb)

    s_txt = t5.shape[1]
    ids = np.concatenate([np.asarray(txt_ids), np.asarray(img_ids)], 0)
    cos, sin = rope_cos_sin(ids, cfg.axes_dims_rope)

    def chunks(pre, n):
        return linear(temb_act, sd, pre + ".linear").chunk(n, -1)

    for i in range(cfg.num_layers):
        p = f"transformer_blocks.{i}"
        sh_m, sc_m, g_m, sh_f, sc_f, g_f = [c[:, None] for c in
                                            chunks(p + ".norm1", 6)]
        csh_m, csc_m, cg_m, csh_f, csc_f, cg_f = [
            c[:, None] for c in chunks(p + ".norm1_context", 6)]
        hx = ln(x) * (1 + sc_m) + sh_m
        he = ln(enc) * (1 + csc_m) + csh_m
        q = rms(heads(linear(hx, sd, p + ".attn.to_q"), H), sd,
                p + ".attn.norm_q.weight")
        k = rms(heads(linear(hx, sd, p + ".attn.to_k"), H), sd,
                p + ".attn.norm_k.weight")
        v = heads(linear(hx, sd, p + ".attn.to_v"), H)
        eq = rms(heads(linear(he, sd, p + ".attn.add_q_proj"), H), sd,
                 p + ".attn.norm_added_q.weight")
        ek = rms(heads(linear(he, sd, p + ".attn.add_k_proj"), H), sd,
                 p + ".attn.norm_added_k.weight")
        ev = heads(linear(he, sd, p + ".attn.add_v_proj"), H)
        q = torch.cat([eq, q], 2)
        k = torch.cat([ek, k], 2)
        v = torch.cat([ev, v], 2)
        q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        out = unheads(attention(q, k, v))
        enc_out, x_out = out[:, :s_txt], out[:, s_txt:]
        x = x + g_m * linear(x_out, sd, p + ".attn.to_out.0")
        enc = enc + cg_m * linear(enc_out, sd, p + ".attn.to_add_out")
        hx = ln(x) * (1 + sc_f) + sh_f
        x = x + g_f * linear(F.gelu(linear(hx, sd, p + ".ff.net.0.proj"),
                                    approximate="tanh"),
                             sd, p + ".ff.net.2")
        he = ln(enc) * (1 + csc_f) + csh_f
        enc = enc + cg_f * linear(
            F.gelu(linear(he, sd, p + ".ff_context.net.0.proj"),
                   approximate="tanh"),
            sd, p + ".ff_context.net.2")

    h_all = torch.cat([enc, x], 1)
    for i in range(cfg.num_single_layers):
        p = f"single_transformer_blocks.{i}"
        sh, sc, gate = [c[:, None] for c in chunks(p + ".norm", 3)]
        hn = ln(h_all) * (1 + sc) + sh
        q = rms(heads(linear(hn, sd, p + ".attn.to_q"), H), sd,
                p + ".attn.norm_q.weight")
        k = rms(heads(linear(hn, sd, p + ".attn.to_k"), H), sd,
                p + ".attn.norm_k.weight")
        v = heads(linear(hn, sd, p + ".attn.to_v"), H)
        q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        attn = unheads(attention(q, k, v))
        mlp = F.gelu(linear(hn, sd, p + ".proj_mlp"), approximate="tanh")
        h_all = h_all + gate * linear(torch.cat([attn, mlp], -1), sd,
                                      p + ".proj_out")
    x = h_all[:, s_txt:]
    cond = linear(temb_act, sd, "norm_out.linear")
    scale, shift = cond.chunk(2, -1)
    x = ln(x) * (1 + scale[:, None]) + shift[:, None]
    return linear(x, sd, "proj_out")
