"""Independent torch implementation of the HiDream-I1 MoE DiT (test-only).

Cross-check oracle for ``uce_tpu/models/hidream.py`` (VERDICT r3 ask #3):
eager module-by-module torch — with a SPARSE per-expert routing loop,
unlike the JAX dense-MoE einsum — against the JAX layer-stacked scans,
sharing one flat diffusers-format state dict
(``hidream.init_state_dict`` keys, the documented converter contract;
reference family anchor: ``trainscripts/uce_hidream_edit.py:16-64``).
Catches stacking, adaLN-chunk, rope-id layout, text-carry plumbing and
MoE-gating bugs. ``denoise_pipeline`` additionally mirrors the pipeline's
flow-euler CFG loop + FLUX-style VAE decode for a pipeline-level uint8
check (tests/test_hidream_cross_impl.py).
"""

import numpy as np
import torch
import torch.nn.functional as F

from tests.torch_flux_mirror import (
    apply_rope,
    attention,
    heads,
    linear,
    ln,
    mlp_embed,
    rope_cos_sin,
    timestep_embedding,
    unheads,
)


def _t(sd, key):
    return torch.tensor(sd[key])


def rms_full(x, sd, key, eps=1e-5):
    """HiDream's RMSNorm: FULL projected dim, before the head split."""
    w = _t(sd, key)
    var = x.float().pow(2).mean(-1, keepdim=True)
    return ((x.float() * torch.rsqrt(var + eps)) * w).to(x.dtype)


def swiglu(x, sd, pre):
    w1 = F.linear(x, _t(sd, pre + ".w1.weight"))
    w3 = F.linear(x, _t(sd, pre + ".w3.weight"))
    return F.linear(F.silu(w1) * w3, _t(sd, pre + ".w2.weight"))


def moe(x, sd, pre, config):
    """Sparse routed MoE: per-expert token gather (deliberately NOT the
    JAX path's dense every-expert einsum), top-k softmax gate with
    norm_topk_prob=False, plus the shared expert."""
    if config.num_routed_experts == 0:
        return swiglu(x, sd, pre)
    logits = x.float() @ _t(sd, pre + ".gate.weight").T.float()
    scores = torch.softmax(logits, dim=-1)  # [B, S, E]
    topv, topi = torch.topk(scores, config.num_activated_experts, dim=-1)
    y = torch.zeros_like(x)
    for e in range(config.num_routed_experts):
        sel = topi == e  # [B, S, k]
        weight = (topv * sel).sum(-1)  # [B, S]
        mask = sel.any(-1)
        if not mask.any():
            continue
        xe = x[mask]  # [N, D] gathered tokens
        out = swiglu(xe, sd, f"{pre}.experts.{e}")
        y[mask] += weight[mask, None].to(x.dtype) * out
    return y + swiglu(x, sd, pre + ".shared_experts")


def _qkv(x, sd, pre, H, suffix=""):
    q = rms_full(F.linear(x, _t(sd, f"{pre}.to_q{suffix}.weight"),
                          _t(sd, f"{pre}.to_q{suffix}.bias")),
                 sd, f"{pre}.q_rms_norm{suffix}.weight")
    k = rms_full(F.linear(x, _t(sd, f"{pre}.to_k{suffix}.weight"),
                          _t(sd, f"{pre}.to_k{suffix}.bias")),
                 sd, f"{pre}.k_rms_norm{suffix}.weight")
    v = F.linear(x, _t(sd, f"{pre}.to_v{suffix}.weight"),
                 _t(sd, f"{pre}.to_v{suffix}.bias"))
    return heads(q, H), heads(k, H), heads(v, H)


def _block_prefix(sd, family):
    probe = f"{family}.0.block.adaLN_modulation.1.weight"
    return (f"{family}.{{}}.block" if probe in sd else f"{family}.{{}}")


@torch.no_grad()
def hidream_forward(sd, x_packed, t5, llama, pooled, timesteps, img_ids,
                    config):
    """x_packed [B, S_img, C*p^2], t5 [B, S_t5, d_t5],
    llama [n_blocks, B, S_ll, d_ll], pooled [B, text_emb_dim],
    timesteps [B] in 0..1000 -> un-negated flow prediction."""
    cfg = config
    H = cfg.num_attention_heads
    x = linear(x_packed, sd, "x_embedder.proj")
    temb = mlp_embed(timestep_embedding(timesteps.float(), 256), sd,
                     "t_embedder.timestep_embedder")
    temb = temb + mlp_embed(pooled, sd, "p_embedder.pooled_embedder")
    temb_act = F.silu(temb)

    n_cp = cfg.num_layers + cfg.num_single_layers + 1
    llama_proj = [
        F.linear(llama[i], _t(sd, f"caption_projection.{i}.linear.weight"))
        for i in range(n_cp - 1)
    ]
    t5_proj = F.linear(t5, _t(sd, f"caption_projection.{n_cp - 1}"
                                  ".linear.weight"))

    s_img = x_packed.shape[1]
    s_t5, s_ll = t5.shape[1], llama.shape[2]
    ids = np.concatenate(
        [np.asarray(img_ids), np.zeros((s_t5 + 2 * s_ll, 3))], axis=0)
    cos, sin = rope_cos_sin(ids, cfg.axes_dims_rope)

    carry = torch.cat([t5_proj, llama_proj[-1]], dim=1)
    s_carry = s_t5 + s_ll

    def chunks(pre, n):
        return [c[:, None] for c in
                linear(temb_act, sd, pre + ".adaLN_modulation.1").chunk(n, -1)]

    db = _block_prefix(sd, "double_stream_blocks")
    for i in range(cfg.num_layers):
        p = db.format(i)
        txt = torch.cat([carry, llama_proj[i]], dim=1)
        (sh_mi, sc_mi, g_mi, sh_fi, sc_fi, g_fi,
         sh_mt, sc_mt, g_mt, sh_ft, sc_ft, g_ft) = chunks(p, 12)
        ni = ln(x) * (1 + sc_mi) + sh_mi
        nt = ln(txt) * (1 + sc_mt) + sh_mt
        a = p + ".attn1"
        qi, ki, vi = _qkv(ni, sd, a, H)
        qt, kt, vt = _qkv(nt, sd, a, H, "_t")
        q = torch.cat([qi, qt], dim=2)
        k = torch.cat([ki, kt], dim=2)
        v = torch.cat([vi, vt], dim=2)
        q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        out = unheads(attention(q, k, v.float()))
        out_i, out_t = out[:, :s_img], out[:, s_img:]
        x = x + g_mi * linear(out_i, sd, a + ".to_out")
        txt = txt + g_mt * linear(out_t, sd, a + ".to_out_t")
        ni = ln(x) * (1 + sc_fi) + sh_fi
        nt = ln(txt) * (1 + sc_ft) + sh_ft
        x = x + g_fi * moe(ni, sd, p + ".ff_i", cfg)
        txt = txt + g_ft * swiglu(nt, sd, p + ".ff_t")
        carry = txt[:, :s_carry]

    h = torch.cat([x, carry], dim=1)
    s_all = s_img + s_carry
    sb = _block_prefix(sd, "single_stream_blocks")
    for j in range(cfg.num_single_layers):
        p = sb.format(j)
        hc = torch.cat([h, llama_proj[cfg.num_layers + j]], dim=1)
        sh_m, sc_m, g_m, sh_f, sc_f, g_f = chunks(p, 6)
        hn = ln(hc) * (1 + sc_m) + sh_m
        a = p + ".attn1"
        q, k, v = _qkv(hn, sd, a, H)
        q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        out = unheads(attention(q, k, v.float()))
        hc = hc + g_m * linear(out, sd, a + ".to_out")
        hn = ln(hc) * (1 + sc_f) + sh_f
        hc = hc + g_f * moe(hn, sd, p + ".ff_i", cfg)
        h = hc[:, :s_all]

    x = h[:, :s_img]
    cond = linear(temb_act, sd, "final_layer.adaLN_modulation.1")
    shift, scale = cond.chunk(2, -1)
    x = ln(x) * (1 + scale[:, None]) + shift[:, None]
    return linear(x, sd, "final_layer.linear")


# ---------------------------------------------------------------- pipeline
def flow_sigmas(num_steps, shift=3.0, num_train=1000):
    """FlowMatchEulerDiscreteScheduler tables (static shift)."""
    sigmas = np.linspace(1.0, 1.0 / num_steps, num_steps, dtype=np.float64)
    sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    timesteps = sigmas * num_train
    return np.concatenate([sigmas, [0.0]]), timesteps


def pack_latents(lat):
    """[B, h, w, C] -> [B, (h/2)(w/2), 4C] (2x2 patches, pixel-major)."""
    b, h, w, c = lat.shape
    x = lat.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // 2) * (w // 2), 4 * c)


def unpack_latents(packed, h, w):
    b, s, c4 = packed.shape
    c = c4 // 4
    x = packed.reshape(b, h // 2, w // 2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@torch.no_grad()
def denoise_pipeline(tr_sd, tr_cfg, vae_sd, vae_cfg, latents_nhwc, t5, llama,
                     pooled, num_steps, guidance_scale, img_ids,
                     sched_shift=3.0):
    """Mirror of HiDreamPipeline.generate_from_embeddings from latents on:
    flow-euler loop (v = -pred, CFG over [uncond; cond] rows), unpack,
    VAE shift/scale, NCHW decode, uint8. Returns [B, H, W, 3] uint8."""
    from tests.torch_unet_mirror import vae_decode

    lh, lw = latents_nhwc.shape[1], latents_nhwc.shape[2]
    lat = torch.tensor(pack_latents(np.asarray(latents_nhwc)))
    do_cfg = guidance_scale > 1.0
    bsz = lat.shape[0]
    sigmas, timesteps = flow_sigmas(num_steps, shift=sched_shift)
    for i in range(num_steps):
        lat_in = torch.cat([lat, lat], dim=0) if do_cfg else lat
        t = torch.full((lat_in.shape[0],), float(timesteps[i]))
        pred = hidream_forward(tr_sd, lat_in, t5, llama, pooled, t,
                               img_ids, tr_cfg)
        v = -pred
        if do_cfg:
            unc, txt = v[:bsz], v[bsz:]
            v = unc + guidance_scale * (txt - unc)
        lat = lat + float(sigmas[i + 1] - sigmas[i]) * v
    unpacked = unpack_latents(lat.numpy(), lh, lw)
    unpacked = unpacked / vae_cfg.scaling_factor + vae_cfg.shift_factor
    nchw = torch.tensor(np.transpose(unpacked, (0, 3, 1, 2)))
    img = vae_decode(vae_sd, nchw, vae_cfg)
    img = np.transpose(img.numpy(), (0, 2, 3, 1))
    img = np.clip(img / 2 + 0.5, 0.0, 1.0)
    return np.round(img * 255.0).astype(np.uint8)
