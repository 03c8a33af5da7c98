"""FLUX.1 joint transformer (DiT) in JAX — the denoiser behind the FLUX
inference path (reference consumes it via diffusers in
``notebooks/inference_flux.ipynb``; the edit path is
``trainscripts/uce_flux_edit.py``).

Architecture (FluxTransformer2DModel): packed 2x2 latent patches embedded to
the inner dim, T5 context + pooled-CLIP/timestep/guidance AdaLN
conditioning, 3-axis interleaved RoPE over (id, y, x), N double-stream
MMDiT blocks (separate text/image projections, joint attention, per-stream
AdaLayerNormZero) followed by M single-stream blocks (fused attention+MLP),
AdaLayerNormContinuous head.

Functional, layer-stacked: both block families run as ``lax.scan`` over
depth. Params mirror diffusers names via the converter.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from uce_tpu.models.hf_loader import stack_layers, to_numpy_state_dict
from uce_tpu.models.layers import mm, timestep_embedding


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64
    num_layers: int = 19
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    pooled_projection_dim: int = 768
    guidance_embeds: bool = False  # True for dev, False for schnell
    axes_dims_rope: tuple = (16, 56, 56)

    @classmethod
    def from_hf(cls, cfg: Mapping) -> "FluxConfig":
        return cls(
            in_channels=cfg.get("in_channels", 64),
            num_layers=cfg.get("num_layers", 19),
            num_single_layers=cfg.get("num_single_layers", 38),
            attention_head_dim=cfg.get("attention_head_dim", 128),
            num_attention_heads=cfg.get("num_attention_heads", 24),
            joint_attention_dim=cfg.get("joint_attention_dim", 4096),
            pooled_projection_dim=cfg.get("pooled_projection_dim", 768),
            guidance_embeds=cfg.get("guidance_embeds", False),
            axes_dims_rope=tuple(cfg.get("axes_dims_rope", (16, 56, 56))),
        )

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


def _ln(x, eps=1e-6):
    """LayerNorm without affine (elementwise_affine=False)."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _rms(x, scale, eps=1e-6):
    x32 = x.astype(jnp.float32)
    var = (x32 * x32).mean(-1, keepdims=True)
    return ((x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype)) * scale


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def rope_freqs(ids: np.ndarray, axes_dims, theta: float = 10000.0):
    """ids [S, n_axes] -> (cos, sin) [S, sum(axes_dims)], interleaved-pair
    convention (diffusers FluxPosEmbed / apply_rotary_emb with paired
    unbinding)."""
    cos_parts, sin_parts = [], []
    for axis, dim in enumerate(axes_dims):
        freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        angles = np.asarray(ids)[:, axis:axis + 1].astype(np.float64) * freqs
        cos = np.repeat(np.cos(angles), 2, axis=-1)
        sin = np.repeat(np.sin(angles), 2, axis=-1)
        cos_parts.append(cos)
        sin_parts.append(sin)
    return (jnp.asarray(np.concatenate(cos_parts, -1), jnp.float32),
            jnp.asarray(np.concatenate(sin_parts, -1), jnp.float32))


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x [B, H, S, D]; interleaved pairs (x0,x1) -> (x0 cos - x1 sin, ...)."""
    x32 = x.astype(jnp.float32)
    xr = x32.reshape(*x.shape[:-1], -1, 2)
    x_rot = jnp.stack([-xr[..., 1], xr[..., 0]], axis=-1).reshape(x32.shape)
    return (x32 * cos + x_rot * sin).astype(x.dtype)


def _attention(q, k, v):
    # 'auto' routes the long joint attention (s_txt + s_img >= 1024,
    # d=128) to the Pallas sd kernel, which keeps the [s, s] logits in
    # VMEM instead of materializing them in HBM (1.8 GB fp32 at seq 4352)
    from uce_tpu.ops.attention import dot_product_attention

    return dot_product_attention(q, k, v, impl="auto",
                                 scale=q.shape[-1] ** -0.5)


# weight-only-int8-aware projection (models/quantize.py mode="w8" — the
# memory mode that fits the full 12 B-param DiT in one 16 GB chip's HBM;
# inside the depth lax.scan the stacked dict leaves are sliced per layer
# like any other block param)
_mm = mm


def _heads(x, h):
    b, s, d = x.shape
    return x.reshape(b, s, h, d // h).transpose(0, 2, 1, 3)


def _unheads(x):
    b, h, s, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * dh)


def apply(params: dict, latents: jnp.ndarray, t5_embeds: jnp.ndarray,
          pooled: jnp.ndarray, timestep: jnp.ndarray, img_ids: np.ndarray,
          txt_ids: np.ndarray, config: FluxConfig,
          guidance: jnp.ndarray | None = None) -> jnp.ndarray:
    """Forward. latents [B, S_img, 64] packed patches; t5_embeds
    [B, S_txt, 4096]; pooled [B, 768]; timestep [B] in [0, 1] (the pipeline
    passes sigma; x1000 applied here like diffusers); ids [S, 3] position
    grids. Returns velocity prediction [B, S_img, 64]."""
    cfg = config
    H = cfg.num_attention_heads
    dtype = latents.dtype

    x = _mm(latents, params["x_embedder"])
    enc = _mm(t5_embeds, params["context_embedder"])

    tte = params["time_text_embed"]

    def mlp_embed(p, v):
        return _mm(jax.nn.silu(_mm(v, p["linear_1"])), p["linear_2"])

    t_proj = timestep_embedding(timestep.astype(jnp.float32) * 1000.0, 256
                                ).astype(dtype)
    temb = mlp_embed(tte["timestep_embedder"], t_proj)
    if cfg.guidance_embeds:
        g_proj = timestep_embedding(
            jnp.asarray(guidance, jnp.float32) * 1000.0, 256).astype(dtype)
        temb = temb + mlp_embed(tte["guidance_embedder"], g_proj)
    temb = temb + mlp_embed(tte["text_embedder"], pooled.astype(dtype))
    temb_act = jax.nn.silu(temb)

    s_txt = t5_embeds.shape[1]
    ids = np.concatenate([np.asarray(txt_ids), np.asarray(img_ids)], axis=0)
    cos, sin = rope_freqs(ids, cfg.axes_dims_rope)

    def ada_chunks(p, n):
        return jnp.split(_mm(temb_act, p["linear"]), n, axis=-1)

    # ---------------- double-stream blocks (scan over depth) -------------
    def double_block(carry, p):
        x, enc = carry
        (sh_m, sc_m, g_m, sh_f, sc_f, g_f) = [
            c[:, None] for c in ada_chunks(p["norm1"], 6)]
        (csh_m, csc_m, cg_m, csh_f, csc_f, cg_f) = [
            c[:, None] for c in ada_chunks(p["norm1_context"], 6)]

        hx = _ln(x) * (1 + sc_m) + sh_m
        he = _ln(enc) * (1 + csc_m) + csh_m

        a = p["attn"]
        q = _heads(_mm(hx, a["to_q"]), H)
        k = _heads(_mm(hx, a["to_k"]), H)
        v = _heads(_mm(hx, a["to_v"]), H)
        q = _rms(q, a["norm_q"]["weight"])
        k = _rms(k, a["norm_k"]["weight"])
        eq = _heads(_mm(he, a["add_q_proj"]), H)
        ek = _heads(_mm(he, a["add_k_proj"]), H)
        ev = _heads(_mm(he, a["add_v_proj"]), H)
        eq = _rms(eq, a["norm_added_q"]["weight"])
        ek = _rms(ek, a["norm_added_k"]["weight"])

        # text stream first in the joint sequence (diffusers convention)
        q = jnp.concatenate([eq, q], axis=2)
        k = jnp.concatenate([ek, k], axis=2)
        v = jnp.concatenate([ev, v], axis=2)
        q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        out = _unheads(_attention(q, k, v))
        enc_out, x_out = out[:, :s_txt], out[:, s_txt:]

        x = x + g_m * _mm(x_out, a["to_out"]["0"])
        enc = enc + cg_m * _mm(enc_out, a["to_add_out"])

        hx = _ln(x) * (1 + sc_f) + sh_f
        ff = p["ff"]["net"]
        x = x + g_f * _mm(_gelu_tanh(_mm(hx, ff["0"]["proj"])), ff["2"])
        he = _ln(enc) * (1 + csc_f) + csh_f
        ffc = p["ff_context"]["net"]
        enc = enc + cg_f * _mm(_gelu_tanh(_mm(he, ffc["0"]["proj"])),
                               ffc["2"])
        return (x, enc), None

    (x, enc), _ = jax.lax.scan(double_block, (x, enc),
                               params["transformer_blocks"])

    # ---------------- single-stream blocks -------------------------------
    h_all = jnp.concatenate([enc, x], axis=1)

    def single_block(h, p):
        (sh, sc, gate) = [c[:, None] for c in ada_chunks(p["norm"], 3)]
        hn = _ln(h) * (1 + sc) + sh
        a = p["attn"]
        q = _heads(_mm(hn, a["to_q"]), H)
        k = _heads(_mm(hn, a["to_k"]), H)
        v = _heads(_mm(hn, a["to_v"]), H)
        q = _rms(q, a["norm_q"]["weight"])
        k = _rms(k, a["norm_k"]["weight"])
        q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        attn = _unheads(_attention(q, k, v))
        mlp = _gelu_tanh(_mm(hn, p["proj_mlp"]))
        fused = jnp.concatenate([attn, mlp], axis=-1)
        return h + gate * _mm(fused, p["proj_out"]), None

    h_all, _ = jax.lax.scan(single_block, h_all,
                            params["single_transformer_blocks"])
    x = h_all[:, s_txt:]

    # AdaLayerNormContinuous head: chunk order (scale, shift)
    cond = _mm(temb_act, params["norm_out"]["linear"])
    scale, shift = jnp.split(cond, 2, axis=-1)
    x = _ln(x) * (1 + scale[:, None]) + shift[:, None]
    return _mm(x, params["proj_out"])


# ---------------------------------------------------------------------------
# parameter conversion / init
# ---------------------------------------------------------------------------

def _lin(sd, name):
    import numpy as _np

    return {"weight": jnp.asarray(_np.swapaxes(sd[name + ".weight"], -1, -2)),
            "bias": jnp.asarray(sd[name + ".bias"])}


def _stack_lin(sd, tmpl, n):
    w = np.swapaxes(stack_layers(sd, tmpl + ".weight", n), -1, -2)
    b = stack_layers(sd, tmpl + ".bias", n)
    return {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}


def _stack_vec(sd, tmpl, n):
    return {"weight": jnp.asarray(stack_layers(sd, tmpl + ".weight", n))}


def convert_hf_state_dict(state_dict: Mapping, config: FluxConfig) -> dict:
    sd = to_numpy_state_dict(state_dict)
    L, S = config.num_layers, config.num_single_layers

    tb = "transformer_blocks.{}"
    double = {
        "norm1": {"linear": _stack_lin(sd, tb + ".norm1.linear", L)},
        "norm1_context": {
            "linear": _stack_lin(sd, tb + ".norm1_context.linear", L)},
        "attn": {
            **{k: _stack_lin(sd, tb + f".attn.{k}", L)
               for k in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                         "add_v_proj", "to_add_out")},
            "to_out": {"0": _stack_lin(sd, tb + ".attn.to_out.0", L)},
            **{k: _stack_vec(sd, tb + f".attn.{k}", L)
               for k in ("norm_q", "norm_k", "norm_added_q", "norm_added_k")},
        },
        "ff": {"net": {"0": {"proj": _stack_lin(sd, tb + ".ff.net.0.proj", L)},
                       "2": _stack_lin(sd, tb + ".ff.net.2", L)}},
        "ff_context": {"net": {
            "0": {"proj": _stack_lin(sd, tb + ".ff_context.net.0.proj", L)},
            "2": _stack_lin(sd, tb + ".ff_context.net.2", L)}},
    }
    sb = "single_transformer_blocks.{}"
    single = {
        "norm": {"linear": _stack_lin(sd, sb + ".norm.linear", S)},
        "attn": {
            **{k: _stack_lin(sd, sb + f".attn.{k}", S)
               for k in ("to_q", "to_k", "to_v")},
            **{k: _stack_vec(sd, sb + f".attn.{k}", S)
               for k in ("norm_q", "norm_k")},
        },
        "proj_mlp": _stack_lin(sd, sb + ".proj_mlp", S),
        "proj_out": _stack_lin(sd, sb + ".proj_out", S),
    }
    tte = {
        "timestep_embedder": {
            "linear_1": _lin(sd, "time_text_embed.timestep_embedder.linear_1"),
            "linear_2": _lin(sd, "time_text_embed.timestep_embedder.linear_2")},
        "text_embedder": {
            "linear_1": _lin(sd, "time_text_embed.text_embedder.linear_1"),
            "linear_2": _lin(sd, "time_text_embed.text_embedder.linear_2")},
    }
    if config.guidance_embeds:
        tte["guidance_embedder"] = {
            "linear_1": _lin(sd, "time_text_embed.guidance_embedder.linear_1"),
            "linear_2": _lin(sd, "time_text_embed.guidance_embedder.linear_2")}
    return {
        "x_embedder": _lin(sd, "x_embedder"),
        "context_embedder": _lin(sd, "context_embedder"),
        "time_text_embed": tte,
        "transformer_blocks": double,
        "single_transformer_blocks": single,
        "norm_out": {"linear": _lin(sd, "norm_out.linear")},
        "proj_out": _lin(sd, "proj_out"),
    }


def init_state_dict(config: FluxConfig, rng: np.random.Generator,
                    scale: float = 0.02) -> dict[str, np.ndarray]:
    """Random flat state dict in diffusers naming (tests/benches) — also the
    documented key contract of the converter."""
    cfg = config
    D = cfg.inner_dim
    sd: dict[str, np.ndarray] = {}

    def lin(name, cin, cout):
        sd[name + ".weight"] = (rng.standard_normal((cout, cin)) * scale
                                ).astype(np.float32)
        sd[name + ".bias"] = np.zeros(cout, np.float32)

    def vec(name, n):
        sd[name + ".weight"] = np.ones(n, np.float32)

    lin("x_embedder", cfg.in_channels, D)
    lin("context_embedder", cfg.joint_attention_dim, D)
    lin("time_text_embed.timestep_embedder.linear_1", 256, D)
    lin("time_text_embed.timestep_embedder.linear_2", D, D)
    lin("time_text_embed.text_embedder.linear_1",
        cfg.pooled_projection_dim, D)
    lin("time_text_embed.text_embedder.linear_2", D, D)
    if cfg.guidance_embeds:
        lin("time_text_embed.guidance_embedder.linear_1", 256, D)
        lin("time_text_embed.guidance_embedder.linear_2", D, D)

    dh = cfg.attention_head_dim
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"
        lin(b + ".norm1.linear", D, 6 * D)
        lin(b + ".norm1_context.linear", D, 6 * D)
        for k in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                  "add_v_proj", "to_add_out"):
            lin(f"{b}.attn.{k}", D, D)
        lin(b + ".attn.to_out.0", D, D)
        for k in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            vec(f"{b}.attn.{k}", dh)
        lin(b + ".ff.net.0.proj", D, 4 * D)
        lin(b + ".ff.net.2", 4 * D, D)
        lin(b + ".ff_context.net.0.proj", D, 4 * D)
        lin(b + ".ff_context.net.2", 4 * D, D)
    for i in range(cfg.num_single_layers):
        b = f"single_transformer_blocks.{i}"
        lin(b + ".norm.linear", D, 3 * D)
        for k in ("to_q", "to_k", "to_v"):
            lin(f"{b}.attn.{k}", D, D)
        for k in ("norm_q", "norm_k"):
            vec(f"{b}.attn.{k}", dh)
        lin(b + ".proj_mlp", D, 4 * D)
        lin(b + ".proj_out", 5 * D, D)
    lin("norm_out.linear", D, 2 * D)
    lin("proj_out", D, cfg.in_channels)
    return sd


def init_params(config: FluxConfig, seed: int = 0, scale: float = 0.02) -> dict:
    return convert_hf_state_dict(
        init_state_dict(config, np.random.default_rng(seed), scale), config)
