"""HiDream-I1 sparse-MoE DiT in JAX — the denoiser behind the HiDream
inference path (the reference consumes it via diffusers'
``HiDreamImagePipeline``, instantiated at
``trainscripts/uce_hidream_edit.py:16-64``; upstream also shipped an
``inference_hidream.ipynb`` demo whose blob is missing from the snapshot).

Architecture (diffusers ``HiDreamImageTransformer2DModel``): 2x2 packed
latent patches, timestep + pooled-(CLIP-L|CLIP-G) AdaLN conditioning, a
quad text pipeline — per-block Llama-3.1 hidden-state streams plus one T5
stream, each entering through its own ``caption_projection.<i>.linear``
(the UCE edit targets, see ``uce_tpu/edit/hidream.py``) — N double-stream
blocks (separate image/text projections, joint attention, SwiGLU FFNs with
a routed mixture-of-experts on the image stream) followed by M
single-stream MoE blocks over the concatenated sequence, and an
AdaLN-modulated output head.

Text-stream plumbing (faithful to the reference pipeline's transformer):
the persistent text carry is ``[T5, llama[last]]``; double block *i*
attends over ``[image, carry, llama[i]]`` and writes back only the carry
slice; single block *j* attends over ``[image+carry, llama[num_layers+j]]``
and drops the per-block tail. Rope ids are (0, y, x) for image patches and
zeros (identity rotation) for text tokens.

Functional and layer-stacked: both block families run as ``lax.scan`` over
depth with the per-block llama streams as scan inputs. The routed MoE is
computed densely (every expert on every token, gated by top-k softmax
scores, ``norm_topk_prob=False``) — numerically identical to sparse
dispatch and MXU-friendly; a capacity-based dispatch is a later
optimization.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from uce_tpu.models.flux import (
    _attention,
    _heads,
    _ln,
    _unheads,
    apply_rope,
    rope_freqs,
)
from uce_tpu.models.hf_loader import stack_layers, to_numpy_state_dict
from uce_tpu.models.layers import mm, timestep_embedding
from uce_tpu.ops import quant


@dataclasses.dataclass(frozen=True)
class HiDreamConfig:
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 16
    num_single_layers: int = 32
    attention_head_dim: int = 128
    num_attention_heads: int = 20
    caption_channels: tuple = (4096, 4096)  # (T5, Llama)
    text_emb_dim: int = 2048  # pooled CLIP-L (768) + CLIP-G (1280)
    num_routed_experts: int = 4
    num_activated_experts: int = 2
    axes_dims_rope: tuple = (64, 32, 32)
    llama_layers: tuple = ()
    ffn_multiple_of: int = 256  # SwiGLU hidden rounding (tiny configs: 8)

    @classmethod
    def from_hf(cls, cfg: Mapping) -> "HiDreamConfig":
        return cls(
            patch_size=cfg.get("patch_size", 2),
            in_channels=cfg.get("in_channels", 16),
            # diffusers serializes 'out_channels': null meaning
            # "use in_channels" — .get() returns the present null, so the
            # fallback chain must survive an explicit None
            out_channels=(cfg.get("out_channels")
                          or cfg.get("in_channels") or 16),
            num_layers=cfg.get("num_layers", 16),
            num_single_layers=cfg.get("num_single_layers", 32),
            attention_head_dim=cfg.get("attention_head_dim", 128),
            num_attention_heads=cfg.get("num_attention_heads", 20),
            caption_channels=tuple(cfg.get("caption_channels", (4096, 4096))),
            text_emb_dim=cfg.get("text_emb_dim", 2048),
            num_routed_experts=cfg.get("num_routed_experts", 4),
            num_activated_experts=cfg.get("num_activated_experts", 2),
            axes_dims_rope=tuple(cfg.get("axes_dims_rope", (64, 32, 32))),
            llama_layers=tuple(cfg.get("llama_layers", ())),
            ffn_multiple_of=cfg.get("ffn_multiple_of", 256),
        )

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def num_caption_projections(self) -> int:
        return self.num_layers + self.num_single_layers + 1

    def swiglu_hidden(self, base: int) -> int:
        """FeedForwardSwiGLU hidden rounding: 2/3 * base, up to multiple_of."""
        h = int(2 * base / 3)
        m = self.ffn_multiple_of
        return m * ((h + m - 1) // m)


def _rms_full(x, scale, eps=1e-5):
    """RMSNorm over the full projected dim (applied before head split)."""
    x32 = x.astype(jnp.float32)
    var = (x32 * x32).mean(-1, keepdims=True)
    return ((x32 * jax.lax.rsqrt(var + eps)) * scale).astype(x.dtype)


def _swiglu(p, x):
    # mm dispatches weight-only-int8 dicts (models/quantize.py mode="w8")
    return mm(jax.nn.silu(mm(x, p["w1"])) * mm(x, p["w3"]), p["w2"])


def _expert_mm(x, p, eq):
    """Routed-expert einsum with weight-only-int8 dispatch.

    Expert weights are [E, in, out] per layer (stacked [L, E, in, out]);
    quantize_params gives them per-(layer, expert, out-channel) scales,
    applied on the einsum output where they commute exactly.
    """
    w = p["weight"]
    if quant.is_weight_only(w) or quant.is_quantized(w):
        # W8A8 ("int8") expert banks take the same dequant-to-activation-
        # dtype arithmetic as weight-only: there is no int8-MXU routed-
        # expert einsum (and int8 ops lose to bf16 on this toolchain
        # anyway — docs/PERF.md), so only the storage is int8.
        key = quant.WKEY if quant.is_weight_only(w) else quant.QKEY
        y = jnp.einsum(eq, x, w[key].astype(x.dtype))
        return y * jnp.squeeze(w["scale"], 1).astype(y.dtype)  # [E, out]
    return jnp.einsum(eq, x, w)


def _moe(p, x, num_activated: int):
    """Dense routed MoE: top-k softmax gate (scores NOT renormalized,
    matching norm_topk_prob=False) + shared expert."""
    logits = jnp.einsum("bsd,ed->bse", x.astype(jnp.float32),
                        p["gate"]["weight"].astype(jnp.float32))
    scores = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(scores, num_activated)
    n_exp = scores.shape[-1]
    gate_w = (jax.nn.one_hot(topi, n_exp, dtype=scores.dtype)
              * topv[..., None]).sum(axis=-2)  # [B,S,E]
    e = p["experts"]
    h = jax.nn.silu(_expert_mm(x, e["w1"], "bsd,edh->bseh")
                    ) * _expert_mm(x, e["w3"], "bsd,edh->bseh")
    routed = _expert_mm(h, e["w2"], "bseh,ehd->bsed")
    y = (routed * gate_w.astype(x.dtype)[..., None]).sum(axis=-2)
    return y + _swiglu(p["shared"], x)


def _ff_i(p, x, cfg):
    if cfg.num_routed_experts > 0:
        return _moe(p, x, cfg.num_activated_experts)
    return _swiglu(p, x)


def _mlp_embed(p, v):
    return mm(jax.nn.silu(mm(v, p["linear_1"])), p["linear_2"])


def _qkv(a, x, heads, suffix=""):
    q = _rms_full(mm(x, a[f"to_q{suffix}"]),
                  a[f"q_rms_norm{suffix}"]["weight"])
    k = _rms_full(mm(x, a[f"to_k{suffix}"]),
                  a[f"k_rms_norm{suffix}"]["weight"])
    v = mm(x, a[f"to_v{suffix}"])
    return _heads(q, heads), _heads(k, heads), _heads(v, heads)


def apply(params: dict, x_packed: jnp.ndarray, t5_embeds: jnp.ndarray,
          llama_embeds: jnp.ndarray, pooled: jnp.ndarray,
          timesteps: jnp.ndarray, img_ids: np.ndarray,
          config: HiDreamConfig) -> jnp.ndarray:
    """Forward pass.

    x_packed     [B, S_img, in_channels * p^2]  packed 2x2 latent patches
    t5_embeds    [B, S_t5, caption_channels[0]]
    llama_embeds [num_layers + num_single_layers, B, S_ll, caption_channels[1]]
                 — hidden states already selected via config.llama_layers
                 (the pipeline indexes the encoder's full stack)
    pooled       [B, text_emb_dim]
    timesteps    [B] in scheduler units (0..1000)
    img_ids      [S_img, 3] (0, y, x) patch grid

    Returns the (un-negated) flow prediction [B, S_img, out_channels * p^2];
    the pipeline applies HiDream's ``noise_pred = -noise_pred``.
    """
    cfg = config
    H = cfg.num_attention_heads
    dtype = x_packed.dtype

    x = mm(x_packed, params["x_embedder"]["proj"])

    t_proj = timestep_embedding(timesteps.astype(jnp.float32), 256
                                ).astype(dtype)
    temb = _mlp_embed(params["t_embedder"]["timestep_embedder"], t_proj)
    temb = temb + _mlp_embed(params["p_embedder"]["pooled_embedder"],
                             pooled.astype(dtype))

    # caption projections: llama stream i -> projection i, T5 -> last
    cp = params["caption_projection"]
    llama_proj = jnp.einsum("lbsd,lde->lbse", llama_embeds,
                            cp["llama"]["weight"].astype(llama_embeds.dtype)
                            ).astype(dtype)
    t5_proj = (t5_embeds @ cp["t5"]["weight"].astype(t5_embeds.dtype)
               ).astype(dtype)

    s_img = x_packed.shape[1]
    s_t5, s_ll = t5_proj.shape[1], llama_proj.shape[2]
    ids = np.concatenate(
        [np.asarray(img_ids), np.zeros((s_t5 + 2 * s_ll, 3))], axis=0)
    cos, sin = rope_freqs(ids, cfg.axes_dims_rope)

    # persistent text carry: [T5, llama[last]]
    carry_txt = jnp.concatenate([t5_proj, llama_proj[-1]], axis=1)
    s_carry = s_t5 + s_ll

    def ada(p, n):
        out = mm(jax.nn.silu(temb), p["1"])
        return [c[:, None] for c in jnp.split(out, n, axis=-1)]

    # ---------------- double-stream blocks -------------------------------
    def double_block(state, xs):
        x, carry_txt = state
        p, llama_i = xs
        txt = jnp.concatenate([carry_txt, llama_i], axis=1)
        (sh_mi, sc_mi, g_mi, sh_fi, sc_fi, g_fi,
         sh_mt, sc_mt, g_mt, sh_ft, sc_ft, g_ft) = ada(
            p["adaLN_modulation"], 12)

        ni = _ln(x) * (1 + sc_mi) + sh_mi
        nt = _ln(txt) * (1 + sc_mt) + sh_mt
        a = p["attn1"]
        qi, ki, vi = _qkv(a, ni, H)
        qt, kt, vt = _qkv(a, nt, H, "_t")
        q = jnp.concatenate([qi, qt], axis=2)
        k = jnp.concatenate([ki, kt], axis=2)
        v = jnp.concatenate([vi, vt], axis=2)
        q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        out = _unheads(_attention(q, k, v))
        out_i, out_t = out[:, :s_img], out[:, s_img:]
        x = x + g_mi * mm(out_i, a["to_out"])
        txt = txt + g_mt * mm(out_t, a["to_out_t"])

        ni = _ln(x) * (1 + sc_fi) + sh_fi
        nt = _ln(txt) * (1 + sc_ft) + sh_ft
        x = x + g_fi * _ff_i(p["ff_i"], ni, cfg)
        txt = txt + g_ft * _swiglu(p["ff_t"], nt)
        return (x, txt[:, :s_carry]), None

    (x, carry_txt), _ = jax.lax.scan(
        double_block, (x, carry_txt),
        (params["double_stream_blocks"], llama_proj[:cfg.num_layers]))

    # ---------------- single-stream blocks -------------------------------
    h_all = jnp.concatenate([x, carry_txt], axis=1)
    s_all = s_img + s_carry

    def single_block(h, xs):
        p, llama_i = xs
        hc = jnp.concatenate([h, llama_i], axis=1)
        sh_m, sc_m, g_m, sh_f, sc_f, g_f = ada(p["adaLN_modulation"], 6)
        hn = _ln(hc) * (1 + sc_m) + sh_m
        a = p["attn1"]
        q, k, v = _qkv(a, hn, H)
        q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        out = _unheads(_attention(q, k, v))
        hc = hc + g_m * mm(out, a["to_out"])
        hn = _ln(hc) * (1 + sc_f) + sh_f
        hc = hc + g_f * _ff_i(p["ff_i"], hn, cfg)
        return hc[:, :s_all], None

    h_all, _ = jax.lax.scan(
        single_block, h_all,
        (params["single_stream_blocks"], llama_proj[cfg.num_layers:]))
    x = h_all[:, :s_img]

    # output head: AdaLN (shift, scale) + linear to patch pixels
    fl = params["final_layer"]
    cond = mm(jax.nn.silu(temb), fl["adaLN_modulation"]["1"])
    shift, scale = jnp.split(cond, 2, axis=-1)
    x = _ln(x) * (1 + scale[:, None]) + shift[:, None]
    return mm(x, fl["linear"])


# ---------------------------------------------------------------------------
# parameter conversion / init
# ---------------------------------------------------------------------------

def _lin(sd, name):
    return {"weight": jnp.asarray(np.swapaxes(sd[name + ".weight"], -1, -2)),
            "bias": jnp.asarray(sd[name + ".bias"])}


def _stack_lin(sd, tmpl, n, bias=True):
    w = np.swapaxes(stack_layers(sd, tmpl + ".weight", n), -1, -2)
    out = {"weight": jnp.asarray(w)}
    if bias:
        out["bias"] = jnp.asarray(stack_layers(sd, tmpl + ".bias", n))
    return out


def _stack_vec(sd, tmpl, n):
    return {"weight": jnp.asarray(stack_layers(sd, tmpl + ".weight", n))}


def _stack_experts(sd, tmpl, n_layers, n_experts, leaf):
    """[L, E, in, out] from '<block>.ff_i.experts.<e>.<leaf>.weight'."""
    per_layer = []
    for li in range(n_layers):
        per_expert = [
            np.swapaxes(
                sd[tmpl.format(li) + f".experts.{e}.{leaf}.weight"], -1, -2)
            for e in range(n_experts)]
        per_layer.append(np.stack(per_expert))
    return {"weight": jnp.asarray(np.stack(per_layer))}


def _attn_params(sd, tmpl, n, text_stream: bool):
    def out_lin(suffix):
        # HiDream's custom attention uses a bare Linear for to_out; accept
        # the diffusers ModuleList form to_out.0 as well.
        probe = tmpl.format(0) + f".to_out{suffix}.weight"
        name = f".to_out{suffix}" if probe in sd else f".to_out{suffix}.0"
        return _stack_lin(sd, tmpl + name, n)

    p = {
        **{k: _stack_lin(sd, tmpl + f".{k}", n)
           for k in ("to_q", "to_k", "to_v")},
        "to_out": out_lin(""),
        **{k: _stack_vec(sd, tmpl + f".{k}", n)
           for k in ("q_rms_norm", "k_rms_norm")},
    }
    if text_stream:
        p.update({
            **{k: _stack_lin(sd, tmpl + f".{k}", n)
               for k in ("to_q_t", "to_k_t", "to_v_t")},
            "to_out_t": out_lin("_t"),
            **{k: _stack_vec(sd, tmpl + f".{k}", n)
               for k in ("q_rms_norm_t", "k_rms_norm_t")},
        })
    return p


def _ff_params(sd, tmpl, n, config):
    if config.num_routed_experts > 0:
        return {
            "shared": {k: _stack_lin(sd, tmpl + f".shared_experts.{k}", n,
                                     bias=False)
                       for k in ("w1", "w2", "w3")},
            "experts": {k: _stack_experts(sd, tmpl, n,
                                          config.num_routed_experts, k)
                        for k in ("w1", "w2", "w3")},
            "gate": _stack_vec(sd, tmpl + ".gate", n),
        }
    return {k: _stack_lin(sd, tmpl + f".{k}", n, bias=False)
            for k in ("w1", "w2", "w3")}


def convert_hf_state_dict(state_dict: Mapping,
                          config: HiDreamConfig) -> dict:
    sd = to_numpy_state_dict(state_dict)
    L, S = config.num_layers, config.num_single_layers

    def block_prefix(family, i):
        # diffusers wraps each block in HiDreamBlock: '<family>.<i>.block'
        probe = f"{family}.{i}.block.adaLN_modulation.1.weight"
        return (f"{family}.{{}}.block" if probe in sd else f"{family}.{{}}")

    db = block_prefix("double_stream_blocks", 0)
    double = {
        "adaLN_modulation": {"1": _stack_lin(sd, db + ".adaLN_modulation.1", L)},
        "attn1": _attn_params(sd, db + ".attn1", L, text_stream=True),
        "ff_i": _ff_params(sd, db + ".ff_i", L, config),
        "ff_t": {k: _stack_lin(sd, db + f".ff_t.{k}", L, bias=False)
                 for k in ("w1", "w2", "w3")},
    }
    sb = block_prefix("single_stream_blocks", 0)
    single = {
        "adaLN_modulation": {"1": _stack_lin(sd, sb + ".adaLN_modulation.1", S)},
        "attn1": _attn_params(sd, sb + ".attn1", S, text_stream=False),
        "ff_i": _ff_params(sd, sb + ".ff_i", S, config),
    }

    n_cp = config.num_caption_projections
    llama_w = np.stack([
        np.swapaxes(sd[f"caption_projection.{i}.linear.weight"], -1, -2)
        for i in range(n_cp - 1)])
    return {
        "x_embedder": {"proj": _lin(sd, "x_embedder.proj")},
        "t_embedder": {"timestep_embedder": {
            "linear_1": _lin(sd, "t_embedder.timestep_embedder.linear_1"),
            "linear_2": _lin(sd, "t_embedder.timestep_embedder.linear_2")}},
        "p_embedder": {"pooled_embedder": {
            "linear_1": _lin(sd, "p_embedder.pooled_embedder.linear_1"),
            "linear_2": _lin(sd, "p_embedder.pooled_embedder.linear_2")}},
        "caption_projection": {
            "llama": {"weight": jnp.asarray(llama_w)},
            "t5": {"weight": jnp.asarray(np.swapaxes(
                sd[f"caption_projection.{n_cp - 1}.linear.weight"], -1, -2))},
        },
        "double_stream_blocks": double,
        "single_stream_blocks": single,
        "final_layer": {
            "linear": _lin(sd, "final_layer.linear"),
            "adaLN_modulation": {"1": _lin(sd, "final_layer.adaLN_modulation.1")},
        },
    }


def init_state_dict(config: HiDreamConfig, rng: np.random.Generator,
                    scale: float = 0.02) -> dict[str, np.ndarray]:
    """Random flat state dict in diffusers naming (tests/benches) — the
    documented key contract of the converter."""
    cfg = config
    D = cfg.inner_dim
    sd: dict[str, np.ndarray] = {}

    def lin(name, cin, cout, bias=True):
        sd[name + ".weight"] = (rng.standard_normal((cout, cin)) * scale
                                ).astype(np.float32)
        if bias:
            sd[name + ".bias"] = np.zeros(cout, np.float32)

    def vec(name, n):
        sd[name + ".weight"] = np.ones(n, np.float32)

    lin("x_embedder.proj", cfg.in_channels * cfg.patch_size ** 2, D)
    lin("t_embedder.timestep_embedder.linear_1", 256, D)
    lin("t_embedder.timestep_embedder.linear_2", D, D)
    lin("p_embedder.pooled_embedder.linear_1", cfg.text_emb_dim, D)
    lin("p_embedder.pooled_embedder.linear_2", D, D)
    for i in range(cfg.num_caption_projections):
        cin = (cfg.caption_channels[0] if i == cfg.num_caption_projections - 1
               else cfg.caption_channels[1])
        lin(f"caption_projection.{i}.linear", cin, D, bias=False)

    def ffn(prefix, base):
        h = cfg.swiglu_hidden(base)
        lin(prefix + ".w1", D, h, bias=False)
        lin(prefix + ".w2", h, D, bias=False)
        lin(prefix + ".w3", D, h, bias=False)

    def moe_ffn(prefix):
        if cfg.num_routed_experts > 0:
            ffn(prefix + ".shared_experts", 2 * D)  # hidden_dim // 2
            for e in range(cfg.num_routed_experts):
                ffn(prefix + f".experts.{e}", 4 * D)
            sd[prefix + ".gate.weight"] = (
                rng.standard_normal((cfg.num_routed_experts, D)) * scale
            ).astype(np.float32)
        else:
            ffn(prefix, 4 * D)

    def attn(prefix, text_stream):
        suffixes = ("", "_t") if text_stream else ("",)
        for s in suffixes:
            for k in (f"to_q{s}", f"to_k{s}", f"to_v{s}", f"to_out{s}"):
                lin(f"{prefix}.{k}", D, D)
            vec(f"{prefix}.q_rms_norm{s}", D)
            vec(f"{prefix}.k_rms_norm{s}", D)

    for i in range(cfg.num_layers):
        b = f"double_stream_blocks.{i}.block"
        lin(b + ".adaLN_modulation.1", D, 12 * D)
        attn(b + ".attn1", text_stream=True)
        moe_ffn(b + ".ff_i")
        ffn(b + ".ff_t", 4 * D)
    for i in range(cfg.num_single_layers):
        b = f"single_stream_blocks.{i}.block"
        lin(b + ".adaLN_modulation.1", D, 6 * D)
        attn(b + ".attn1", text_stream=False)
        moe_ffn(b + ".ff_i")
    lin("final_layer.linear", D, cfg.patch_size ** 2 * cfg.out_channels)
    lin("final_layer.adaLN_modulation.1", D, 2 * D)
    return sd


def init_params(config: HiDreamConfig, seed: int = 0,
                scale: float = 0.02) -> dict:
    return convert_hf_state_dict(
        init_state_dict(config, np.random.default_rng(seed), scale), config)
