"""Llama (3.x) encoder for HiDream-I1 prompt embeddings.

HiDream conditions its DiT on Llama-3.1-8B-Instruct hidden states at the
transformer-config ``llama_layers`` indices
(``trainscripts/uce_hidream_edit.py:39,72-91``). Inference-only: we run the
decoder stack with ``output_hidden_states`` semantics (HF convention:
hidden_states[0] = embeddings, hidden_states[i] = output of layer i) and
never materialize the LM head.

Supports GQA, RoPE with the llama3 frequency scaling, RMSNorm, SwiGLU.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from uce_tpu.models.hf_loader import stack_layers, to_numpy_state_dict


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    # stored as a hashable tuple of (key, value) pairs so the config can be
    # a static jit argument; rope_frequencies reconstructs the dict
    rope_scaling: tuple | None = None
    head_dim: int | None = None

    @classmethod
    def from_hf(cls, cfg: Mapping) -> "LlamaConfig":
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            num_key_value_heads=cfg.get(
                "num_key_value_heads", cfg["num_attention_heads"]),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rope_scaling=(tuple(sorted(cfg["rope_scaling"].items()))
                          if cfg.get("rope_scaling") else None),
            head_dim=cfg.get("head_dim"),
        )

    @property
    def dh(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads


def _rms_norm(x, scale, eps):
    x32 = x.astype(jnp.float32)
    var = (x32 * x32).mean(-1, keepdims=True)
    return ((x32 * jax.lax.rsqrt(var + eps)) * scale).astype(x.dtype)


def rope_frequencies(config: LlamaConfig) -> np.ndarray:
    """Inverse frequencies with optional llama3 long-context scaling."""
    dh = config.dh
    inv = 1.0 / (config.rope_theta ** (np.arange(0, dh, 2, dtype=np.float64) / dh))
    rs = config.rope_scaling
    if rs is not None and not isinstance(rs, dict):
        rs = dict(rs)
    if rs and rs.get("rope_type", rs.get("type")) == "llama3":
        factor = rs["factor"]
        lo, hi = rs["low_freq_factor"], rs["high_freq_factor"]
        orig = rs["original_max_position_embeddings"]
        wavelen = 2 * np.pi / inv
        lo_wl, hi_wl = orig / lo, orig / hi
        scaled = np.where(wavelen > lo_wl, inv / factor, inv)
        smooth = (orig / wavelen - lo) / (hi - lo)
        smoothed = (1 - smooth) / factor * inv + smooth * inv
        is_mid = (wavelen <= lo_wl) & (wavelen >= hi_wl)
        inv = np.where(is_mid, smoothed, scaled)
    return inv.astype(np.float32)


def _apply_rope(x, cos, sin):
    """x [B, H, T, Dh]; rotate-half convention (HF)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin


def convert_hf_state_dict(state_dict: Mapping, config: LlamaConfig) -> dict:
    sd = to_numpy_state_dict(state_dict)
    prefix = "model."
    if not any(k.startswith(prefix) for k in sd):
        prefix = ""
    L = config.num_hidden_layers

    def lin_w(tmpl):
        return np.swapaxes(stack_layers(sd, prefix + tmpl, L), -1, -2)

    def vec(tmpl):
        return stack_layers(sd, prefix + tmpl, L)

    layers = {
        "ln1": vec("layers.{}.input_layernorm.weight"),
        "q": lin_w("layers.{}.self_attn.q_proj.weight"),
        "k": lin_w("layers.{}.self_attn.k_proj.weight"),
        "v": lin_w("layers.{}.self_attn.v_proj.weight"),
        "o": lin_w("layers.{}.self_attn.o_proj.weight"),
        "ln2": vec("layers.{}.post_attention_layernorm.weight"),
        "gate": lin_w("layers.{}.mlp.gate_proj.weight"),
        "up": lin_w("layers.{}.mlp.up_proj.weight"),
        "down": lin_w("layers.{}.mlp.down_proj.weight"),
    }
    return jax.tree_util.tree_map(jnp.asarray, {
        "token_embedding": sd[prefix + "embed_tokens.weight"],
        "layers": layers,
        "final_ln": sd[prefix + "norm.weight"],
    })


@functools.partial(jax.jit, static_argnames=("config",))
def encode_tokens(params: dict, input_ids: jnp.ndarray,
                  attention_mask: jnp.ndarray | None,
                  config: LlamaConfig) -> jnp.ndarray:
    """Returns all hidden states stacked [num_layers+1, B, T, D]
    (HF output_hidden_states convention; [0] is the embedding layer)."""
    eps = config.rms_norm_eps
    H, KV, Dh = (config.num_attention_heads, config.num_key_value_heads,
                 config.dh)
    B, T = input_ids.shape
    D = config.hidden_size

    inv_freq = jnp.asarray(rope_frequencies(config))
    pos = jnp.arange(T, dtype=jnp.float32)
    angles = pos[:, None] * inv_freq[None, :]  # [T, Dh/2]
    angles = jnp.concatenate([angles, angles], axis=-1)
    cos, sin = jnp.cos(angles)[None, None], jnp.sin(angles)[None, None]

    causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
    if attention_mask is not None:
        causal = causal & (attention_mask[:, None, None, :] != 0)
    neg = jnp.finfo(jnp.float32).min

    x = params["token_embedding"][input_ids]

    def layer(x, p):
        h = _rms_norm(x, p["ln1"], eps)
        q = (h @ p["q"]).reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        k = (h @ p["k"]).reshape(B, T, KV, Dh).transpose(0, 2, 1, 3)
        v = (h @ p["v"]).reshape(B, T, KV, Dh).transpose(0, 2, 1, 3)
        q, k = _apply_rope(q, cos, sin), _apply_rope(k, cos, sin)
        if KV != H:
            rep = H // KV
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (Dh ** -0.5)
        logits = jnp.where(causal, logits, neg)
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, T, H * Dh)
        x = x + attn @ p["o"]
        h = _rms_norm(x, p["ln2"], eps)
        x = x + (jax.nn.silu(h @ p["gate"]) * (h @ p["up"])) @ p["down"]
        return x, x

    final, per_layer = jax.lax.scan(layer, x, params["layers"])
    # HF output_hidden_states: (embeddings, out_1, ..., out_{N-1},
    # norm(out_N)) — the final entry is post-RMSNorm.
    normed_final = _rms_norm(final, params["final_ln"], eps)
    return jnp.concatenate([x[None], per_layer[:-1], normed_final[None]], axis=0)


def final_norm(params: dict, hidden: jnp.ndarray,
               config: LlamaConfig) -> jnp.ndarray:
    return _rms_norm(hidden, params["final_ln"], config.rms_norm_eps)


def init_params(rng: np.random.Generator, config: LlamaConfig) -> dict:
    D, L = config.hidden_size, config.num_hidden_layers
    inner, kv_inner = (config.num_attention_heads * config.dh,
                       config.num_key_value_heads * config.dh)
    F = config.intermediate_size
    n = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.02)
    return {
        "token_embedding": n(config.vocab_size, D),
        "layers": {
            "ln1": jnp.ones((L, D)),
            "q": n(L, D, inner), "k": n(L, D, kv_inner),
            "v": n(L, D, kv_inner), "o": n(L, inner, D),
            "ln2": jnp.ones((L, D)),
            "gate": n(L, D, F), "up": n(L, D, F), "down": n(L, F, D),
        },
        "final_ln": jnp.ones((D,)),
    }
