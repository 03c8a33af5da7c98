"""T5 encoder in JAX (FLUX / HiDream / SD3-class text encoder 2).

Layer-stacked ``lax.scan`` transformer with T5's specifics: RMS layer norm
(no mean subtraction, no bias), unscaled attention (no 1/sqrt(dh)), shared
bucketed relative position bias computed once, and either gated-GELU
(v1.1, used by FLUX's T5-XXL) or ReLU feed-forward.

Reference usage: ``trainscripts/uce_flux_edit.py:48-65`` extracts
per-concept last-token T5 hidden states via the FLUX pipeline's
``encode_prompt``; this module provides that path natively.
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
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    is_gated_act: bool = True
    dense_act_fn: str = "gelu_new"

    @classmethod
    def from_hf(cls, cfg: Mapping) -> "T5Config":
        return cls(
            vocab_size=cfg["vocab_size"],
            d_model=cfg["d_model"],
            d_kv=cfg["d_kv"],
            d_ff=cfg["d_ff"],
            num_layers=cfg["num_layers"],
            num_heads=cfg["num_heads"],
            relative_attention_num_buckets=cfg.get(
                "relative_attention_num_buckets", 32),
            relative_attention_max_distance=cfg.get(
                "relative_attention_max_distance", 128),
            layer_norm_epsilon=cfg.get("layer_norm_epsilon", 1e-6),
            is_gated_act=cfg.get("is_gated_act",
                                 "gated" in cfg.get("feed_forward_proj", "")),
            dense_act_fn=cfg.get("dense_act_fn",
                                 cfg.get("feed_forward_proj", "relu")
                                 .replace("gated-", "")),
        )


def _rms_norm(x, scale, eps):
    x32 = x.astype(jnp.float32)
    var = (x32 * x32).mean(-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale


def _t5_act(name: str):
    if name in ("gelu_new", "gelu"):
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "relu":
        return jax.nn.relu
    raise ValueError(name)


def relative_position_buckets(q_len: int, k_len: int, num_buckets: int,
                              max_distance: int) -> np.ndarray:
    """Bidirectional (encoder) T5 relative position bucketing, host-side."""
    ctx = np.arange(q_len)[:, None]
    mem = np.arange(k_len)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    out = (rel > 0).astype(np.int64) * nb
    rel_abs = np.abs(rel)
    max_exact = nb // 2
    is_small = rel_abs < max_exact
    large = max_exact + (
        np.log(np.maximum(rel_abs, 1) / max_exact)
        / np.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return out + np.where(is_small, rel_abs, large)


def convert_hf_state_dict(state_dict: Mapping, config: T5Config) -> dict:
    sd = to_numpy_state_dict(state_dict)
    prefix = "encoder."
    if not any(k.startswith(prefix) for k in sd):
        prefix = ""
    L = config.num_layers

    def lin_w(tmpl):
        return np.swapaxes(stack_layers(sd, prefix + tmpl, L), -1, -2)

    def vec(tmpl):
        return stack_layers(sd, prefix + tmpl, L)

    layers = {
        "ln1": vec("block.{}.layer.0.layer_norm.weight"),
        "q": lin_w("block.{}.layer.0.SelfAttention.q.weight"),
        "k": lin_w("block.{}.layer.0.SelfAttention.k.weight"),
        "v": lin_w("block.{}.layer.0.SelfAttention.v.weight"),
        "o": lin_w("block.{}.layer.0.SelfAttention.o.weight"),
        "ln2": vec("block.{}.layer.1.layer_norm.weight"),
    }
    if config.is_gated_act:
        layers["wi_0"] = lin_w("block.{}.layer.1.DenseReluDense.wi_0.weight")
        layers["wi_1"] = lin_w("block.{}.layer.1.DenseReluDense.wi_1.weight")
    else:
        layers["wi"] = lin_w("block.{}.layer.1.DenseReluDense.wi.weight")
    layers["wo"] = lin_w("block.{}.layer.1.DenseReluDense.wo.weight")

    shared_key = "shared.weight" if "shared.weight" in sd else (
        prefix + "embed_tokens.weight")
    params = {
        "token_embedding": sd[shared_key],
        "rel_bias": np.swapaxes(sd[
            prefix + "block.0.layer.0.SelfAttention"
            ".relative_attention_bias.weight"], 0, 1),  # [H, buckets]
        "layers": layers,
        "final_ln": sd[prefix + "final_layer_norm.weight"],
    }
    return jax.tree_util.tree_map(jnp.asarray, params)


@functools.partial(jax.jit, static_argnames=("config",))
def encode_tokens(params: dict, input_ids: jnp.ndarray,
                  attention_mask: jnp.ndarray | None,
                  config: T5Config) -> jnp.ndarray:
    """input_ids [B, T] -> last hidden state [B, T, d_model]."""
    eps = config.layer_norm_epsilon
    H, Dh = config.num_heads, config.d_kv
    act = _t5_act(config.dense_act_fn)
    B, T = input_ids.shape
    D = config.d_model

    x = params["token_embedding"][input_ids]

    buckets = relative_position_buckets(
        T, T, config.relative_attention_num_buckets,
        config.relative_attention_max_distance)
    # position bias [1, H, T, T], shared by every layer
    bias = params["rel_bias"][:, jnp.asarray(buckets)][None]
    if attention_mask is not None:
        pad = (attention_mask[:, None, None, :] == 0)
        bias = bias + jnp.where(pad, jnp.finfo(jnp.float32).min, 0.0)

    def layer(x, p):
        h = _rms_norm(x, p["ln1"], eps)
        q = (h @ p["q"]).reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        k = (h @ p["k"]).reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        v = (h @ p["v"]).reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        # T5: unscaled logits + additive position bias
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) + bias
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, T, H * Dh)
        x = x + attn @ p["o"]
        h = _rms_norm(x, p["ln2"], eps)
        if config.is_gated_act:
            ff = act(h @ p["wi_0"]) * (h @ p["wi_1"])
        else:
            ff = act(h @ p["wi"])
        x = x + ff @ p["wo"]
        return x, None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    return _rms_norm(x, params["final_ln"], eps)


def init_params(rng: np.random.Generator, config: T5Config) -> dict:
    D, L, F = config.d_model, config.num_layers, config.d_ff
    inner = config.num_heads * config.d_kv
    n = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.02)
    layers = {
        "ln1": jnp.ones((L, D)),
        "q": n(L, D, inner), "k": n(L, D, inner), "v": n(L, D, inner),
        "o": n(L, inner, D),
        "ln2": jnp.ones((L, D)),
        "wo": n(L, F, D),
    }
    if config.is_gated_act:
        layers["wi_0"], layers["wi_1"] = n(L, D, F), n(L, D, F)
    else:
        layers["wi"] = n(L, D, F)
    return {
        "token_embedding": n(config.vocab_size, D),
        "rel_bias": n(config.num_heads,
                      config.relative_attention_num_buckets),
        "layers": layers,
        "final_ln": jnp.ones((D,)),
    }
