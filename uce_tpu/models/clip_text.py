"""JAX CLIP text encoder (SD v1.x / v2.x / SDXL prompt encoders).

Functional, layer-stacked transformer run as one ``lax.scan`` over depth —
the TPU-idiomatic replacement for the reference's use of HF
``CLIPTextModel`` via diffusers (``trainscripts/uce_sd_erase.py:29-32``).

Weights load from HF snapshot safetensors (``text_encoder/``) or a torch
state dict (tests). Supports both the OpenAI CLIP activation (quick_gelu,
SD v1.x) and OpenCLIP's gelu (SD v2.x / SDXL), eos pooling and the optional
text projection (SDXL's second encoder).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from uce_tpu.models.hf_loader import stack_layers, to_numpy_state_dict
from uce_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"
    projection_dim: int | None = None
    layer_norm_eps: float = 1e-5
    eos_token_id: int | None = 49407

    @classmethod
    def from_hf(cls, cfg: Mapping, *,
                diff_defaults: bool = False) -> "CLIPTextConfig":
        # Composite CLIP checkpoints (openai/clip-vit-base-patch32) nest
        # text_config as a diff-from-default dict (old transformers
        # to_diff_dict), so absent keys mean the transformers
        # CLIPTextConfig DEFAULTS (hidden 512, 8 heads, ...) — those
        # callers pass ``diff_defaults=True``. Standalone text_encoder
        # configs (SD/SDXL snapshots) are fully serialized, so structural
        # keys stay REQUIRED there: silently defaulting a truncated or
        # corrupt config would build a wrong-shaped model and surface only
        # as a distant weight-shape mismatch (or never, on random init).
        if diff_defaults:
            structural = dict(
                vocab_size=cfg.get("vocab_size", 49408),
                hidden_size=cfg.get("hidden_size", 512),
                num_hidden_layers=cfg.get("num_hidden_layers", 12),
                num_attention_heads=cfg.get("num_attention_heads", 8),
                intermediate_size=cfg.get("intermediate_size", 2048),
            )
        else:
            structural = dict(
                vocab_size=cfg["vocab_size"],
                hidden_size=cfg["hidden_size"],
                num_hidden_layers=cfg["num_hidden_layers"],
                num_attention_heads=cfg["num_attention_heads"],
                intermediate_size=cfg["intermediate_size"],
            )
        return cls(
            eos_token_id=cfg.get("eos_token_id", 49407),
            max_position_embeddings=cfg.get("max_position_embeddings", 77),
            hidden_act=cfg.get("hidden_act", "quick_gelu"),
            projection_dim=cfg.get("projection_dim"),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
            **structural,
        )


# SD v1.x (CompVis/stable-diffusion-v1-4 text_encoder/config.json)
SD14_TEXT_CONFIG = CLIPTextConfig()
# SD v2.x (OpenCLIP ViT-H text tower)
SD2_TEXT_CONFIG = CLIPTextConfig(
    hidden_size=1024, num_hidden_layers=23, num_attention_heads=16,
    intermediate_size=4096, hidden_act="gelu",
)
# SDXL second encoder (OpenCLIP ViT-bigG, with projection)
SDXL_TEXT2_CONFIG = CLIPTextConfig(
    hidden_size=1280, num_hidden_layers=32, num_attention_heads=20,
    intermediate_size=5120, hidden_act="gelu", projection_dim=1280,
)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name in ("gelu", "gelu_new", "gelu_pytorch_tanh"):
        return lambda x: jax.nn.gelu(x, approximate=(name != "gelu"))
    raise ValueError(f"unsupported activation: {name}")


def _layer_norm(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def convert_hf_state_dict(
    state_dict: Mapping, config: CLIPTextConfig
) -> dict:
    """HF CLIPTextModel state dict -> layer-stacked pytree.

    Linear weights transpose from HF's [out, in] to [in, out] so the
    forward is plain ``x @ w + b``.
    """
    sd = to_numpy_state_dict(state_dict)
    # Both bare ("text_model.…") and prefixed checkpoints appear in the wild.
    prefix = "text_model."
    if not any(k.startswith(prefix) for k in sd):
        prefix = ""
    g = lambda k: sd[prefix + k]
    L = config.num_hidden_layers

    def lin_w(tmpl):
        return np.swapaxes(stack_layers(sd, prefix + tmpl, L), -1, -2)

    def vec(tmpl):
        return stack_layers(sd, prefix + tmpl, L)

    layers = {
        "ln1_scale": vec("encoder.layers.{}.layer_norm1.weight"),
        "ln1_bias": vec("encoder.layers.{}.layer_norm1.bias"),
        "q_w": lin_w("encoder.layers.{}.self_attn.q_proj.weight"),
        "q_b": vec("encoder.layers.{}.self_attn.q_proj.bias"),
        "k_w": lin_w("encoder.layers.{}.self_attn.k_proj.weight"),
        "k_b": vec("encoder.layers.{}.self_attn.k_proj.bias"),
        "v_w": lin_w("encoder.layers.{}.self_attn.v_proj.weight"),
        "v_b": vec("encoder.layers.{}.self_attn.v_proj.bias"),
        "o_w": lin_w("encoder.layers.{}.self_attn.out_proj.weight"),
        "o_b": vec("encoder.layers.{}.self_attn.out_proj.bias"),
        "ln2_scale": vec("encoder.layers.{}.layer_norm2.weight"),
        "ln2_bias": vec("encoder.layers.{}.layer_norm2.bias"),
        "fc1_w": lin_w("encoder.layers.{}.mlp.fc1.weight"),
        "fc1_b": vec("encoder.layers.{}.mlp.fc1.bias"),
        "fc2_w": lin_w("encoder.layers.{}.mlp.fc2.weight"),
        "fc2_b": vec("encoder.layers.{}.mlp.fc2.bias"),
    }
    params = {
        "token_embedding": g("embeddings.token_embedding.weight"),
        "position_embedding": g("embeddings.position_embedding.weight"),
        "layers": layers,
        "final_ln_scale": g("final_layer_norm.weight"),
        "final_ln_bias": g("final_layer_norm.bias"),
    }
    if "text_projection.weight" in sd:
        params["text_projection"] = np.swapaxes(sd["text_projection.weight"], -1, -2)
    return jax.tree_util.tree_map(jnp.asarray, params)


def init_params(rng: np.random.Generator, config: CLIPTextConfig) -> dict:
    """Random params for tests/benchmarks (matches converted layout)."""
    D, L, I = config.hidden_size, config.num_hidden_layers, config.intermediate_size
    n = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.02)
    layers = {
        "ln1_scale": jnp.ones((L, D)), "ln1_bias": jnp.zeros((L, D)),
        "q_w": n(L, D, D), "q_b": jnp.zeros((L, D)),
        "k_w": n(L, D, D), "k_b": jnp.zeros((L, D)),
        "v_w": n(L, D, D), "v_b": jnp.zeros((L, D)),
        "o_w": n(L, D, D), "o_b": jnp.zeros((L, D)),
        "ln2_scale": jnp.ones((L, D)), "ln2_bias": jnp.zeros((L, D)),
        "fc1_w": n(L, D, I), "fc1_b": jnp.zeros((L, I)),
        "fc2_w": n(L, I, D), "fc2_b": jnp.zeros((L, D)),
    }
    params = {
        "token_embedding": n(config.vocab_size, D),
        "position_embedding": n(config.max_position_embeddings, D),
        "layers": layers,
        "final_ln_scale": jnp.ones((D,)), "final_ln_bias": jnp.zeros((D,)),
    }
    if config.projection_dim:
        params["text_projection"] = n(D, config.projection_dim)
    return params


@functools.partial(jax.jit, static_argnames=("config", "output_hidden_states"))
def encode_tokens(
    params: dict,
    input_ids: jnp.ndarray,
    config: CLIPTextConfig,
    *,
    output_hidden_states: bool = False,
):
    """Forward pass. input_ids [B, T] -> last_hidden [B, T, D].

    Returns (last_hidden, pooled, all_hidden|None). Pooling is at the eos
    position (argmax of token ids, HF convention); if the config has a
    text projection it is applied to the pooled vector (SDXL encoder 2).
    CLIP applies a causal mask and no padding mask, matching HF.
    """
    act = _act(config.hidden_act)
    eps = config.layer_norm_eps
    H = config.num_attention_heads
    B, T = input_ids.shape
    D = config.hidden_size
    Dh = D // H

    x = params["token_embedding"][input_ids] + params["position_embedding"][:T]

    def layer(x, p):
        h = _layer_norm(x, p["ln1_scale"], p["ln1_bias"], eps)
        q = (h @ p["q_w"] + p["q_b"]).reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        k = (h @ p["k_w"] + p["k_b"]).reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        v = (h @ p["v_w"] + p["v_b"]).reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        attn = dot_product_attention(q, k, v, causal=True)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, T, D)
        x = x + attn @ p["o_w"] + p["o_b"]
        h = _layer_norm(x, p["ln2_scale"], p["ln2_bias"], eps)
        x = x + act(h @ p["fc1_w"] + p["fc1_b"]) @ p["fc2_w"] + p["fc2_b"]
        return x, x if output_hidden_states else None

    x, hiddens = jax.lax.scan(layer, x, params["layers"])
    last = _layer_norm(x, params["final_ln_scale"], params["final_ln_bias"], eps)

    # HF pools the post-final-LN hidden state at the eos position. Real
    # SD/SDXL/OpenAI-CLIP text configs serialize the LEGACY sentinel
    # eos_token_id=2 while the tokenizer's actual eos is 49407 (the max
    # vocab id); transformers special-cases ==2 to argmax of the token ids.
    # Matching by literal id there would find no match and silently pool
    # the prompt-independent BOS state.
    if config.eos_token_id is None or config.eos_token_id == 2:
        eos_idx = jnp.argmax(input_ids, axis=-1)
    else:
        eos_idx = jnp.argmax((input_ids == config.eos_token_id).astype(jnp.int32), -1)
    pooled = last[jnp.arange(B), eos_idx]
    if "text_projection" in params:
        pooled = pooled @ params["text_projection"]
    return last, pooled, hiddens
