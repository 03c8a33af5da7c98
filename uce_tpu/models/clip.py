"""Full CLIP (vision tower + text tower + similarity) for zero-shot
classification and CLIP score.

Replaces the reference's HF ``pipeline("zero-shot-image-classification")``
(``trainscripts/uce_sd_debias.py:245-250``) and ``CLIPModel`` usage in
``evalscripts/CLIP_classify.py:17-18`` / ``mean_clip.py:47-50`` — and,
unlike those, runs on-device against generated image tensors with no PIL
round-trip, which is what closes the debias loop on the TPU.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from uce_tpu.models import clip_text
from uce_tpu.models.hf_loader import stack_layers, to_numpy_state_dict
from uce_tpu.models.layers import layer_norm
from uce_tpu.ops.attention import dot_product_attention

import functools as _functools


@_functools.lru_cache(maxsize=4)
def _jit_encode_image(config):
    return jax.jit(lambda p, x: encode_image(p, x, config))


@_functools.lru_cache(maxsize=1)
def _jit_similarity():
    # normalize + scaled cosine in ONE program: remote eager dispatches
    # on the axon tunnel are slow at best and have been observed to
    # wedge outright (r5 eval_bench postmortem) — no eager ops on the
    # score path
    @jax.jit
    def f(img_e, txt_e, scale):
        img_e = img_e / jnp.linalg.norm(img_e, axis=-1, keepdims=True)
        txt_e = txt_e / jnp.linalg.norm(txt_e, axis=-1, keepdims=True)
        return scale * img_e @ txt_e.T

    return f


@_functools.lru_cache(maxsize=4)
def _jit_preprocess_encode(config):
    # ONE program for resize+crop+normalize+encode: the eager op chain
    # measured ~100x slower on the axon plugin (7.5 s vs 0.07 s per
    # batch-64 512px flush — each eager op is a separate remote
    # dispatch), and raw uint8 input keeps the H2D at 1/4 the bytes
    return jax.jit(lambda p, im: encode_image(
        p, preprocess_images(im, config.image_size), config))


# OpenAI CLIP preprocessing constants
CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    image_size: int = 224
    patch_size: int = 32
    projection_dim: int = 512
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_hf(cls, cfg: Mapping) -> "CLIPVisionConfig":
        # Sparse (diff-from-default) vision_config dicts in composite CLIP
        # checkpoints fall back to the transformers CLIPVisionConfig
        # defaults, which coincide with this dataclass's.
        return cls(
            hidden_size=cfg.get("hidden_size", 768),
            num_hidden_layers=cfg.get("num_hidden_layers", 12),
            num_attention_heads=cfg.get("num_attention_heads", 12),
            intermediate_size=cfg.get("intermediate_size", 3072),
            image_size=cfg.get("image_size", 224),
            patch_size=cfg.get("patch_size", 32),
            projection_dim=cfg.get("projection_dim", 512),
            hidden_act=cfg.get("hidden_act", "quick_gelu"),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
        )


def convert_hf_vision_state_dict(state_dict: Mapping,
                                 config: CLIPVisionConfig) -> dict:
    sd = to_numpy_state_dict(state_dict)
    prefix = "vision_model."
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
        # conv2d patch kernel OIHW -> HWIO
        "patch_embedding": np.transpose(
            g("embeddings.patch_embedding.weight"), (2, 3, 1, 0)),
        "class_embedding": g("embeddings.class_embedding"),
        "position_embedding": g("embeddings.position_embedding.weight"),
        "pre_ln_scale": g("pre_layrnorm.weight"),
        "pre_ln_bias": g("pre_layrnorm.bias"),
        "layers": layers,
        "post_ln_scale": g("post_layernorm.weight"),
        "post_ln_bias": g("post_layernorm.bias"),
    }
    if "visual_projection.weight" in sd:
        params["visual_projection"] = np.swapaxes(
            sd["visual_projection.weight"], -1, -2)
    return jax.tree_util.tree_map(jnp.asarray, params)


def encode_image(params: dict, pixels: jnp.ndarray,
                 config: CLIPVisionConfig) -> jnp.ndarray:
    """pixels [B, H, W, 3] (already CLIP-normalized) -> image embeds
    [B, projection_dim] (pre-normalization)."""
    act = clip_text._act(config.hidden_act)
    eps = config.layer_norm_eps
    H = config.num_attention_heads
    B = pixels.shape[0]
    D = config.hidden_size

    patches = jax.lax.conv_general_dilated(
        pixels, params["patch_embedding"],
        window_strides=(config.patch_size, config.patch_size),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    patches = patches.reshape(B, -1, D)
    cls = jnp.broadcast_to(params["class_embedding"], (B, 1, D))
    x = jnp.concatenate([cls, patches], axis=1)
    T = x.shape[1]
    x = x + params["position_embedding"][:T]
    x = layer_norm(x, params["pre_ln_scale"], params["pre_ln_bias"], eps)
    Dh = D // H

    def layer(x, p):
        h = layer_norm(x, p["ln1_scale"], p["ln1_bias"], eps)
        q = (h @ p["q_w"] + p["q_b"]).reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        k = (h @ p["k_w"] + p["k_b"]).reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        v = (h @ p["v_w"] + p["v_b"]).reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        attn = dot_product_attention(q, k, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, T, D)
        x = x + attn @ p["o_w"] + p["o_b"]
        h = layer_norm(x, p["ln2_scale"], p["ln2_bias"], eps)
        x = x + act(h @ p["fc1_w"] + p["fc1_b"]) @ p["fc2_w"] + p["fc2_b"]
        return x, None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    pooled = layer_norm(x[:, 0], params["post_ln_scale"],
                        params["post_ln_bias"], eps)
    if "visual_projection" in params:
        pooled = pooled @ params["visual_projection"]
    return pooled


def preprocess_images(images: np.ndarray | jnp.ndarray,
                      image_size: int = 224) -> jnp.ndarray:
    """uint8 [B, H, W, 3] -> CLIP-normalized float [B, S, S, 3].

    Matches CLIPProcessor: resize shortest side (bicubic), center crop,
    rescale 1/255, normalize. For square inputs this is one resize.
    """
    # upload in the INPUT dtype (uint8 folders: 4x less H2D traffic than
    # a host-side fp32 cast — measured 7.5 s vs ~1.9 s per batch-64
    # 512px flush over the ~30 MB/s tunnel), convert on device
    x = jnp.asarray(images).astype(jnp.float32) / 255.0
    b, h, w, _ = x.shape
    if h != image_size or w != image_size:
        short = min(h, w)
        nh, nw = int(round(h * image_size / short)), int(round(w * image_size / short))
        x = jax.image.resize(x, (b, nh, nw, 3), method="bicubic")
        top, left = (nh - image_size) // 2, (nw - image_size) // 2
        x = x[:, top:top + image_size, left:left + image_size]
    return (x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD


@dataclasses.dataclass
class CLIPModel:
    """Dual-tower CLIP with the HF checkpoint's logit scale."""

    vision_params: dict
    vision_config: CLIPVisionConfig
    text_params: dict
    text_config: clip_text.CLIPTextConfig
    tokenizer: object
    logit_scale: float = 100.0
    # memoized text embeddings per label tuple (embed_texts)
    _text_cache: dict = dataclasses.field(default_factory=dict, init=False,
                                          repr=False)

    @classmethod
    def from_pretrained(cls, model_dir: str) -> "CLIPModel":
        from transformers import AutoTokenizer

        from uce_tpu.models.hf_loader import load_json, load_state_dict

        cfg = load_json(os.path.join(model_dir, "config.json"))
        tcfg = clip_text.CLIPTextConfig.from_hf(
            dict(cfg["text_config"],
                 projection_dim=cfg.get("projection_dim", 512)),
            diff_defaults=True)
        vcfg = CLIPVisionConfig.from_hf(
            dict(cfg["vision_config"],
                 projection_dim=cfg.get("projection_dim", 512)))
        sd = load_state_dict(model_dir, None, dtype=np.float32)
        text_sd = {k: v for k, v in sd.items()
                   if k.startswith("text_model.") or k == "text_projection.weight"}
        vis_sd = {k: v for k, v in sd.items()
                  if k.startswith("vision_model.") or k == "visual_projection.weight"}
        return cls(
            vision_params=convert_hf_vision_state_dict(vis_sd, vcfg),
            vision_config=vcfg,
            text_params=clip_text.convert_hf_state_dict(text_sd, tcfg),
            text_config=tcfg,
            tokenizer=AutoTokenizer.from_pretrained(model_dir),
            logit_scale=float(np.exp(sd.get("logit_scale", np.log(100.0)))),
        )

    def embed_texts(self, texts: Sequence[str]) -> jnp.ndarray:
        # Memoized per label tuple: zero-shot classification over an eval
        # folder calls this with the SAME few attribute strings for every
        # image batch — one text-encoder launch instead of one per flush.
        key = tuple(texts)
        cache = self._text_cache
        if key not in cache:
            from uce_tpu.edit.embeddings import tokenize_batch

            ids, _ = tokenize_batch(self.tokenizer, list(texts),
                                    self.text_config.max_position_embeddings)
            _, pooled, _ = clip_text.encode_tokens(
                self.text_params, jnp.asarray(ids), self.text_config)
            cache[key] = pooled
            if len(cache) > 64:  # arbitrary label sets: bound the cache
                cache.pop(next(iter(cache)))
        return cache[key]

    def embed_images(self, images) -> jnp.ndarray:
        return _jit_preprocess_encode(self.vision_config)(
            self.vision_params, jnp.asarray(images))

    def logits_per_image(self, images, texts: Sequence[str]) -> np.ndarray:
        img = self.embed_images(images)
        txt = self.embed_texts(texts)
        return np.asarray(_jit_similarity()(
            img, txt, jnp.float32(self.logit_scale)))

    def classify(self, images, candidate_labels: Sequence[str]) -> np.ndarray:
        """Zero-shot label index per image (argmax over candidates)."""
        logits = self.logits_per_image(images, list(candidate_labels))
        return logits.argmax(-1)
