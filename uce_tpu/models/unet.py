"""SD / SDXL UNet2DConditionModel in JAX, NHWC, functional.

A faithful re-implementation of the diffusers UNet architecture (the
denoiser behind ``evalscripts/generate-images-sd.py`` and the hand-rolled
loops in ``evalscripts/debiasing_vl.py:128-143``), designed TPU-first:

  * NHWC layout end-to-end; conv kernels HWIO (converted once at load),
  * attention through ``uce_tpu.ops.attention`` (Pallas flash on TPU),
  * fp32 statistics in all norms; params castable to bf16 for inference,
  * parameters are a nested pytree that mirrors diffusers module paths
    exactly (``down_blocks.0.resnets.0.conv1.weight`` ...), so HF
    checkpoints and UCE safetensors overlays map 1:1.

Supports SD v1.x (cross_attention_dim 768), SD v2.x (1024,
use_linear_projection), and SDXL (2048, addition_embed_type='text_time',
per-block transformer depths).
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from uce_tpu.models.layers import (
    conv2d,
    conv_kernel,
    group_norm,
    group_norm_act,
    layer_norm,
    linear,
    linear_weight,
    silu,
    timestep_embedding,
)
from uce_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple = (320, 640, 1280, 1280)
    down_block_types: tuple = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D", "DownBlock2D",
    )
    up_block_types: tuple = (
        "UpBlock2D", "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
    )
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    # diffusers legacy: for SD UNets "attention_head_dim" is the HEAD COUNT
    attention_head_dim: int | tuple = 8
    transformer_layers_per_block: int | tuple = 1
    use_linear_projection: bool = False
    norm_num_groups: int = 32
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    addition_embed_type: str | None = None  # SDXL: "text_time"
    addition_time_embed_dim: int | None = None  # SDXL: 256
    projection_class_embeddings_input_dim: int | None = None  # SDXL: 2816

    @classmethod
    def from_hf(cls, cfg: Mapping) -> "UNetConfig":
        def tup(x):
            return tuple(x) if isinstance(x, (list, tuple)) else x

        return cls(
            in_channels=cfg.get("in_channels", 4),
            out_channels=cfg.get("out_channels", 4),
            block_out_channels=tuple(cfg["block_out_channels"]),
            down_block_types=tuple(cfg["down_block_types"]),
            up_block_types=tuple(cfg["up_block_types"]),
            layers_per_block=cfg.get("layers_per_block", 2),
            cross_attention_dim=cfg.get("cross_attention_dim", 768),
            attention_head_dim=tup(cfg.get("attention_head_dim", 8)),
            transformer_layers_per_block=tup(
                cfg.get("transformer_layers_per_block", 1)
            ),
            use_linear_projection=cfg.get("use_linear_projection", False),
            norm_num_groups=cfg.get("norm_num_groups", 32),
            flip_sin_to_cos=cfg.get("flip_sin_to_cos", True),
            freq_shift=cfg.get("freq_shift", 0.0),
            addition_embed_type=cfg.get("addition_embed_type"),
            addition_time_embed_dim=cfg.get("addition_time_embed_dim"),
            projection_class_embeddings_input_dim=cfg.get(
                "projection_class_embeddings_input_dim"
            ),
        )

    def heads(self, block_idx: int) -> int:
        a = self.attention_head_dim
        return a[block_idx] if isinstance(a, tuple) else a

    def tx_layers(self, block_idx: int) -> int:
        t = self.transformer_layers_per_block
        return t[block_idx] if isinstance(t, tuple) else t

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


SD14_UNET_CONFIG = UNetConfig()
SD21_UNET_CONFIG = UNetConfig(
    cross_attention_dim=1024,
    attention_head_dim=(5, 10, 20, 20),
    use_linear_projection=True,
)
SDXL_UNET_CONFIG = UNetConfig(
    block_out_channels=(320, 640, 1280),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
    cross_attention_dim=2048,
    attention_head_dim=(5, 10, 20),
    transformer_layers_per_block=(1, 2, 10),
    use_linear_projection=True,
    addition_embed_type="text_time",
    addition_time_embed_dim=256,
    projection_class_embeddings_input_dim=2816,
)


# ---------------------------------------------------------------------------
# forward blocks
# ---------------------------------------------------------------------------

def _resnet(p, x, temb, groups: int):
    h = group_norm_act(x, p["norm1"]["weight"], p["norm1"]["bias"], groups,
                       act="silu")
    h = conv2d(h, p["conv1"]["weight"], p["conv1"]["bias"])
    t = linear(silu(temb), p["time_emb_proj"]["weight"], p["time_emb_proj"]["bias"])
    h = h + t[:, None, None, :]
    h = group_norm_act(h, p["norm2"]["weight"], p["norm2"]["bias"], groups,
                       act="silu")
    h = conv2d(h, p["conv2"]["weight"], p["conv2"]["bias"])
    if "conv_shortcut" in p:
        x = conv2d(x, p["conv_shortcut"]["weight"], p["conv_shortcut"]["bias"],
                   padding=0)
    return x + h


def _split_skip() -> bool:
    """UCE_SPLIT_SKIP=1 routes up-block resnets through ``_resnet_split``
    (skip concat never materialized). Trace-time only; default off until
    the end-to-end bench A/B decides (docs/PERF.md)."""
    import os

    return os.environ.get("UCE_SPLIT_SKIP", "0") == "1"


def _conv_part(x, kernel, padding):
    """Bias-free conv half with fp32 accumulation exposed, so summing two
    channel-partition halves matches the single concat conv to fp32
    precision (one final rounding instead of one per half)."""
    pad = [(padding, padding), (padding, padding)]
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _resnet_split(p, x, res, temb, groups: int):
    """Up-block resnet over the channel concat [x, res] WITHOUT building
    the concat: GN stats are additive over the channel partition
    (group_norm_act_split) and conv-over-concat = sum of convs over the
    parts. Arithmetic identical to ``_resnet(concat)`` up to one fp32
    rounding; avoids one full activation write+read per up-block resnet.
    """
    from uce_tpu.models.layers import group_norm_act_split

    c1 = x.shape[-1]
    hx, hr = group_norm_act_split(
        (x, res), p["norm1"]["weight"], p["norm1"]["bias"], groups,
        act="silu")
    w1 = p["conv1"]["weight"]
    h32 = (_conv_part(hx, w1[:, :, :c1, :], 1)
           + _conv_part(hr, w1[:, :, c1:, :], 1))
    h = (h32 + p["conv1"]["bias"].astype(jnp.float32)).astype(x.dtype)
    t = linear(silu(temb), p["time_emb_proj"]["weight"],
               p["time_emb_proj"]["bias"])
    h = h + t[:, None, None, :]
    h = group_norm_act(h, p["norm2"]["weight"], p["norm2"]["bias"], groups,
                       act="silu")
    h = conv2d(h, p["conv2"]["weight"], p["conv2"]["bias"])
    ws = p["conv_shortcut"]["weight"]
    sc32 = (_conv_part(x, ws[:, :, :c1, :], 0)
            + _conv_part(res, ws[:, :, c1:, :], 0))
    sc = (sc32 + p["conv_shortcut"]["bias"].astype(jnp.float32)
          ).astype(x.dtype)
    return sc + h


def _attention(p, x, context, heads: int):
    """diffusers Attention: to_q/to_k/to_v (no bias), to_out.0 (bias).

    Projections are fused at trace time (QKV for self-attention, KV for
    cross-attention): the weight concat is loop-invariant, so XLA hoists
    it out of the denoising scan, and one [c, 3c] matmul tiles the MXU
    better than three [c, c] ones (320 -> 2.5 x 128-lane tiles).
    """
    from uce_tpu.ops.quant import concat_weights

    b, tq, d = x.shape
    ctx = x if context is None else context
    if context is None:
        wqkv = concat_weights([p["to_q"]["weight"], p["to_k"]["weight"],
                               p["to_v"]["weight"]])
    else:
        wqkv = None
    if wqkv is not None:
        q, k, v = jnp.split(linear(x, wqkv), 3, axis=-1)
    else:
        wkv = concat_weights([p["to_k"]["weight"], p["to_v"]["weight"]])
        q = linear(x, p["to_q"]["weight"])
        if wkv is not None:
            k, v = jnp.split(linear(ctx, wkv), 2, axis=-1)
        else:
            k = linear(ctx, p["to_k"]["weight"])
            v = linear(ctx, p["to_v"]["weight"])
    dh = q.shape[-1] // heads
    q = q.reshape(b, tq, heads, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, ctx.shape[1], heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, ctx.shape[1], heads, dh).transpose(0, 2, 1, 3)
    # 'auto': Pallas sd kernel for the long self-attentions (64x64
    # latents -> seq 4096), XLA for cross-attn and short sequences.
    # Quantized checkpoints also take the int8 QK^T contraction.
    from uce_tpu.ops.quant import is_quantized

    out = dot_product_attention(
        q, k, v, impl="auto", qk_int8=is_quantized(p["to_q"]["weight"]))
    w_o, b_o = p["to_out"]["0"]["weight"], p["to_out"]["0"]["bias"]
    import os

    if (os.environ.get("UCE_ATTN_OUT") == "einsum"
            and not isinstance(w_o, dict)):
        # A/B candidate for the structural head-merge relayout
        # (docs/PERF.md "copies bucket"): absorb the [B,H,S,D]->[B,S,C]
        # merge into the out-projection as a per-head contraction —
        # concat_h(O_h) @ W_o == sum_h O_h @ W_o[h*dh:(h+1)*dh] — so
        # layout assignment MAY feed the kernel's output layout straight
        # into the GEMM instead of materializing the {1,3,2,0} copy.
        return jnp.einsum("bhsd,hdc->bsc", out,
                          w_o.reshape(heads, dh, -1)) + b_o
    out = out.transpose(0, 2, 1, 3).reshape(b, tq, heads * dh)
    return linear(out, w_o, b_o)


def _geglu_ff(p, x):
    h = linear(x, p["net"]["0"]["proj"]["weight"], p["net"]["0"]["proj"]["bias"])
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * jax.nn.gelu(gate)
    return linear(h, p["net"]["2"]["weight"], p["net"]["2"]["bias"])


def _transformer_block(p, x, context, heads: int):
    x = x + _attention(p["attn1"], layer_norm(x, p["norm1"]["weight"],
                                              p["norm1"]["bias"]), None, heads)
    x = x + _attention(p["attn2"], layer_norm(x, p["norm2"]["weight"],
                                              p["norm2"]["bias"]), context, heads)
    x = x + _geglu_ff(p["ff"], layer_norm(x, p["norm3"]["weight"],
                                          p["norm3"]["bias"]))
    return x


def _spatial_transformer(p, x, context, heads: int, cfg: UNetConfig):
    """Transformer2DModel: GN -> proj_in -> blocks -> proj_out, residual."""
    b, h, w, c = x.shape
    residual = x
    x = group_norm_act(x, p["norm"]["weight"], p["norm"]["bias"],
                       cfg.norm_num_groups, eps=1e-6)
    if cfg.use_linear_projection:
        x = x.reshape(b, h * w, c)
        x = linear(x, p["proj_in"]["weight"], p["proj_in"]["bias"])
    else:
        x = conv2d(x, p["proj_in"]["weight"], p["proj_in"]["bias"], padding=0)
        x = x.reshape(b, h * w, c)
    blocks = p["transformer_blocks"]
    for i in range(len(blocks)):
        x = _transformer_block(blocks[str(i)], x, context, heads)
    if cfg.use_linear_projection:
        x = linear(x, p["proj_out"]["weight"], p["proj_out"]["bias"])
        x = x.reshape(b, h, w, c)
    else:
        x = x.reshape(b, h, w, c)
        x = conv2d(x, p["proj_out"]["weight"], p["proj_out"]["bias"], padding=0)
    return x + residual


def _downsample(p, x):
    return conv2d(x, p["conv"]["weight"], p["conv"]["bias"], stride=2)


def _upsample(p, x):
    b, h, w, c = x.shape
    x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
    return conv2d(x, p["conv"]["weight"], p["conv"]["bias"])


def deep_feature_shape(config: UNetConfig, batch: int, latent_h: int,
                       latent_w: int, cache_level: int = 1) -> tuple:
    """Shape of the DeepCache deep feature: the tensor entering up block
    ``n_blocks - cache_level`` (i.e. the output of the last skipped up
    block's upsampler). See ``apply``'s deep_feature/return_deep."""
    shift = cache_level - 1
    return (batch, latent_h >> shift, latent_w >> shift,
            config.block_out_channels[cache_level])


def apply(params: dict, sample: jnp.ndarray, timesteps: jnp.ndarray,
          encoder_hidden_states: jnp.ndarray, config: UNetConfig,
          added_cond: dict | None = None, *,
          deep_feature: jnp.ndarray | None = None,
          return_deep: bool = False,
          cache_level: int = 1):
    """UNet forward. sample [B,H,W,C_in] NHWC, timesteps [B] or scalar,
    encoder_hidden_states [B,T,D_text] -> noise prediction [B,H,W,C_out].

    added_cond (SDXL): {'text_embeds': [B,1280], 'time_ids': [B,6]}.

    DeepCache partial execution (Ma et al. 2023, arXiv:2312.00858 —
    exploits the temporal redundancy of the deep UNet levels across
    adjacent denoising steps; an inference-acceleration mode the
    reference does not have):

    * ``return_deep=True``: run the FULL forward and also return the
      feature entering up block ``n_blocks - cache_level`` (the deepest
      feature the shallow path consumes) -> ``(eps, deep)``.
    * ``deep_feature`` given: run only the SHALLOW path — conv_in, down
      blocks ``< cache_level`` (for their skip activations), then resume
      from ``deep_feature`` through up blocks ``>= n_blocks -
      cache_level`` and conv_out. The deep levels and mid block are
      skipped entirely.

    ``cache_level`` = number of down/up levels kept live (1 = only the
    full-resolution level). Both paths share the skip push/pop code, so
    feeding a same-step deep feature back reproduces the full forward
    exactly (tested in tests/test_fast_mode.py).
    """
    cfg = config
    n_blocks = len(cfg.up_block_types)
    shallow = deep_feature is not None
    if (shallow or return_deep) and not 1 <= cache_level < n_blocks:
        raise ValueError(f"cache_level must be in [1, {n_blocks - 1}]")
    if shallow and return_deep:
        raise ValueError("deep_feature and return_deep are exclusive")
    groups = cfg.norm_num_groups
    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

    # 1. time embedding
    t_emb = timestep_embedding(
        timesteps, cfg.block_out_channels[0],
        flip_sin_to_cos=cfg.flip_sin_to_cos, downscale_freq_shift=cfg.freq_shift,
    ).astype(sample.dtype)
    te = params["time_embedding"]
    emb = linear(t_emb, te["linear_1"]["weight"], te["linear_1"]["bias"])
    emb = linear(silu(emb), te["linear_2"]["weight"], te["linear_2"]["bias"])

    if cfg.addition_embed_type == "text_time":
        ac = added_cond or {}
        time_ids = ac["time_ids"]
        text_embeds = ac["text_embeds"]
        tid = timestep_embedding(
            time_ids.reshape(-1), cfg.addition_time_embed_dim,
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift,
        ).reshape(time_ids.shape[0], -1)
        add = jnp.concatenate([text_embeds, tid.astype(text_embeds.dtype)], -1)
        ae = params["add_embedding"]
        add = linear(add, ae["linear_1"]["weight"], ae["linear_1"]["bias"])
        add = linear(silu(add), ae["linear_2"]["weight"], ae["linear_2"]["bias"])
        emb = emb + add.astype(emb.dtype)

    ehs = encoder_hidden_states

    # 2. conv_in
    x = conv2d(sample, params["conv_in"]["weight"], params["conv_in"]["bias"])
    res_stack = [x]

    # 3. down blocks
    for bi, btype in enumerate(cfg.down_block_types):
        if shallow and bi >= cache_level:
            break
        bp = params["down_blocks"][str(bi)]
        has_attn = btype == "CrossAttnDownBlock2D"
        for li in range(cfg.layers_per_block):
            x = _resnet(bp["resnets"][str(li)], x, emb, groups)
            if has_attn:
                x = _spatial_transformer(
                    bp["attentions"][str(li)], x, ehs, cfg.heads(bi), cfg
                )
            res_stack.append(x)
        if "downsamplers" in bp:
            # on the shallow path, block cache_level-1's downsample output
            # would only feed a skipped up block — drop the conv too
            if shallow and bi == cache_level - 1:
                break
            x = _downsample(bp["downsamplers"]["0"], x)
            res_stack.append(x)

    deep_out = None
    if not shallow:
        # 4. mid block
        mp = params["mid_block"]
        x = _resnet(mp["resnets"]["0"], x, emb, groups)
        if "attentions" in mp:
            x = _spatial_transformer(
                mp["attentions"]["0"], x, ehs,
                cfg.heads(len(cfg.block_out_channels) - 1), cfg,
            )
        x = _resnet(mp["resnets"]["1"], x, emb, groups)

    # 5. up blocks
    for bi, btype in enumerate(cfg.up_block_types):
        if bi == n_blocks - cache_level:
            if return_deep:
                deep_out = x
            elif shallow:
                x = deep_feature
        elif shallow and bi < n_blocks - cache_level:
            continue
        bp = params["up_blocks"][str(bi)]
        has_attn = btype == "CrossAttnUpBlock2D"
        # reversed block index for per-block head counts
        rev = n_blocks - 1 - bi
        for li in range(cfg.layers_per_block + 1):
            res = res_stack.pop()
            rp = bp["resnets"][str(li)]
            from uce_tpu.ops.quant import is_quantized, is_weight_only

            if (_split_skip() and "conv_shortcut" in rp
                    and x.dtype == jnp.bfloat16
                    and not is_quantized(rp["conv1"]["weight"])
                    and not is_weight_only(rp["conv1"]["weight"])):
                x = _resnet_split(rp, x, res, emb, groups)
            else:
                x = jnp.concatenate([x, res], axis=-1)
                x = _resnet(rp, x, emb, groups)
            if has_attn:
                x = _spatial_transformer(
                    bp["attentions"][str(li)], x, ehs, cfg.heads(rev), cfg
                )
        if "upsamplers" in bp:
            x = _upsample(bp["upsamplers"]["0"], x)

    # 6. out
    x = group_norm_act(x, params["conv_norm_out"]["weight"],
                       params["conv_norm_out"]["bias"], groups, act="silu")
    x = conv2d(x, params["conv_out"]["weight"], params["conv_out"]["bias"])
    if return_deep:
        return x, deep_out
    return x


# ---------------------------------------------------------------------------
# parameter construction / conversion
# ---------------------------------------------------------------------------

def nest_state_dict(flat: Mapping[str, np.ndarray], dtype=None) -> dict:
    """Flat diffusers state dict -> nested pytree with converted layouts.

    Conversion rule by tensor rank: 4D conv kernels OIHW->HWIO, 2D linear
    weights [out,in]->[in,out]; 1D tensors pass through. ``dtype`` casts
    host-side before transfer (halves H2D bytes for bf16).
    """
    import ml_dtypes

    np_dtype = None
    if dtype is not None:
        np_dtype = np.dtype(
            ml_dtypes.bfloat16 if dtype == jnp.bfloat16 else dtype)
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        leaf = parts[-1]
        v = np.asarray(v)
        if leaf == "weight" and v.ndim == 4:
            v = conv_kernel(v)
        elif leaf == "weight" and v.ndim == 2:
            v = linear_weight(v)
        if np_dtype is not None and np.issubdtype(v.dtype, np.floating):
            v = v.astype(np_dtype)
        node[leaf] = jnp.asarray(v)
    return tree


def flatten_params(tree: Mapping, prefix: str = "") -> dict[str, jnp.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, Mapping):
            out.update(flatten_params(v, key))
        else:
            out[key] = v
    return out


def overlay_edits(params: dict, edits: Mapping[str, np.ndarray],
                  dtype=None) -> dict:
    """Apply UCE safetensors edits (diffusers flat keys, torch layouts) onto
    a nested param tree — the JAX analogue of load_state_dict(strict=False)
    (``evalscripts/generate-images-sd.py:17-19``).

    ``dtype``: activation/param dtype used when a float edit replaces a
    quantized (int8-dict) slot, where there is no float ``old.dtype`` to
    inherit; defaults to bfloat16."""
    edited = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree
    skipped = []
    for key, v in edits.items():
        parts = key.split(".")
        node = edited
        try:
            for p in parts[:-1]:
                node = node[p]
            leaf = parts[-1]
            old = node[leaf]
        except KeyError:
            skipped.append(key)  # strict=False semantics: ignore unknowns
            continue
        v = np.asarray(v, np.float32)
        if leaf == "weight" and v.ndim == 2:
            v = linear_weight(v)
        elif leaf == "weight" and v.ndim == 4:
            v = conv_kernel(v)
        if isinstance(old, dict):
            # quantized slot (ops/quant.py dict): the float edit replaces
            # it outright — the layer dispatch handles mixed trees
            payload = old.get("qint8", old.get("w8int"))
            if payload is None:
                # a module SUBTREE, not a quantized leaf — the key names
                # a module path without a parameter suffix; strict=False
                skipped.append(key)
                continue
            if v.shape != payload.shape:
                raise ValueError(
                    f"edit for '{key}' has shape {v.shape}, model expects "
                    f"{payload.shape}")
            node[leaf] = jnp.asarray(v, dtype=dtype or jnp.bfloat16)
        else:
            if v.shape != old.shape:
                raise ValueError(
                    f"edit for '{key}' has shape {v.shape}, model expects "
                    f"{old.shape}"
                )
            node[leaf] = jnp.asarray(v, dtype=old.dtype)
    if skipped:
        print(f"overlay_edits: skipped {len(skipped)} unknown keys "
              f"(e.g. {skipped[0]})")
    return edited


def init_state_dict(config: UNetConfig, rng: np.random.Generator,
                    scale: float = 0.02) -> dict[str, np.ndarray]:
    """Random flat state dict in diffusers naming/layout (tests, benches).

    Enumerates every parameter the architecture expects — this doubles as
    the documented HF-key contract for the loader.
    """
    cfg = config
    sd: dict[str, np.ndarray] = {}

    def conv(name, cin, cout, k=3):
        sd[name + ".weight"] = (rng.standard_normal((cout, cin, k, k)) * scale
                                ).astype(np.float32)
        sd[name + ".bias"] = np.zeros(cout, np.float32)

    def lin(name, cin, cout, bias=True):
        sd[name + ".weight"] = (rng.standard_normal((cout, cin)) * scale
                                ).astype(np.float32)
        if bias:
            sd[name + ".bias"] = np.zeros(cout, np.float32)

    def norm(name, c):
        sd[name + ".weight"] = np.ones(c, np.float32)
        sd[name + ".bias"] = np.zeros(c, np.float32)

    ted = cfg.time_embed_dim

    def resnet(name, cin, cout):
        norm(name + ".norm1", cin)
        conv(name + ".conv1", cin, cout)
        lin(name + ".time_emb_proj", ted, cout)
        norm(name + ".norm2", cout)
        conv(name + ".conv2", cout, cout)
        if cin != cout:
            conv(name + ".conv_shortcut", cin, cout, k=1)

    def tx(name, c, heads, depth):
        norm(name + ".norm", c)
        if cfg.use_linear_projection:
            lin(name + ".proj_in", c, c)
            lin(name + ".proj_out", c, c)
        else:
            conv(name + ".proj_in", c, c, k=1)
            conv(name + ".proj_out", c, c, k=1)
        for d in range(depth):
            b = f"{name}.transformer_blocks.{d}"
            norm(b + ".norm1", c)
            lin(b + ".attn1.to_q", c, c, bias=False)
            lin(b + ".attn1.to_k", c, c, bias=False)
            lin(b + ".attn1.to_v", c, c, bias=False)
            lin(b + ".attn1.to_out.0", c, c)
            norm(b + ".norm2", c)
            lin(b + ".attn2.to_q", c, c, bias=False)
            lin(b + ".attn2.to_k", cfg.cross_attention_dim, c, bias=False)
            lin(b + ".attn2.to_v", cfg.cross_attention_dim, c, bias=False)
            lin(b + ".attn2.to_out.0", c, c)
            norm(b + ".norm3", c)
            lin(b + ".ff.net.0.proj", c, c * 8)
            lin(b + ".ff.net.2", c * 4, c)

    conv("conv_in", cfg.in_channels, cfg.block_out_channels[0])
    lin("time_embedding.linear_1", cfg.block_out_channels[0], ted)
    lin("time_embedding.linear_2", ted, ted)
    if cfg.addition_embed_type == "text_time":
        lin("add_embedding.linear_1",
            cfg.projection_class_embeddings_input_dim, ted)
        lin("add_embedding.linear_2", ted, ted)

    cout_prev = cfg.block_out_channels[0]
    for bi, btype in enumerate(cfg.down_block_types):
        cout = cfg.block_out_channels[bi]
        for li in range(cfg.layers_per_block):
            cin = cout_prev if li == 0 else cout
            resnet(f"down_blocks.{bi}.resnets.{li}", cin, cout)
            if btype == "CrossAttnDownBlock2D":
                tx(f"down_blocks.{bi}.attentions.{li}", cout,
                   cfg.heads(bi), cfg.tx_layers(bi))
        if bi < len(cfg.down_block_types) - 1:
            conv(f"down_blocks.{bi}.downsamplers.0.conv", cout, cout)
        cout_prev = cout

    c_mid = cfg.block_out_channels[-1]
    resnet("mid_block.resnets.0", c_mid, c_mid)
    tx("mid_block.attentions.0", c_mid,
       cfg.heads(len(cfg.block_out_channels) - 1),
       cfg.tx_layers(len(cfg.block_out_channels) - 1))
    resnet("mid_block.resnets.1", c_mid, c_mid)

    rev_channels = list(reversed(cfg.block_out_channels))
    for bi, btype in enumerate(cfg.up_block_types):
        cout = rev_channels[bi]
        cin_block = rev_channels[min(bi + 1, len(rev_channels) - 1)]
        rev = len(cfg.up_block_types) - 1 - bi
        for li in range(cfg.layers_per_block + 1):
            # skip connection channel bookkeeping (diffusers UNetMidBlock walk)
            res_skip = rev_channels[bi] if li < cfg.layers_per_block else cin_block
            cin = (rev_channels[bi - 1] if bi > 0 and li == 0 else cout)
            resnet(f"up_blocks.{bi}.resnets.{li}", cin + res_skip, cout)
            if btype == "CrossAttnUpBlock2D":
                tx(f"up_blocks.{bi}.attentions.{li}", cout,
                   cfg.heads(rev), cfg.tx_layers(rev))
        if bi < len(cfg.up_block_types) - 1:
            conv(f"up_blocks.{bi}.upsamplers.0.conv", cout, cout)

    norm("conv_norm_out", cfg.block_out_channels[0])
    conv("conv_out", cfg.block_out_channels[0], cfg.out_channels)
    return sd


def init_params(config: UNetConfig, seed: int = 0) -> dict:
    return nest_state_dict(init_state_dict(config, np.random.default_rng(seed)))


def cast_params(params, dtype):
    """Cast floating-point leaves (bf16 inference; norms stay accurate via
    fp32 statistics inside the ops)."""
    def _cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, params)
