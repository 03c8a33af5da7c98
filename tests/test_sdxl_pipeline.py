"""SDXL dual-encoder pipeline test on a tiny snapshot."""

import json
import os
import shutil

import numpy as np
import pytest

from tests.snapshot import make_sd_snapshot


def make_sdxl_snapshot(root):
    root = str(make_sd_snapshot(root, hidden=24))
    # second encoder: hidden 16, with projection -> pooled dim 16
    from safetensors.numpy import save_file

    te2 = os.path.join(root, "text_encoder_2")
    os.makedirs(te2, exist_ok=True)
    cfg = json.load(open(os.path.join(root, "text_encoder", "config.json")))
    cfg2 = dict(cfg, hidden_size=16, intermediate_size=32,
                num_attention_heads=4, projection_dim=16,
                architectures=["CLIPTextModelWithProjection"])
    json.dump(cfg2, open(os.path.join(te2, "config.json"), "w"))
    rng = np.random.default_rng(7)
    n = lambda *s: (rng.standard_normal(s) * 0.02).astype(np.float32)
    sd = {
        "text_model.embeddings.token_embedding.weight": n(cfg2["vocab_size"], 16),
        "text_model.embeddings.position_embedding.weight": n(16, 16),
        "text_model.final_layer_norm.weight": np.ones(16, np.float32),
        "text_model.final_layer_norm.bias": np.zeros(16, np.float32),
        "text_projection.weight": n(16, 16),
    }
    for i in range(cfg2["num_hidden_layers"]):
        pre = f"text_model.encoder.layers.{i}."
        for ln in ("layer_norm1", "layer_norm2"):
            sd[pre + ln + ".weight"] = np.ones(16, np.float32)
            sd[pre + ln + ".bias"] = np.zeros(16, np.float32)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[pre + f"self_attn.{proj}.weight"] = n(16, 16)
            sd[pre + f"self_attn.{proj}.bias"] = np.zeros(16, np.float32)
        sd[pre + "mlp.fc1.weight"] = n(32, 16)
        sd[pre + "mlp.fc1.bias"] = np.zeros(32, np.float32)
        sd[pre + "mlp.fc2.weight"] = n(16, 32)
        sd[pre + "mlp.fc2.bias"] = np.zeros(16, np.float32)
    save_file(sd, os.path.join(te2, "model.safetensors"))
    shutil.copytree(os.path.join(root, "tokenizer"),
                    os.path.join(root, "tokenizer_2"))

    # SDXL-flavored unet: cross_attention_dim 24+16=40, text_time embeds
    from uce_tpu.models import unet as unet_mod

    unet_cfg = {
        "_class_name": "UNet2DConditionModel",
        "in_channels": 4, "out_channels": 4,
        "block_out_channels": [8, 16],
        "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D"],
        "up_block_types": ["CrossAttnUpBlock2D", "UpBlock2D"],
        "layers_per_block": 1,
        "cross_attention_dim": 40,
        "attention_head_dim": [2, 4],
        "transformer_layers_per_block": [1, 2],
        "use_linear_projection": True,
        "norm_num_groups": 4,
        "addition_embed_type": "text_time",
        "addition_time_embed_dim": 8,
        "projection_class_embeddings_input_dim": 16 + 8 * 6,
    }
    unet_dir = os.path.join(root, "unet")
    json.dump(unet_cfg, open(os.path.join(unet_dir, "config.json"), "w"))
    ucfg = unet_mod.UNetConfig.from_hf(unet_cfg)
    save_file(unet_mod.init_state_dict(ucfg, np.random.default_rng(3)),
              os.path.join(unet_dir, "diffusion_pytorch_model.safetensors"))
    return root


@pytest.fixture(scope="module")
def sdxl_pipe(tmp_path_factory):
    import jax.numpy as jnp

    from uce_tpu.diffusion.pipeline import SDPipeline

    snap = make_sdxl_snapshot(tmp_path_factory.mktemp("sdxl"))
    return SDPipeline.from_pretrained(snap, dtype=jnp.float32)


def test_sdxl_detected(sdxl_pipe):
    assert sdxl_pipe.is_sdxl
    ctx, pooled = sdxl_pipe.encode_prompts_sdxl(["a cat"])
    assert ctx.shape == (1, 16, 40)  # 24 + 16 concat at seq 16
    assert pooled.shape == (1, 16)


def test_sdxl_generation(sdxl_pipe):
    imgs = sdxl_pipe("a cat", num_inference_steps=2, seed=5, height=32,
                     width=32, scheduler="euler")
    assert imgs.shape == (1, 32, 32, 3) and imgs.dtype == np.uint8
    imgs2 = sdxl_pipe("a dog", num_inference_steps=2, seed=5, height=32,
                      width=32, scheduler="euler")
    assert (imgs != imgs2).any()


def test_sdxl_edit_path(sdxl_pipe, tmp_path_factory, tmp_path):
    from uce_tpu.edit import sd as edit_sd

    snap = make_sdxl_snapshot(tmp_path_factory.mktemp("sdxl2"))
    res = edit_sd.load_resources(snap, family="sdxl")
    edited = edit_sd.run_erase(res, ["van gogh"], ["art"], [],
                               save_dir=str(tmp_path), exp_name="x")
    # every edited weight has the 2048-analog (40) input dim
    for k, v in edited.items():
        assert v.shape[-1] == 40


def test_sdxl_debias_loop(sdxl_pipe, tmp_path):
    """run_debias derives dual-encoder resources from an SDXL pipeline."""
    import numpy as np

    from uce_tpu.edit.debias import DebiasSettings, run_debias

    class StubClip:
        def classify(self, images, labels):
            return np.arange(images.shape[0]) % len(labels)

    weights, acc, history = run_debias(
        sdxl_pipe, StubClip(), ["doctor"], ["male", "female"],
        settings=DebiasSettings(num_images_per_prompt=2,
                                num_inference_steps=2, max_iterations=1),
        save_dir=str(tmp_path), exp_name="xdl", image_size=32, verbose=False)
    # every edited weight has the dual-encoder input dim (24 + 16 = 40)
    for k, v in weights.items():
        assert v.shape[-1] == 40, k


def test_sdxl_fast_full_window_noop_is_bitwise(sdxl_pipe):
    """SDXL threads added_cond through the fast path; a no-op window +
    cache=1 must share the exact program bitwise."""
    from uce_tpu.diffusion.sampler import FastConfig

    kw = dict(num_inference_steps=3, seed=5, height=32, width=32,
              scheduler="ddim", guidance_scale=7.5)
    base = sdxl_pipe("a cat", **kw)
    noop = sdxl_pipe("a cat", fast=FastConfig(cfg_interval=None,
                                              cache_interval=1), **kw)
    np.testing.assert_array_equal(base, noop)


def test_sdxl_fast_window_and_cache_run(sdxl_pipe):
    """CFG window + DeepCache on SDXL: the cond-only segments must slice
    the added conditioning (text_embeds/time_ids) along with context —
    a shape mismatch there fails at trace time."""
    from uce_tpu.diffusion.sampler import FastConfig

    kw = dict(num_inference_steps=4, seed=5, height=32, width=32,
              scheduler="ddim", guidance_scale=7.5)
    base = sdxl_pipe("a cat", **kw)
    fast = sdxl_pipe("a cat", fast=FastConfig(cfg_interval=(1, 3),
                                              cache_interval=2), **kw)
    assert fast.shape == base.shape and fast.dtype == np.uint8
    assert (fast != base).any()
    again = sdxl_pipe("a cat", fast=FastConfig(cfg_interval=(1, 3),
                                               cache_interval=2), **kw)
    np.testing.assert_array_equal(fast, again)
