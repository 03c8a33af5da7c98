"""SD 2.x-style end-to-end: gelu encoder, linear projections, v-prediction."""

import json
import os

import numpy as np
import pytest

from tests.snapshot import make_sd_snapshot


def make_sd2_snapshot(root):
    root = str(make_sd_snapshot(root))
    # encoder -> OpenCLIP-style gelu
    te = os.path.join(root, "text_encoder", "config.json")
    cfg = json.load(open(te))
    cfg["hidden_act"] = "gelu"
    json.dump(cfg, open(te, "w"))
    # unet -> linear projections, per-block heads
    up = os.path.join(root, "unet", "config.json")
    ucfg = json.load(open(up))
    ucfg["use_linear_projection"] = True
    ucfg["attention_head_dim"] = [2, 4]
    json.dump(ucfg, open(up, "w"))
    from safetensors.numpy import save_file

    from uce_tpu.models import unet as unet_mod

    save_file(
        unet_mod.init_state_dict(unet_mod.UNetConfig.from_hf(ucfg),
                                 np.random.default_rng(9)),
        os.path.join(root, "unet", "diffusion_pytorch_model.safetensors"))
    # scheduler -> DDIM v_prediction (SD 2.x-768 family)
    sp = os.path.join(root, "scheduler", "scheduler_config.json")
    json.dump({
        "_class_name": "DDIMScheduler",
        "beta_start": 0.00085, "beta_end": 0.012,
        "beta_schedule": "scaled_linear", "num_train_timesteps": 1000,
        "set_alpha_to_one": False, "steps_offset": 1,
        "prediction_type": "v_prediction",
    }, open(sp, "w"))
    return root


@pytest.fixture(scope="module")
def sd2_pipe(tmp_path_factory):
    import jax.numpy as jnp

    from uce_tpu.diffusion.pipeline import SDPipeline

    snap = make_sd2_snapshot(tmp_path_factory.mktemp("sd2"))
    return SDPipeline.from_pretrained(snap, dtype=jnp.float32)


def test_sd2_config_loaded(sd2_pipe):
    assert sd2_pipe.unet_config.use_linear_projection
    assert sd2_pipe.unet_config.attention_head_dim == (2, 4)
    assert sd2_pipe.text_config.hidden_act == "gelu"
    assert sd2_pipe.scheduler_config["prediction_type"] == "v_prediction"


def test_sd2_generation_v_prediction(sd2_pipe):
    imgs = sd2_pipe("a red fox", num_inference_steps=3, seed=5,
                    height=32, width=32)
    assert imgs.shape == (1, 32, 32, 3) and imgs.dtype == np.uint8
    again = sd2_pipe("a red fox", num_inference_steps=3, seed=5,
                     height=32, width=32)
    np.testing.assert_array_equal(imgs, again)


def test_sd2_edit_path(sd2_pipe, tmp_path):
    from uce_tpu.edit.sd import SDEditResources, run_erase
    from uce_tpu.models import sd_targets, unet as unet_mod

    flat = unet_mod.flatten_params(sd2_pipe.unet_params)
    targets = {k: np.asarray(v, np.float32).T for k, v in flat.items()
               if sd_targets.is_sd_cross_attn_kv(k)}
    res = SDEditResources(
        targets=targets, text_params=sd2_pipe.text_params,
        text_config=sd2_pipe.text_config, tokenizer=sd2_pipe.tokenizer)
    base = sd2_pipe("van gogh field", num_inference_steps=2, seed=1,
                    height=32, width=32)
    run_erase(res, ["van gogh"], ["art"], [], save_dir=str(tmp_path),
              exp_name="e2")
    sd2_pipe.load_uce_edits(str(tmp_path / "e2.safetensors"))
    edited = sd2_pipe("van gogh field", num_inference_steps=2, seed=1,
                      height=32, width=32)
    assert (base != edited).any()
