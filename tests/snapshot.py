"""Build a tiny but structurally valid HF SD snapshot directory for tests.

Layout matches what ``uce_tpu.edit.sd.load_resources`` / diffusers expect:
  text_encoder/{config.json, model.safetensors}
  tokenizer/{vocab.json, merges.txt, special_tokens_map.json, tokenizer_config.json}
  unet/{config.json, diffusion_pytorch_model.safetensors}

The tokenizer is a real ``transformers.CLIPTokenizer`` with a character
vocabulary, so the BPE code paths (bos/eos, padding, truncation,
attention_mask) behave exactly like the full 49k-token one.
"""

import json
import os
import string

import numpy as np
from safetensors.numpy import save_file


def _build_vocab():
    chars = list(string.ascii_lowercase + string.digits + "'-")
    vocab = {}
    for ch in chars:
        vocab[ch] = len(vocab)
    for ch in chars:
        vocab[ch + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    return vocab


def make_sd_snapshot(root, hidden=32, layers=2, heads=4, inter=64, max_pos=16,
                     seed=0):
    root = str(root)
    vocab = _build_vocab()
    vocab_size = len(vocab)
    eos_id = vocab["<|endoftext|>"]
    bos_id = vocab["<|startoftext|>"]

    # tokenizer/
    tok_dir = os.path.join(root, "tokenizer")
    os.makedirs(tok_dir, exist_ok=True)
    with open(os.path.join(tok_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(tok_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    with open(os.path.join(tok_dir, "special_tokens_map.json"), "w") as f:
        json.dump({
            "bos_token": "<|startoftext|>",
            "eos_token": "<|endoftext|>",
            "pad_token": "<|endoftext|>",
            "unk_token": "<|endoftext|>",
        }, f)
    with open(os.path.join(tok_dir, "tokenizer_config.json"), "w") as f:
        json.dump({
            "tokenizer_class": "CLIPTokenizer",
            "model_max_length": max_pos,
        }, f)

    # text_encoder/ — random weights in HF CLIPTextModel naming
    te_dir = os.path.join(root, "text_encoder")
    os.makedirs(te_dir, exist_ok=True)
    cfg = {
        "architectures": ["CLIPTextModel"],
        "vocab_size": vocab_size,
        "hidden_size": hidden,
        "num_hidden_layers": layers,
        "num_attention_heads": heads,
        "intermediate_size": inter,
        "max_position_embeddings": max_pos,
        "hidden_act": "quick_gelu",
        "layer_norm_eps": 1e-5,
        "bos_token_id": bos_id,
        "eos_token_id": eos_id,
        "projection_dim": hidden,
    }
    with open(os.path.join(te_dir, "config.json"), "w") as f:
        json.dump(cfg, f)
    rng = np.random.default_rng(seed)
    n = lambda *s: (rng.standard_normal(s) * 0.02).astype(np.float32)
    sd = {
        "text_model.embeddings.token_embedding.weight": n(vocab_size, hidden),
        "text_model.embeddings.position_embedding.weight": n(max_pos, hidden),
        "text_model.final_layer_norm.weight": np.ones(hidden, np.float32),
        "text_model.final_layer_norm.bias": np.zeros(hidden, np.float32),
    }
    for i in range(layers):
        pre = f"text_model.encoder.layers.{i}."
        for ln in ("layer_norm1", "layer_norm2"):
            sd[pre + ln + ".weight"] = np.ones(hidden, np.float32)
            sd[pre + ln + ".bias"] = np.zeros(hidden, np.float32)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[pre + f"self_attn.{proj}.weight"] = n(hidden, hidden)
            sd[pre + f"self_attn.{proj}.bias"] = np.zeros(hidden, np.float32)
        sd[pre + "mlp.fc1.weight"] = n(inter, hidden)
        sd[pre + "mlp.fc1.bias"] = np.zeros(inter, np.float32)
        sd[pre + "mlp.fc2.weight"] = n(hidden, inter)
        sd[pre + "mlp.fc2.bias"] = np.zeros(hidden, np.float32)
    save_file(sd, os.path.join(te_dir, "model.safetensors"))

    # unet/ — a full tiny UNet2DConditionModel
    from uce_tpu.models import unet as unet_mod, vae as vae_mod

    unet_cfg_hf = {
        "_class_name": "UNet2DConditionModel",
        "in_channels": 4,
        "out_channels": 4,
        "block_out_channels": [8, 16],
        "down_block_types": ["CrossAttnDownBlock2D", "DownBlock2D"],
        "up_block_types": ["UpBlock2D", "CrossAttnUpBlock2D"],
        "layers_per_block": 1,
        "cross_attention_dim": hidden,
        "attention_head_dim": 2,
        "norm_num_groups": 4,
    }
    unet_dir = os.path.join(root, "unet")
    os.makedirs(unet_dir, exist_ok=True)
    with open(os.path.join(unet_dir, "config.json"), "w") as f:
        json.dump(unet_cfg_hf, f)
    ucfg = unet_mod.UNetConfig.from_hf(unet_cfg_hf)
    unet_sd = unet_mod.init_state_dict(ucfg, rng)
    save_file(unet_sd, os.path.join(unet_dir, "diffusion_pytorch_model.safetensors"))

    # vae/
    vae_cfg_hf = {
        "_class_name": "AutoencoderKL",
        "in_channels": 3, "out_channels": 3, "latent_channels": 4,
        "block_out_channels": [8, 16], "layers_per_block": 1,
        "norm_num_groups": 4, "scaling_factor": 0.18215,
    }
    vae_dir = os.path.join(root, "vae")
    os.makedirs(vae_dir, exist_ok=True)
    with open(os.path.join(vae_dir, "config.json"), "w") as f:
        json.dump(vae_cfg_hf, f)
    vcfg = vae_mod.VAEConfig.from_hf(vae_cfg_hf)
    save_file(vae_mod.init_state_dict(vcfg, rng),
              os.path.join(vae_dir, "diffusion_pytorch_model.safetensors"))

    # scheduler/
    sch_dir = os.path.join(root, "scheduler")
    os.makedirs(sch_dir, exist_ok=True)
    with open(os.path.join(sch_dir, "scheduler_config.json"), "w") as f:
        json.dump({
            "_class_name": "PNDMScheduler",
            "beta_start": 0.00085, "beta_end": 0.012,
            "beta_schedule": "scaled_linear",
            "num_train_timesteps": 1000,
            "set_alpha_to_one": False, "steps_offset": 1,
            "skip_prk_steps": True,
        }, f)
    return root
