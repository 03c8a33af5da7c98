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


def _write_tokenizer(root, name, max_pos=16):
    vocab = _build_vocab()
    tok_dir = os.path.join(root, name)
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
    return vocab


def _write_clip_encoder(root, name, vocab, hidden, layers=2, heads=4,
                        max_pos=16, rng=None, projection_dim=None):
    te_dir = os.path.join(root, name)
    os.makedirs(te_dir, exist_ok=True)
    vocab_size = len(vocab)
    cfg = {
        "architectures": ["CLIPTextModelWithProjection"
                          if projection_dim else "CLIPTextModel"],
        "vocab_size": vocab_size, "hidden_size": hidden,
        "num_hidden_layers": layers, "num_attention_heads": heads,
        "intermediate_size": 2 * hidden, "max_position_embeddings": max_pos,
        "hidden_act": "quick_gelu", "layer_norm_eps": 1e-5,
        "bos_token_id": vocab["<|startoftext|>"],
        "eos_token_id": vocab["<|endoftext|>"],
    }
    if projection_dim:
        cfg["projection_dim"] = projection_dim
    with open(os.path.join(te_dir, "config.json"), "w") as f:
        json.dump(cfg, f)
    n = lambda *s: (rng.standard_normal(s) * 0.02).astype(np.float32)
    inter = 2 * hidden
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
    if projection_dim:
        sd["text_projection.weight"] = n(projection_dim, hidden)
    save_file(sd, os.path.join(te_dir, "model.safetensors"))


def _write_t5_encoder(root, name, vocab_size, d_model, rng, layers=2,
                      heads=4, d_kv=4, d_ff=32, buckets=8):
    te_dir = os.path.join(root, name)
    os.makedirs(te_dir, exist_ok=True)
    with open(os.path.join(te_dir, "config.json"), "w") as f:
        json.dump({
            "architectures": ["T5EncoderModel"], "model_type": "t5",
            "vocab_size": vocab_size, "d_model": d_model, "d_kv": d_kv,
            "d_ff": d_ff, "num_layers": layers, "num_heads": heads,
            "relative_attention_num_buckets": buckets,
            "relative_attention_max_distance": 16,
            "dense_act_fn": "relu", "is_gated_act": False,
            "layer_norm_epsilon": 1e-6,
        }, f)
    n = lambda *s: (rng.standard_normal(s) * 0.02).astype(np.float32)
    inner = heads * d_kv
    sd = {"shared.weight": n(vocab_size, d_model),
          "encoder.final_layer_norm.weight": np.ones(d_model, np.float32),
          "encoder.block.0.layer.0.SelfAttention"
          ".relative_attention_bias.weight": n(buckets, heads)}
    for i in range(layers):
        pre = f"encoder.block.{i}.layer."
        sd[pre + "0.layer_norm.weight"] = np.ones(d_model, np.float32)
        for k in ("q", "k", "v"):
            sd[pre + f"0.SelfAttention.{k}.weight"] = n(inner, d_model)
        sd[pre + "0.SelfAttention.o.weight"] = n(d_model, inner)
        sd[pre + "1.layer_norm.weight"] = np.ones(d_model, np.float32)
        sd[pre + "1.DenseReluDense.wi.weight"] = n(d_ff, d_model)
        sd[pre + "1.DenseReluDense.wo.weight"] = n(d_model, d_ff)
    save_file(sd, os.path.join(te_dir, "model.safetensors"))


def _write_llama_encoder(root, name, vocab_size, hidden, rng, layers=2,
                         heads=4, kv_heads=2, inter=32):
    te_dir = os.path.join(root, name)
    os.makedirs(te_dir, exist_ok=True)
    with open(os.path.join(te_dir, "config.json"), "w") as f:
        json.dump({
            "architectures": ["LlamaModel"], "model_type": "llama",
            "vocab_size": vocab_size, "hidden_size": hidden,
            "intermediate_size": inter, "num_hidden_layers": layers,
            "num_attention_heads": heads, "num_key_value_heads": kv_heads,
            "rms_norm_eps": 1e-6, "rope_theta": 10000.0,
            "max_position_embeddings": 64,
        }, f)
    n = lambda *s: (rng.standard_normal(s) * 0.02).astype(np.float32)
    dh = hidden // heads
    sd = {"model.embed_tokens.weight": n(vocab_size, hidden),
          "model.norm.weight": np.ones(hidden, np.float32)}
    for i in range(layers):
        pre = f"model.layers.{i}."
        sd[pre + "input_layernorm.weight"] = np.ones(hidden, np.float32)
        sd[pre + "post_attention_layernorm.weight"] = np.ones(
            hidden, np.float32)
        sd[pre + "self_attn.q_proj.weight"] = n(heads * dh, hidden)
        sd[pre + "self_attn.k_proj.weight"] = n(kv_heads * dh, hidden)
        sd[pre + "self_attn.v_proj.weight"] = n(kv_heads * dh, hidden)
        sd[pre + "self_attn.o_proj.weight"] = n(hidden, heads * dh)
        sd[pre + "mlp.gate_proj.weight"] = n(inter, hidden)
        sd[pre + "mlp.up_proj.weight"] = n(inter, hidden)
        sd[pre + "mlp.down_proj.weight"] = n(hidden, inter)
    save_file(sd, os.path.join(te_dir, "model.safetensors"))


def make_hidream_snapshot(root, seed=0):
    """Full tiny HiDream-I1 HF-format snapshot: DiT transformer + quad text
    encoders (CLIP-L, CLIP-G, T5, in-snapshot Llama as text_encoder_4) +
    16ch VAE + FlowMatch scheduler. Stream dims follow the real model's
    constraint that llama hidden == t5 d_model (both 4096 upstream)."""
    from uce_tpu.models import hidream as hd_mod, vae as vae_mod

    root = str(root)
    rng = np.random.default_rng(seed)
    d_stream = 16  # shared T5/llama caption dim

    vocab = _write_tokenizer(root, "tokenizer")
    for name in ("tokenizer_2", "tokenizer_3", "tokenizer_4"):
        _write_tokenizer(root, name)
    _write_clip_encoder(root, "text_encoder", vocab, hidden=16, rng=rng,
                        projection_dim=16)
    _write_clip_encoder(root, "text_encoder_2", vocab, hidden=20, rng=rng,
                        projection_dim=20)
    _write_t5_encoder(root, "text_encoder_3", len(vocab), d_stream, rng)
    _write_llama_encoder(root, "text_encoder_4", len(vocab), d_stream, rng)
    # real Llama snapshots ship their own tokenizer files next to the
    # weights (the reference loads both from meta-llama/...-Instruct)
    _write_tokenizer(root, "text_encoder_4")

    tr_cfg_hf = {
        "_class_name": "HiDreamImageTransformer2DModel",
        "patch_size": 2, "in_channels": 4, "out_channels": 4,
        "num_layers": 1, "num_single_layers": 1,
        "attention_head_dim": 8, "num_attention_heads": 4,
        "caption_channels": [d_stream, d_stream], "text_emb_dim": 36,
        "num_routed_experts": 2, "num_activated_experts": 1,
        "axes_dims_rope": [4, 2, 2], "llama_layers": [0, 1],
        "ffn_multiple_of": 8,
    }
    tr_dir = os.path.join(root, "transformer")
    os.makedirs(tr_dir, exist_ok=True)
    with open(os.path.join(tr_dir, "config.json"), "w") as f:
        json.dump(tr_cfg_hf, f)
    tcfg = hd_mod.HiDreamConfig.from_hf(tr_cfg_hf)
    save_file(hd_mod.init_state_dict(tcfg, rng, scale=0.1),
              os.path.join(tr_dir, "diffusion_pytorch_model.safetensors"))

    vae_cfg_hf = {
        "_class_name": "AutoencoderKL",
        "in_channels": 3, "out_channels": 3, "latent_channels": 4,
        "block_out_channels": [8, 16], "layers_per_block": 1,
        "norm_num_groups": 4, "scaling_factor": 0.3611,
        "shift_factor": 0.1159,
    }
    vae_dir = os.path.join(root, "vae")
    os.makedirs(vae_dir, exist_ok=True)
    with open(os.path.join(vae_dir, "config.json"), "w") as f:
        json.dump(vae_cfg_hf, f)
    save_file(vae_mod.init_state_dict(vae_mod.VAEConfig.from_hf(vae_cfg_hf),
                                      rng),
              os.path.join(vae_dir, "diffusion_pytorch_model.safetensors"))

    sch_dir = os.path.join(root, "scheduler")
    os.makedirs(sch_dir, exist_ok=True)
    with open(os.path.join(sch_dir, "scheduler_config.json"), "w") as f:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "shift": 3.0}, f)
    return root


def make_flux_snapshot(root, seed=0):
    """Full tiny FLUX HF-format snapshot: joint-transformer DiT + CLIP-L
    (text_encoder, pooled) + T5 (text_encoder_2) + 16ch-style VAE +
    FlowMatch scheduler — the directory layout FluxPipeline.from_pretrained
    expects (mirrors black-forest-labs/FLUX.1-schnell)."""
    from uce_tpu.models import flux as flux_mod, vae as vae_mod

    root = str(root)
    rng = np.random.default_rng(seed)
    d_t5 = 16

    vocab = _write_tokenizer(root, "tokenizer")
    _write_tokenizer(root, "tokenizer_2")
    _write_clip_encoder(root, "text_encoder", vocab, hidden=24, rng=rng,
                        projection_dim=24)
    _write_t5_encoder(root, "text_encoder_2", len(vocab), d_t5, rng)

    tr_cfg_hf = {
        "_class_name": "FluxTransformer2DModel",
        "in_channels": 16, "num_layers": 1, "num_single_layers": 1,
        "attention_head_dim": 8, "num_attention_heads": 4,
        "joint_attention_dim": d_t5, "pooled_projection_dim": 24,
        "guidance_embeds": False, "axes_dims_rope": [4, 2, 2],
    }
    tr_dir = os.path.join(root, "transformer")
    os.makedirs(tr_dir, exist_ok=True)
    with open(os.path.join(tr_dir, "config.json"), "w") as f:
        json.dump(tr_cfg_hf, f)
    tcfg = flux_mod.FluxConfig.from_hf(tr_cfg_hf)
    save_file(flux_mod.init_state_dict(tcfg, rng, scale=0.3),
              os.path.join(tr_dir, "diffusion_pytorch_model.safetensors"))

    vae_cfg_hf = {
        "_class_name": "AutoencoderKL",
        "in_channels": 3, "out_channels": 3, "latent_channels": 4,
        "block_out_channels": [8, 16], "layers_per_block": 1,
        "norm_num_groups": 4, "scaling_factor": 0.3611,
        "shift_factor": 0.1159,
    }
    vae_dir = os.path.join(root, "vae")
    os.makedirs(vae_dir, exist_ok=True)
    with open(os.path.join(vae_dir, "config.json"), "w") as f:
        json.dump(vae_cfg_hf, f)
    save_file(vae_mod.init_state_dict(vae_mod.VAEConfig.from_hf(vae_cfg_hf),
                                      rng),
              os.path.join(vae_dir, "diffusion_pytorch_model.safetensors"))

    sch_dir = os.path.join(root, "scheduler")
    os.makedirs(sch_dir, exist_ok=True)
    with open(os.path.join(sch_dir, "scheduler_config.json"), "w") as f:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "shift": 1.0}, f)
    return root


def make_clip_snapshot(root, seed=0):
    """Tiny full CLIP (vision+text) HF-format snapshot for
    ``uce_tpu.models.clip.CLIPModel.from_pretrained`` — the classifier
    model the debias loop and the eval CLIs load
    (openai/clip-vit-base-patch32 in the reference,
    ``uce_sd_debias.py:245-250``). Tokenizer files live at the root,
    where AutoTokenizer looks for a composite CLIP checkpoint."""
    root = str(root)
    rng = np.random.default_rng(seed)
    vocab = _write_tokenizer(root, "")
    D, L, I, P = 16, 2, 32, 12
    text_cfg = {
        "vocab_size": len(vocab), "hidden_size": D,
        "num_hidden_layers": L, "num_attention_heads": 2,
        "intermediate_size": I, "max_position_embeddings": 16,
        "hidden_act": "quick_gelu", "layer_norm_eps": 1e-5,
        "bos_token_id": vocab["<|startoftext|>"],
        "eos_token_id": vocab["<|endoftext|>"],
    }
    vision_cfg = {
        "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": 2, "intermediate_size": I,
        "image_size": 32, "patch_size": 16,
        "hidden_act": "quick_gelu", "layer_norm_eps": 1e-5,
    }
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({"architectures": ["CLIPModel"], "model_type": "clip",
                   "projection_dim": P, "logit_scale_init_value": 2.6592,
                   "text_config": text_cfg, "vision_config": vision_cfg}, f)

    n = lambda *s: (rng.standard_normal(s) * 0.05).astype(np.float32)
    sd = {
        "logit_scale": np.full((), 2.6592, np.float32),
        "text_projection.weight": n(P, D),
        "visual_projection.weight": n(P, D),
        "text_model.embeddings.token_embedding.weight": n(len(vocab), D),
        "text_model.embeddings.position_embedding.weight": n(16, D),
        "text_model.final_layer_norm.weight": np.ones(D, np.float32),
        "text_model.final_layer_norm.bias": np.zeros(D, np.float32),
        "vision_model.embeddings.patch_embedding.weight": n(D, 3, 16, 16),
        "vision_model.embeddings.class_embedding": n(D),
        "vision_model.embeddings.position_embedding.weight": n(2 * 2 + 1, D),
        "vision_model.pre_layrnorm.weight": np.ones(D, np.float32),
        "vision_model.pre_layrnorm.bias": np.zeros(D, np.float32),
        "vision_model.post_layernorm.weight": np.ones(D, np.float32),
        "vision_model.post_layernorm.bias": np.zeros(D, np.float32),
    }
    for tower in ("text_model", "vision_model"):
        for i in range(L):
            pre = f"{tower}.encoder.layers.{i}."
            for ln in ("layer_norm1", "layer_norm2"):
                sd[pre + ln + ".weight"] = np.ones(D, np.float32)
                sd[pre + ln + ".bias"] = np.zeros(D, np.float32)
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                sd[pre + f"self_attn.{proj}.weight"] = n(D, D)
                sd[pre + f"self_attn.{proj}.bias"] = np.zeros(D, np.float32)
            sd[pre + "mlp.fc1.weight"] = n(I, D)
            sd[pre + "mlp.fc1.bias"] = np.zeros(I, np.float32)
            sd[pre + "mlp.fc2.weight"] = n(D, I)
            sd[pre + "mlp.fc2.bias"] = np.zeros(D, np.float32)
    save_file(sd, os.path.join(root, "model.safetensors"))
    return root
