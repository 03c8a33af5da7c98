"""On-chip timing for ONE debias iteration at SD v1.4 scale.

The debias loop is the reference's wall-clock king (SURVEY §3.2: up to
30 x N_concepts x 10 images x 20 steps x 2 CFG UNet forwards plus a CLIP
zero-shot classify per iteration — ``uce_sd_debias.py:95-141``). This tool
measures the TPU rebuild's cost per iteration with the real per-phase
breakdown: generate (10 images x 20 steps, 512^2, CFG 7.5) -> classify
(JAX CLIP ViT-B/32 zero-shot) -> re-solve (collapsed edit matrix).

Runs on real-shape RANDOM weights (timing is value-independent; no model
download exists in this environment) constructed in memory — writing an
SD1.4-scale snapshot to disk first would add GBs of IO for nothing.

Prints one JSON line:
  {"metric": "debias_sd14_iteration_s", "value": S, "unit": "s/iter",
   "parts": {"generate_s": g, "classify_s": c, "solve_s": s},
   "compile_s": first-iteration wall-clock (one-time)}

Assumes a live TPU backend (bench.py's orchestrator handles tunnel
flakes for the headline; this secondary tool is run attended).
Usage: python tools/debias_bench.py [--tiny] [--images 10] [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_pipeline(tiny: bool, dtype_name: str = "bfloat16"):
    """SD v1.4-scale SDPipeline with random weights, in memory."""
    import jax.numpy as jnp
    import numpy as np

    from tests.helpers import ToyTokenizer
    from uce_tpu.diffusion.pipeline import SDPipeline
    from uce_tpu.models import clip_text, unet as unet_mod, vae as vae_mod

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype_name]
    if tiny:
        ucfg = unet_mod.UNetConfig(
            block_out_channels=(8, 16),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            layers_per_block=1, cross_attention_dim=32,
            attention_head_dim=2, norm_num_groups=4)
        vcfg = vae_mod.VAEConfig(block_out_channels=(8, 16),
                                 layers_per_block=1, norm_num_groups=4)
        tcfg = clip_text.CLIPTextConfig(
            vocab_size=99, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=16, eos_token_id=98)
    else:
        ucfg = unet_mod.SD14_UNET_CONFIG
        vcfg = vae_mod.SD_VAE_CONFIG
        # Real CLIP-L/14-text compute shape (SD v1.4's encoder: hidden 768,
        # 12 layers, 77 positions); only the vocab is tiny — the embedding
        # LOOKUP is the single value-dependent, compute-trivial difference.
        tcfg = clip_text.CLIPTextConfig(
            vocab_size=99, hidden_size=768, num_hidden_layers=12,
            num_attention_heads=12, intermediate_size=3072,
            max_position_embeddings=77, eos_token_id=98)
    rng = np.random.default_rng(0)
    pipe = SDPipeline(
        unet_params=unet_mod.nest_state_dict(
            unet_mod.init_state_dict(ucfg, rng), dtype),
        unet_config=ucfg,
        text_params=clip_text.init_params(rng, tcfg),
        text_config=tcfg,
        tokenizer=ToyTokenizer(),
        vae_params=unet_mod.nest_state_dict(
            vae_mod.init_state_dict(vcfg, rng), dtype),
        vae_config=vcfg,
        scheduler_config={"_class_name": "PNDMScheduler"},
        dtype=dtype,
    )
    return pipe


def build_sdxl_pipeline(tiny: bool = False, dtype_name: str = "bfloat16"):
    """SDXL-scale SDPipeline with random weights, in memory.

    The UNet and VAE run at real SDXL scale (the perturbation a fast
    spec induces depends on the denoiser); the two text encoders are
    REAL-WIDTH but 2-layer — exact-vs-fast probes share identical
    conditioning, so encoder depth cancels, and a full CLIP-G would
    cost ~3 GB of host init + tunnel upload for nothing."""
    import jax.numpy as jnp
    import numpy as np

    from tests.helpers import ToyTokenizer
    from uce_tpu.diffusion.pipeline import SDPipeline
    from uce_tpu.models import clip_text, unet as unet_mod, vae as vae_mod

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype_name]
    if tiny:
        ucfg = unet_mod.UNetConfig(
            block_out_channels=(8, 16),
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
            layers_per_block=1, cross_attention_dim=40,
            attention_head_dim=(2, 4),
            transformer_layers_per_block=(1, 2),
            use_linear_projection=True, norm_num_groups=4,
            addition_embed_type="text_time", addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=16 + 8 * 6)
        vcfg = vae_mod.VAEConfig(block_out_channels=(8, 16),
                                 layers_per_block=1, norm_num_groups=4)
        d1, d2 = 24, 16
    else:
        ucfg = unet_mod.SDXL_UNET_CONFIG
        vcfg = vae_mod.SD_VAE_CONFIG
        d1, d2 = 768, 1280
    tcfg = clip_text.CLIPTextConfig(
        vocab_size=99, hidden_size=d1, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=2 * d1,
        max_position_embeddings=77, eos_token_id=98)
    tcfg2 = clip_text.CLIPTextConfig(
        vocab_size=99, hidden_size=d2, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=2 * d2,
        max_position_embeddings=77, eos_token_id=98, projection_dim=d2)
    rng = np.random.default_rng(0)
    return SDPipeline(
        unet_params=unet_mod.nest_state_dict(
            unet_mod.init_state_dict(ucfg, rng), dtype),
        unet_config=ucfg,
        text_params=clip_text.init_params(rng, tcfg), text_config=tcfg,
        tokenizer=ToyTokenizer(),
        text_params_2=clip_text.init_params(rng, tcfg2),
        text_config_2=tcfg2, tokenizer_2=ToyTokenizer(),
        vae_params=unet_mod.nest_state_dict(
            vae_mod.init_state_dict(vcfg, rng), dtype),
        vae_config=vcfg,
        scheduler_config={"_class_name": "PNDMScheduler"},
        dtype=dtype,
    )


def _random_vision_sd(cfg, rng):
    """Flat HF-format ViT state dict for convert_hf_vision_state_dict."""
    import numpy as np

    D, L, I = cfg.hidden_size, cfg.num_hidden_layers, cfg.intermediate_size
    n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
    sd = {
        "embeddings.patch_embedding.weight": rng.standard_normal(
            (D, 3, cfg.patch_size, cfg.patch_size)).astype(np.float32) * .02,
        "embeddings.class_embedding": rng.standard_normal(D).astype(
            np.float32) * .02,
        "embeddings.position_embedding.weight": rng.standard_normal(
            (n_pos, D)).astype(np.float32) * .02,
        "pre_layrnorm.weight": np.ones(D, np.float32),
        "pre_layrnorm.bias": np.zeros(D, np.float32),
        "post_layernorm.weight": np.ones(D, np.float32),
        "post_layernorm.bias": np.zeros(D, np.float32),
        "visual_projection.weight": rng.standard_normal(
            (cfg.projection_dim, D)).astype(np.float32) * .02,
    }
    for i in range(L):
        p = f"encoder.layers.{i}."
        for ln in ("layer_norm1", "layer_norm2"):
            sd[p + ln + ".weight"] = np.ones(D, np.float32)
            sd[p + ln + ".bias"] = np.zeros(D, np.float32)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[p + f"self_attn.{proj}.weight"] = rng.standard_normal(
                (D, D)).astype(np.float32) * .02
            sd[p + f"self_attn.{proj}.bias"] = np.zeros(D, np.float32)
        sd[p + "mlp.fc1.weight"] = rng.standard_normal((I, D)).astype(
            np.float32) * .02
        sd[p + "mlp.fc1.bias"] = np.zeros(I, np.float32)
        sd[p + "mlp.fc2.weight"] = rng.standard_normal((D, I)).astype(
            np.float32) * .02
        sd[p + "mlp.fc2.bias"] = np.zeros(D, np.float32)
    return sd


def build_clip(tiny: bool):
    """ViT-B/32-scale CLIPModel with random weights (the debias
    classifier: openai/clip-vit-base-patch32, uce_sd_debias.py:245-250)."""
    import numpy as np

    from tests.helpers import ToyTokenizer
    from uce_tpu.models import clip as clip_mod, clip_text

    rng = np.random.default_rng(1)
    if tiny:
        vcfg = clip_mod.CLIPVisionConfig(
            hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=32, image_size=32, patch_size=16,
            projection_dim=16)
        tcfg = clip_text.CLIPTextConfig(
            vocab_size=99, hidden_size=16, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=16, eos_token_id=98, projection_dim=16)
    else:
        vcfg = clip_mod.CLIPVisionConfig()  # B/32 defaults
        tcfg = clip_text.CLIPTextConfig(
            vocab_size=99, hidden_size=512, num_hidden_layers=12,
            num_attention_heads=8, intermediate_size=2048,
            max_position_embeddings=77, eos_token_id=98,
            projection_dim=512)
    return clip_mod.CLIPModel(
        vision_params=clip_mod.convert_hf_vision_state_dict(
            _random_vision_sd(vcfg, rng), vcfg),
        vision_config=vcfg,
        text_params=clip_text.init_params(rng, tcfg),
        text_config=tcfg,
        tokenizer=ToyTokenizer(),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke mode (tiny shapes, same code path)")
    ap.add_argument("--images", type=int, default=10,
                    help="images per concept (reference default 10)")
    ap.add_argument("--steps", type=int, default=20,
                    help="denoise steps (reference debias default 20)")
    ap.add_argument("--concepts", type=int, default=1,
                    help="number of edit concepts measured per iteration")
    ap.add_argument("--host_path", action="store_true",
                    help="time the round-4 host solve + overlay re-upload "
                         "path instead of the device-resident default")
    args = ap.parse_args()

    if args.tiny:
        # tiny mode is a CPU smoke: pin the platform BEFORE backend init
        # (the axon plugin ignores JAX_PLATFORMS — memory: env quirks)
        import jax

        jax.config.update("jax_platforms", "cpu")

    from uce_tpu.utils.compile_cache import enable as enable_cache

    enable_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))

    import numpy as np

    from uce_tpu.edit import debias as debias_mod
    from uce_tpu.models import unet as unet_mod

    size = 32 if args.tiny else 512
    pipe = build_pipeline(args.tiny)
    clip_model = build_clip(args.tiny)
    edit_concepts = ["doctor", "nurse", "teacher", "farmer"][:args.concepts]
    debias_concepts = ["male person", "female person"]
    settings = debias_mod.DebiasSettings(
        desired_ratios=[0.5, 0.5], num_images_per_prompt=args.images,
        num_inference_steps=args.steps, guidance_scale=7.5)

    resources = debias_mod.resources_from_pipe(pipe)
    concepts = list(edit_concepts) + list(debias_concepts)
    concept_embeds = resources.encode_concepts(concepts)
    labels = [debias_mod.DEFAULT_HYPOTHESIS_TEMPLATE.format(c)
              for c in debias_concepts]
    base_params = pipe.unet_params

    if args.host_path:
        solve_fn = debias_mod.make_collapsed_solver(
            resources.targets, concept_embeds, edit_concepts,
            debias_concepts, [], settings)

        def solve_and_swap(acc):
            # r4 path: host solve then ~46 MB overlay re-upload per iter
            weights = solve_fn(acc)
            pipe.unet_params = unet_mod.overlay_edits(
                base_params, weights, dtype=pipe.dtype)
    else:
        import jax

        applier = debias_mod.DeviceDebiasApplier(
            resources.targets, concept_embeds, edit_concepts,
            debias_concepts, [], settings, base_params)

        def solve_and_swap(acc):
            # device-resident path: only c_guide [K, d] crosses the link
            pipe.unet_params = applier.overlay(base_params, acc)
            # timing honesty: the swap is async — block on the edited tree
            jax.block_until_ready(pipe.unet_params)

    acc = np.zeros((len(edit_concepts), len(debias_concepts)))
    phases_per_iter = []
    for it in range(3):  # iter 0 = compile, 1..2 = steady state
        t0 = time.perf_counter()
        solve_and_swap(acc)
        t1 = time.perf_counter()
        images = pipe(
            list(edit_concepts),
            num_inference_steps=settings.num_inference_steps,
            guidance_scale=settings.guidance_scale,
            num_images_per_prompt=settings.num_images_per_prompt,
            seed=debias_mod.debias_measure_seeds(edit_concepts),
            height=size, width=size)  # pipe() returns np: full D2H copy
        t2 = time.perf_counter()
        pred = np.asarray(clip_model.classify(images, labels))
        t3 = time.perf_counter()
        observed = np.zeros_like(acc)
        for ci in range(len(edit_concepts)):
            block = pred[ci * args.images:(ci + 1) * args.images]
            for ai in range(len(debias_concepts)):
                observed[ci, ai] = float((block == ai).mean())
        # drive the controller so later iterations solve a non-trivial acc
        acc = acc + (np.asarray([0.5, 0.5]) - observed)
        phases_per_iter.append(
            {"solve_s": t1 - t0, "generate_s": t2 - t1,
             "classify_s": t3 - t2, "total_s": t3 - t0})
        print(f"iter {it}: {json.dumps(phases_per_iter[-1])}",
              file=sys.stderr)

    steady = phases_per_iter[1:]
    best = min(steady, key=lambda p: p["total_s"])
    result = {
        "metric": ("debias_tiny_iteration_s" if args.tiny
                   else "debias_sd14_iteration_s"),
        "value": round(best["total_s"], 3),
        "unit": "s/iter",
        "parts": {k: round(best[k], 3)
                  for k in ("generate_s", "classify_s", "solve_s")},
        "config": {"concepts": len(edit_concepts), "images": args.images,
                   "steps": args.steps, "size": size,
                   "solver_path": "host" if args.host_path else "device"},
        "compile_s": round(phases_per_iter[0]["total_s"], 1),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
