"""Text-to-image pipeline for SD v1.x / v2.x (SDXL via dual encoders).

JAX-native replacement for ``diffusers.StableDiffusionPipeline`` as used by
``evalscripts/generate-images-sd.py``: tokenize -> CLIP encode -> fused
CFG+scheduler scan over the UNet -> VAE decode -> uint8 images. The whole
latents->image path is jitted once per (batch, size, steps) signature and
reused across prompts/CSV rows.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from uce_tpu.diffusion import sampler, schedulers
from uce_tpu.edit import embeddings as emb
from uce_tpu.models import clip_text, unet as unet_mod, vae as vae_mod
from uce_tpu.models.hf_loader import load_json, load_state_dict
from uce_tpu.utils import torch_rng


@dataclasses.dataclass
class SDPipeline:
    unet_params: dict
    unet_config: unet_mod.UNetConfig
    text_params: dict
    text_config: clip_text.CLIPTextConfig
    tokenizer: object
    vae_params: dict
    vae_config: vae_mod.VAEConfig
    scheduler_config: dict
    dtype: object = jnp.float32
    # SDXL second encoder (None for SD v1/v2)
    text_params_2: dict | None = None
    text_config_2: clip_text.CLIPTextConfig | None = None
    tokenizer_2: object | None = None
    # optional jax.sharding.Mesh for data-parallel generation fan-out
    mesh: object | None = None

    @property
    def is_sdxl(self) -> bool:
        return self.text_params_2 is not None

    # ---------------------------------------------------------------- load
    @classmethod
    def from_pretrained(cls, model_dir: str, dtype=jnp.bfloat16,
                        scheduler: str | None = None) -> "SDPipeline":
        ucfg = unet_mod.UNetConfig.from_hf(
            load_json(os.path.join(model_dir, "unet", "config.json")))
        uparams = unet_mod.nest_state_dict(
            load_state_dict(model_dir, "unet", dtype=np.float32))
        vcfg = vae_mod.VAEConfig.from_hf(
            load_json(os.path.join(model_dir, "vae", "config.json")))
        vparams = unet_mod.nest_state_dict(
            load_state_dict(model_dir, "vae", dtype=np.float32))
        from uce_tpu.edit.sd import load_text_encoder, load_tokenizer

        tparams, tcfg = load_text_encoder(model_dir)
        tok = load_tokenizer(model_dir)
        sched_path = os.path.join(model_dir, "scheduler",
                                  "scheduler_config.json")
        scfg = load_json(sched_path) if os.path.exists(sched_path) else {
            "_class_name": "PNDMScheduler"}
        if scheduler is not None:
            # accept both short keys ('ddim', the CLI vocabulary) and
            # diffusers class names ('DDIMScheduler')
            scfg = dict(scfg, _class_name=schedulers.SCHEDULER_CLASS_FOR_NAME
                        .get(scheduler, scheduler))
        pipe = cls(
            unet_params=unet_mod.cast_params(uparams, dtype),
            unet_config=ucfg,
            text_params=tparams, text_config=tcfg, tokenizer=tok,
            vae_params=unet_mod.cast_params(vparams, dtype),
            vae_config=vcfg, scheduler_config=scfg, dtype=dtype,
        )
        if os.path.isdir(os.path.join(model_dir, "text_encoder_2")):
            pipe.text_params_2, pipe.text_config_2 = load_text_encoder(
                model_dir, "text_encoder_2")
            pipe.tokenizer_2 = load_tokenizer(model_dir, "tokenizer_2")
        return pipe

    # --------------------------------------------------------------- edits
    def load_uce_edits(self, safetensors_path: str) -> None:
        """Overlay UCE-edited weights (JAX load_state_dict(strict=False))."""
        from safetensors.numpy import load_file

        edits = load_file(safetensors_path)
        self.unet_params = unet_mod.overlay_edits(self.unet_params, edits,
                                                  dtype=self.dtype)

    def apply_mesh(self, mesh) -> None:
        """Enable multi-chip execution (SURVEY §2.4 user surface).

        The image batch shards over the mesh 'data' axis inside
        ``_generate_jit``; when the mesh has a 'model' axis > 1 the UNet
        parameters are additionally laid out tensor-parallel
        (``parallel/mesh.shard_unet_params``: head-sharded attention,
        column/row-parallel FFN) so XLA inserts the psums over ICI.
        Pass ``None`` to go back to single-device execution (batch
        sharding stops, and model-sharded UNet params are gathered back
        to the default device).
        """
        if mesh is not None:
            from uce_tpu.parallel.mesh import require_data_axis

            require_data_axis(mesh)
        prev, self.mesh = self.mesh, mesh
        if mesh is None:
            if prev is not None and dict(prev.shape).get("model", 1) > 1:
                self.unet_params = jax.device_put(self.unet_params,
                                                  jax.devices()[0])
            return
        if dict(mesh.shape).get("model", 1) > 1:
            from uce_tpu.parallel.mesh import shard_unet_params

            self.unet_params = shard_unet_params(self.unet_params, mesh)

    def quantize_weights(self, mode: str = "w8") -> None:
        """Quantize UNet + VAE weights in place (models/quantize.py).

        ``mode="w8"`` = weight-only int8 (bf16 arithmetic, half weight
        HBM); ``mode="int8"`` = W8A8 int8 MXU ops (measured slower than
        bf16 at SD shapes on this part — docs/PERF.md). Apply edits
        BEFORE quantizing for quantized edit targets, or after — the
        overlay replaces the quantized slot with the float edit, and the
        layer dispatch handles mixed trees.
        """
        from uce_tpu.models import quantize as quantize_mod

        self.unet_params = quantize_mod.quantize_params(
            self.unet_params, quantize_mod.UNET_SKIP, mode=mode)
        self.vae_params = quantize_mod.quantize_params(
            self.vae_params, quantize_mod.VAE_SKIP, mode=mode)

    # ------------------------------------------------------------- encode
    def encode_prompts(self, prompts: Sequence[str]):
        if self.is_sdxl:
            return self.encode_prompts_sdxl(prompts)[0]
        ids, _ = emb.tokenize_batch(
            self.tokenizer, list(prompts),
            self.text_config.max_position_embeddings)
        last_hidden, _, _ = clip_text.encode_tokens(
            self.text_params, jnp.asarray(ids), self.text_config)
        return last_hidden.astype(self.dtype)

    def encode_prompts_sdxl(self, prompts: Sequence[str]):
        """diffusers SDXL encode_prompt: concat of both encoders'
        penultimate hidden states [B, 77, 2048] + encoder-2 pooled
        projection [B, 1280]."""
        parts = []
        pooled = None
        for params, config, tokenizer in (
            (self.text_params, self.text_config, self.tokenizer),
            (self.text_params_2, self.text_config_2, self.tokenizer_2),
        ):
            ids, _ = emb.tokenize_batch(
                tokenizer, list(prompts), config.max_position_embeddings)
            _, pool, hiddens = clip_text.encode_tokens(
                params, jnp.asarray(ids), config, output_hidden_states=True)
            parts.append(hiddens[-2])
            pooled = pool  # encoder 2 wins (overwritten on 2nd pass)
        context = jnp.concatenate(parts, axis=-1).astype(self.dtype)
        return context, pooled.astype(self.dtype)

    def _sdxl_added_cond(self, pooled_cond, pooled_uncond, bsz, height,
                         width, n_branches):
        """text_embeds (pooled, uncond first) + time_ids [h,w,0,0,h,w].

        diffusers SDXL pools the *negative* prompt for the uncond branch;
        both pooled vectors come from the caller's single encode pass.
        """
        text_embeds = jnp.concatenate([pooled_uncond, pooled_cond], axis=0)
        if n_branches > 2:  # extra guidance branches reuse the cond pooled
            extra = jnp.concatenate(
                [pooled_cond] * (n_branches - 2), axis=0)
            text_embeds = jnp.concatenate([text_embeds, extra], axis=0)
        time_ids = jnp.tile(
            jnp.asarray([height, width, 0, 0, height, width], jnp.float32),
            (n_branches * bsz, 1))
        return {"text_embeds": text_embeds, "time_ids": time_ids}

    # ----------------------------------------------------------- generate
    def __call__(
        self,
        prompt: str | Sequence[str],
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        num_images_per_prompt: int = 1,
        seed: int = 0,
        height: int = 512,
        width: int = 512,
        scheduler: str | None = None,
        mode: str = "cfg",
        negative_prompt: str | Sequence[str] | None = None,
        concepts_to_project: Sequence[str] | None = None,
        safety_concept: str | None = None,
        sld_config=None,
        debias_projection: np.ndarray | None = None,
        fast=None,
    ) -> np.ndarray:
        """Returns uint8 images [N, H, W, 3].

        mode: 'cfg' (default), 'concept_algebra' (needs 3
        concepts_to_project), 'sld' (safety_concept + sld_config preset), or
        'debias_vl' (debias_projection P applied to the text embeddings).

        fast: optional ``sampler.FastConfig`` — opt-in beyond-protocol
        accelerations (CFG interval, DeepCache); cfg/debias_vl modes only.
        """
        from uce_tpu.diffusion import guidance as gmod

        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        n_prompts = len(prompts)
        prompts = [p for p in prompts for _ in range(num_images_per_prompt)]
        bsz = len(prompts)
        if not isinstance(seed, (int, np.integer)) and len(seed) != n_prompts:
            raise ValueError("len(seed) must match len(prompt)")  # fail fast

        if negative_prompt is None:
            negatives = [""] * bsz
        elif isinstance(negative_prompt, str):
            negatives = [negative_prompt] * bsz
        else:
            negatives = [n for n in negative_prompt
                         for _ in range(num_images_per_prompt)]
            if len(negatives) != bsz:
                raise ValueError("len(negative_prompt) must match len(prompt)")

        if self.is_sdxl:
            # encode once: the pooled outputs feed _sdxl_added_cond below
            # (re-encoding there would double the text-encoder work)
            cond, pooled_cond = self.encode_prompts_sdxl(prompts)
            uncond, pooled_uncond = self.encode_prompts_sdxl(negatives)
        else:
            cond = self.encode_prompts(prompts)
            uncond = self.encode_prompts(negatives)
            pooled_cond = pooled_uncond = None

        if mode == "cfg":
            context = jnp.concatenate([uncond, cond], axis=0)
        elif mode == "concept_algebra":
            if concepts_to_project is None or len(concepts_to_project) != 3:
                raise ValueError(
                    "concept_algebra needs exactly 3 concepts_to_project")
            projs = [
                jnp.repeat(self.encode_prompts([c]), bsz, axis=0)
                for c in concepts_to_project
            ]
            context = jnp.concatenate([uncond, cond] + projs, axis=0)
        elif mode == "sld":
            safety = safety_concept or gmod.DEFAULT_SAFETY_CONCEPT
            safe = jnp.repeat(self.encode_prompts([safety]), bsz, axis=0)
            context = jnp.concatenate([uncond, cond, safe], axis=0)
        elif mode == "debias_vl":
            if debias_projection is None:
                raise ValueError(
                    "mode='debias_vl' needs a debias_projection matrix "
                    "(guidance.debias_vl_calibration)")
            proj = jnp.asarray(debias_projection, jnp.float32)
            cond = (cond.astype(jnp.float32) @ proj.T).astype(self.dtype)
            context = jnp.concatenate([uncond, cond], axis=0)
        else:
            raise ValueError(f"unknown mode: {mode}")

        vae_scale = 2 ** (len(self.vae_config.block_out_channels) - 1)
        if height % vae_scale or width % vae_scale:
            raise ValueError(
                f"height/width must be multiples of {vae_scale} "
                f"(got {height}x{width}) — a silent floor would return a "
                "smaller image than requested")
        lh, lw = height // vae_scale, width // vae_scale
        lc = self.unet_config.in_channels
        latents = jnp.asarray(
            torch_rng.draw_prompt_latents(
                (lh, lw, lc), seed, n_prompts, num_images_per_prompt),
            self.dtype)

        # a per-call scheduler override changes the TYPE only; the model's
        # scheduler hyperparameters (prediction_type, betas, ...) carry over
        plan = (schedulers.plan_from_hf_as(scheduler, self.scheduler_config,
                                           num_inference_steps)
                if scheduler else
                schedulers.plan_from_hf(self.scheduler_config,
                                        num_inference_steps))
        sld_cfg = None
        if mode == "sld":
            sld_cfg = sld_config or gmod.SLDConfig()
        eff_mode = "cfg" if mode == "debias_vl" else mode
        if fast is not None and fast.is_noop:
            fast = None  # share the exact path's compiled signature
        if fast is not None and eff_mode != "cfg":
            raise ValueError(
                "fast modes support only cfg/debias_vl guidance")
        added_cond = None
        if self.is_sdxl:
            n_branches = {"cfg": 2, "sld": 3, "concept_algebra": 5}[eff_mode]
            added_cond = self._sdxl_added_cond(
                pooled_cond, pooled_uncond, bsz, height, width, n_branches)
        images = _generate_jit(
            self, plan, latents, context, float(guidance_scale),
            eff_mode, sld_cfg, added_cond, fast)
        return np.asarray(images)


@functools.lru_cache(maxsize=16)
def _compiled_generate(unet_config, vae_config, plan_key, shape_key,
                       mode, sld_cfg, has_added_cond, fast=None):
    """Build the jitted latents->uint8 function for one static signature."""
    from uce_tpu.diffusion import guidance as gmod

    num_branches = {"cfg": 2, "sld": 3, "concept_algebra": 5}[mode]

    def fn(unet_params, vae_params, plan, latents, context, guidance_scale,
           added_cond):
        def model_fn(lat_in, t):
            return unet_mod.apply(
                unet_params, lat_in, t, context, unet_config,
                added_cond=added_cond if has_added_cond else None)

        if fast is not None:
            bsz = latents.shape[0]

            def model_factory(cond_only, cached, want_deep):
                ctx = context[bsz:] if cond_only else context
                ac = None
                if has_added_cond:
                    ac = ({k: v[bsz:] for k, v in added_cond.items()}
                          if cond_only else added_cond)
                if cached:
                    def f(lat_in, t, deep):
                        return unet_mod.apply(
                            unet_params, lat_in, t, ctx, unet_config,
                            added_cond=ac, deep_feature=deep,
                            cache_level=fast.cache_level)
                    return f

                def f(lat_in, t):
                    return unet_mod.apply(
                        unet_params, lat_in, t, ctx, unet_config,
                        added_cond=ac, return_deep=want_deep,
                        cache_level=fast.cache_level)
                return f

            final = sampler.denoise_fast(
                model_factory, plan, latents,
                guidance_scale=guidance_scale, fast=fast,
            )
        elif mode == "sld":
            final = sampler.denoise(
                model_fn, plan, latents,
                guidance_fn=lambda e, i, m: gmod.sld_combine(
                    e, guidance_scale, i, m, sld_cfg),
                num_branches=3,
                guidance_state=jnp.zeros_like(latents, jnp.float32),
            )
        elif mode == "concept_algebra":
            final = sampler.denoise(
                model_fn, plan, latents,
                guidance_fn=lambda e: gmod.concept_algebra_combine(
                    e, guidance_scale),
                num_branches=5,
            )
        else:
            final = sampler.denoise(
                model_fn, plan, latents,
                guidance_fn=lambda e: sampler.cfg_combine(e, guidance_scale),
                num_branches=num_branches,
            )
        scaled = final.astype(jnp.float32) / vae_config.scaling_factor
        imgs = vae_mod.decode(vae_params, scaled.astype(latents.dtype),
                              vae_config)
        imgs = (imgs.astype(jnp.float32) / 2 + 0.5).clip(0.0, 1.0)
        return jnp.round(imgs * 255.0).astype(jnp.uint8)

    return jax.jit(fn, static_argnames=())


def _generate_jit(pipe: SDPipeline, plan, latents, context, guidance_scale,
                  mode: str = "cfg", sld_cfg=None, added_cond=None,
                  fast=None):
    orig_bsz = latents.shape[0]
    if pipe.mesh is not None:
        # data-parallel fan-out: shard the batch over the mesh 'data' axis;
        # XLA propagates the sharding through the scan (replicated params).
        # Pad the batch (repeating the last row per guidance branch) to a
        # multiple of the data axis, slice the images back after.
        from uce_tpu.parallel.mesh import (batch_sharding, pad_batch,
                                           pad_batch_branched)

        n_data = pipe.mesh.shape["data"]
        n_branches = context.shape[0] // orig_bsz
        latents = pad_batch(latents, n_data)
        context = pad_batch_branched(context, n_data, n_branches)
        if added_cond:
            added_cond = {k: pad_batch_branched(v, n_data, n_branches)
                          for k, v in added_cond.items()}
        sh = batch_sharding(pipe.mesh)
        latents = jax.device_put(latents, sh)
        context = jax.device_put(context, sh)
    fn = _compiled_generate(
        pipe.unet_config, pipe.vae_config,
        (plan.kind, plan.num_calls),
        (latents.shape, str(latents.dtype)),
        mode, sld_cfg, added_cond is not None, fast,
    )
    out = fn(pipe.unet_params, pipe.vae_params, plan, latents, context,
             jnp.float32(guidance_scale), added_cond or {})
    return out[:orig_bsz]
