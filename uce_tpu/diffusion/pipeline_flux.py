"""FLUX.1 text-to-image pipeline (flow matching).

JAX-native equivalent of diffusers' FluxPipeline as exercised by
``notebooks/inference_flux.ipynb`` (schnell: 4 steps, guidance_scale 0,
max_sequence_length 256; dev: guidance-distilled with an embedded guidance
scale, dynamic sigma shifting). The denoising loop is one ``lax.scan`` over
the FlowMatchEuler plan; latents are 2x2-packed patches with (0, y, x)
RoPE ids.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from uce_tpu.diffusion import schedulers
from uce_tpu.edit import embeddings as emb
from uce_tpu.models import clip_text, flux as flux_mod, t5 as t5_mod
from uce_tpu.models import unet as unet_mod, vae as vae_mod
from uce_tpu.models.hf_loader import (host_device_scope, load_json,
                                      load_state_dict)
from uce_tpu.utils import torch_rng


def pack_latents(latents: jnp.ndarray) -> jnp.ndarray:
    """[B, h, w, C] -> [B, (h/2)(w/2), 4C] 2x2 patch packing,
    CHANNEL-major inner order (c, py, px) — the diffusers/BFL FLUX
    convention (FluxPipeline._pack_latents: NCHW view -> permute
    (0,2,4,1,3,5)), which real x_embedder/proj_out weights are trained
    against. HiDream's patchify is PIXEL-major and lives in
    pipeline_hidream (upstream einops '(p1 p2 C)') — do not share."""
    b, h, w, c = latents.shape
    x = latents.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [b, h/2, w/2, c, py, px]
    return x.reshape(b, (h // 2) * (w // 2), 4 * c)


def unpack_latents(packed: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Inverse of pack_latents; h, w are the unpacked latent dims."""
    b, s, c4 = packed.shape
    c = c4 // 4
    x = packed.reshape(b, h // 2, w // 2, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # [b, h/2, py, w/2, px, c]
    return x.reshape(b, h, w, c)


def make_img_ids(h: int, w: int) -> np.ndarray:
    """[S, 3] (0, y, x) grid over packed patches."""
    ids = np.zeros(((h // 2) * (w // 2), 3), np.float64)
    ids[:, 1] = np.repeat(np.arange(h // 2), w // 2)
    ids[:, 2] = np.tile(np.arange(w // 2), h // 2)
    return ids


def compute_shift_mu(seq_len: int, base_seq=256, max_seq=4096,
                     base_shift=0.5, max_shift=1.15) -> float:
    """FLUX-dev dynamic shifting: mu linear in image sequence length."""
    m = (max_shift - base_shift) / (max_seq - base_seq)
    return seq_len * m + (base_shift - m * base_seq)


def _load_flux_transformer(model_dir: str, dtype, quantize: str | None):
    """Load (and optionally quantize) the DiT param tree HOST-side.

    Conversion and quantization run pinned to the CPU backend so a
    full-size (12 B-param) fp32 state dict never lands on the
    accelerator — only the final (possibly int8) tree transfers, at the
    first jitted call. Mirrors the reference's memory-staged load
    (uce_flux_edit.py:15-41), TPU-adapted.
    """
    tcfg = flux_mod.FluxConfig.from_hf(
        load_json(os.path.join(model_dir, "transformer", "config.json")))
    with host_device_scope():
        tparams = flux_mod.convert_hf_state_dict(
            load_state_dict(model_dir, "transformer", dtype=np.float32),
            tcfg)
        tparams = unet_mod.cast_params(tparams, dtype)
        if quantize:
            from uce_tpu.models import quantize as quantize_mod

            tparams = quantize_mod.quantize_params(
                tparams, quantize_mod.FLUX_SKIP, mode=quantize)
    return tparams, tcfg


@dataclasses.dataclass
class FluxPipeline:
    transformer_params: dict | None
    transformer_config: flux_mod.FluxConfig
    t5_params: dict | None
    t5_config: t5_mod.T5Config
    t5_tokenizer: object
    clip_params: dict | None
    clip_config: clip_text.CLIPTextConfig
    clip_tokenizer: object
    vae_params: dict
    vae_config: vae_mod.VAEConfig
    scheduler_config: dict
    dtype: object = jnp.bfloat16
    max_sequence_length: int = 256
    # staged loading (from_pretrained(staged=True)): deferred DiT source
    model_dir: str | None = None
    pending_quantize: str | None = None
    pending_edits: list = dataclasses.field(default_factory=list)
    # optional jax.sharding.Mesh (apply_mesh) for multi-chip generation
    mesh: object | None = None

    @classmethod
    def from_pretrained(cls, model_dir: str, dtype=jnp.bfloat16,
                        max_sequence_length: int | None = None,
                        staged: bool = False,
                        quantize: str | None = None) -> "FluxPipeline":
        """Load a FLUX snapshot directory.

        staged=True defers the DiT load until the first generation call —
        encode prompts first, call ``free_encoders()``, and the DiT
        (optionally ``quantize``d host-side) loads into the space the
        encoders vacated: the reference's three-phase memory staging
        (uce_flux_edit.py:15-41, SURVEY §3.3) for a 16 GB chip.
        """
        from transformers import AutoTokenizer

        if staged:
            tcfg = flux_mod.FluxConfig.from_hf(
                load_json(os.path.join(model_dir, "transformer",
                                       "config.json")))
            tparams = None
        else:
            tparams, tcfg = _load_flux_transformer(model_dir, dtype,
                                                   quantize)

        t5cfg = t5_mod.T5Config.from_hf(
            load_json(os.path.join(model_dir, "text_encoder_2",
                                   "config.json")))
        t5params = t5_mod.convert_hf_state_dict(
            load_state_dict(model_dir, "text_encoder_2", dtype=np.float32),
            t5cfg)
        ccfg = clip_text.CLIPTextConfig.from_hf(
            load_json(os.path.join(model_dir, "text_encoder", "config.json")))
        cparams = clip_text.convert_hf_state_dict(
            load_state_dict(model_dir, "text_encoder", dtype=np.float32), ccfg)

        vcfg = vae_mod.VAEConfig.from_hf(
            load_json(os.path.join(model_dir, "vae", "config.json")))
        vparams = unet_mod.nest_state_dict(
            load_state_dict(model_dir, "vae", dtype=np.float32), dtype)

        sp = os.path.join(model_dir, "scheduler", "scheduler_config.json")
        scfg = (load_json(sp) if os.path.exists(sp)
                else {"_class_name": "FlowMatchEulerDiscreteScheduler"})
        if max_sequence_length is None:
            from uce_tpu.edit.flux import default_max_sequence_length

            max_sequence_length = default_max_sequence_length(model_dir)
        return cls(
            transformer_params=tparams, transformer_config=tcfg,
            t5_params=t5params, t5_config=t5cfg,
            t5_tokenizer=AutoTokenizer.from_pretrained(
                os.path.join(model_dir, "tokenizer_2")),
            clip_params=cparams, clip_config=ccfg,
            clip_tokenizer=AutoTokenizer.from_pretrained(
                os.path.join(model_dir, "tokenizer")),
            vae_params=vparams, vae_config=vcfg, scheduler_config=scfg,
            dtype=dtype, max_sequence_length=max_sequence_length,
            model_dir=model_dir, pending_quantize=quantize,
        )

    def free_encoders(self) -> None:
        """Drop the T5/CLIP encoder params (frees their device memory once
        no embeddings reference them). After this, only
        ``generate_from_embeddings`` works — encode first."""
        self.t5_params = None
        self.clip_params = None

    def apply_mesh(self, mesh) -> None:
        """Multi-chip generation: the image batch shards over the mesh
        'data' axis; a 'model' axis > 1 lays the DiT out tensor-parallel
        (parallel/mesh.shard_flux_params: head-sharded joint attention,
        column/row-parallel MLPs — num_attention_heads must divide by
        it). On a staged pipeline the layout is deferred with the DiT
        itself, preserving staging's memory contract. Pass None to
        revert: batch sharding stops, and a model-sharded DiT is
        gathered back to the default device."""
        if mesh is not None:
            from uce_tpu.parallel.mesh import require_data_axis

            require_data_axis(mesh)
        prev, self.mesh = self.mesh, mesh
        if mesh is None:
            if (prev is not None and dict(prev.shape).get("model", 1) > 1
                    and self.transformer_params is not None):
                self.transformer_params = jax.device_put(
                    self.transformer_params, jax.devices()[0])
            return
        if (dict(mesh.shape).get("model", 1) > 1
                and self.transformer_params is not None):
            from uce_tpu.parallel.mesh import shard_flux_params

            self.transformer_params = shard_flux_params(
                self.transformer_params, mesh)
        # staged (params not loaded yet): _ensure_transformer lays the
        # DiT out over self.mesh at load time

    def _ensure_transformer(self) -> None:
        if self.transformer_params is None:
            if self.model_dir is None:
                raise RuntimeError(
                    "staged pipeline has no model_dir to load the DiT from")
            self.transformer_params, self.transformer_config = \
                _load_flux_transformer(self.model_dir, self.dtype,
                                       self.pending_quantize)
            for path in self.pending_edits:
                self.load_uce_edits(path)
            self.pending_edits = []
            if (self.mesh is not None
                    and dict(self.mesh.shape).get("model", 1) > 1):
                from uce_tpu.parallel.mesh import shard_flux_params

                self.transformer_params = shard_flux_params(
                    self.transformer_params, self.mesh)

    def quantize_weights(self, mode: str = "w8") -> None:
        """Quantize the DiT weights in place (models/quantize.py).

        ``mode="w8"`` (weight-only int8, bf16 arithmetic) halves the
        transformer's HBM residency — the 12 B-param FLUX DiT fits one
        16 GB v5e chip (~12 GB int8 vs 24 GB bf16; ``bench.py
        --flux_w8``). The UCE edit targets (context_embedder,
        text_embedder.linear_1) stay float (quantize.FLUX_SKIP), so edit
        overlays apply exactly in either order. Encoders/VAE are left
        untouched; serving the FULL pipeline single-chip additionally
        needs the reference's staged encoder load
        (uce_flux_edit.py:15-41) — encode prompts, then free T5.
        """
        from uce_tpu.models import quantize as quantize_mod

        if self.transformer_params is None:  # staged: quantize at load
            self.pending_quantize = mode
            return
        self.transformer_params = quantize_mod.quantize_params(
            self.transformer_params, quantize_mod.FLUX_SKIP, mode=mode)
        # (the jitted generate fns take params as arguments, so the new
        # pytree structure re-traces automatically)

    def load_uce_edits(self, safetensors_path: str) -> None:
        """Overlay UCE-edited text-entry projections (uce_flux_edit.py
        artifacts: context_embedder / text_embedder.linear_1)."""
        if self.transformer_params is None:  # staged: apply at DiT load
            self.pending_edits.append(safetensors_path)
            return
        from safetensors.numpy import load_file

        from uce_tpu.models.layers import linear_weight

        edits = load_file(safetensors_path)
        p = self.transformer_params
        slots = {
            "context_embedder.weight":
                (p["context_embedder"], "weight"),
            "time_text_embed.text_embedder.linear_1.weight":
                (p["time_text_embed"]["text_embedder"]["linear_1"], "weight"),
        }
        for key, v in edits.items():
            if key not in slots:
                print(f"load_uce_edits: skipped unknown key {key}")
                continue
            node, leaf = slots[key]
            w = jnp.asarray(linear_weight(np.asarray(v, np.float32)))
            if w.shape != node[leaf].shape:
                raise ValueError(
                    f"edit for '{key}' has shape {v.shape}, model expects "
                    f"{tuple(reversed(node[leaf].shape))}")
            node[leaf] = w.astype(self.dtype)

    def encode_prompts(self, prompts: Sequence[str]):
        if self.t5_params is None or self.clip_params is None:
            raise RuntimeError(
                "encoders were freed (free_encoders); encode prompts "
                "before freeing, then use generate_from_embeddings")
        ids, mask = emb.tokenize_batch(self.t5_tokenizer, list(prompts),
                                       self.max_sequence_length)
        # diffusers FluxPipeline._get_t5_prompt_embeds passes no attention
        # mask to the T5 encoder (pad tokens fully attend) — match it.
        del mask
        t5_out = t5_mod.encode_tokens(
            self.t5_params, jnp.asarray(ids),
            jnp.ones_like(jnp.asarray(ids)), self.t5_config)
        cids, _ = emb.tokenize_batch(self.clip_tokenizer, list(prompts),
                                     self.clip_config.max_position_embeddings)
        _, pooled, _ = clip_text.encode_tokens(
            self.clip_params, jnp.asarray(cids), self.clip_config)
        return t5_out.astype(self.dtype), pooled.astype(self.dtype)

    def __call__(
        self,
        prompt: str | Sequence[str],
        num_inference_steps: int = 4,
        guidance_scale: float = 0.0,
        num_images_per_prompt: int = 1,
        seed: int = 0,
        height: int = 1024,
        width: int = 1024,
    ) -> np.ndarray:
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        n_prompts = len(prompts)
        prompts = [p for p in prompts for _ in range(num_images_per_prompt)]
        t5_embeds, pooled = self.encode_prompts(prompts)
        return self.generate_from_embeddings(
            t5_embeds, pooled, n_prompts=n_prompts,
            num_images_per_prompt=num_images_per_prompt,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, seed=seed,
            height=height, width=width)

    def generate_from_embeddings(
        self,
        t5_embeds: jnp.ndarray,
        pooled: jnp.ndarray,
        n_prompts: int | None = None,
        num_images_per_prompt: int = 1,
        num_inference_steps: int = 4,
        guidance_scale: float = 0.0,
        seed: int = 0,
        height: int = 1024,
        width: int = 1024,
    ) -> np.ndarray:
        """Generate from precomputed (t5_embeds [B, S, d], pooled [B, d'])
        — the staged-serving path: encode first, ``free_encoders()``, and
        the (optionally quantized) DiT loads on first use into the freed
        HBM. ``t5_embeds`` rows must already be expanded per sample."""
        self._ensure_transformer()
        bsz = t5_embeds.shape[0]
        if n_prompts is None:
            n_prompts = bsz // num_images_per_prompt
        if (n_prompts * num_images_per_prompt != bsz
                or pooled.shape[0] != bsz):
            raise ValueError(
                f"t5_embeds rows ({bsz}) / pooled rows ({pooled.shape[0]}) "
                f"must equal n_prompts ({n_prompts}) x "
                f"num_images_per_prompt ({num_images_per_prompt}); embeds "
                "must be pre-expanded per sample")

        vae_scale = 2 ** (len(self.vae_config.block_out_channels) - 1)
        gran = 2 * vae_scale  # VAE downsampling x the 2x2 patch pack
        if height % gran or width % gran:
            raise ValueError(
                f"height/width must be multiples of {gran} "
                f"(got {height}x{width}): VAE scale {vae_scale} x the 2x2 "
                "latent patchify")
        lh, lw = height // vae_scale, width // vae_scale
        lc = self.vae_config.latent_channels
        latents = jnp.asarray(
            torch_rng.draw_prompt_latents(
                (lh, lw, lc), seed, n_prompts, num_images_per_prompt),
            self.dtype)
        packed = pack_latents(latents)

        seq_len = packed.shape[1]
        use_dyn = self.scheduler_config.get("use_dynamic_shifting", False)
        plan = schedulers.flow_match_euler_plan(
            num_inference_steps,
            shift=self.scheduler_config.get("shift", 1.0),
            use_dynamic_shifting=use_dyn,
            mu=compute_shift_mu(
                seq_len,
                self.scheduler_config.get("base_image_seq_len", 256),
                self.scheduler_config.get("max_image_seq_len", 4096),
                self.scheduler_config.get("base_shift", 0.5),
                self.scheduler_config.get("max_shift", 1.15),
            ) if use_dyn else None,
        )
        images = _flux_generate_jit(
            self, plan, packed, t5_embeds, pooled,
            jnp.float32(guidance_scale), (lh, lw))
        return np.asarray(images)


@functools.lru_cache(maxsize=8)
def _compiled_flux_generate(config, vae_config, plan_key, shape_key,
                            latent_hw):
    lh, lw = latent_hw
    img_ids = make_img_ids(lh, lw)

    def fn(params, vae_params, plan, packed, t5_embeds, pooled, guidance):
        # txt_ids depend only on the (static) T5 sequence length
        txt_ids = np.zeros((t5_embeds.shape[1], 3))
        sigmas = plan.tables["sigmas"]

        def body(carry, i):
            lat, _ = carry
            t = plan.timesteps[i] / 1000.0  # transformer re-scales by 1000
            v = flux_mod.apply(
                params, lat, t5_embeds, pooled,
                jnp.broadcast_to(t, (lat.shape[0],)), img_ids, txt_ids,
                config,
                guidance=(jnp.broadcast_to(guidance, (lat.shape[0],))
                          if config.guidance_embeds else None))
            new = lat.astype(jnp.float32) + (
                sigmas[i + 1] - sigmas[i]) * v.astype(jnp.float32)
            return (new.astype(lat.dtype), 0.0), None

        (final, _), _ = jax.lax.scan(
            body, (packed, 0.0), jnp.arange(plan.num_calls))
        lat = unpack_latents(final, lh, lw).astype(jnp.float32)
        lat = lat / vae_config.scaling_factor + vae_config.shift_factor
        imgs = vae_mod.decode(vae_params, lat.astype(packed.dtype),
                              vae_config)
        imgs = (imgs.astype(jnp.float32) / 2 + 0.5).clip(0.0, 1.0)
        return jnp.round(imgs * 255.0).astype(jnp.uint8)

    return jax.jit(fn)


def _flux_generate_jit(pipe, plan, packed, t5_embeds, pooled, guidance,
                       latent_hw):
    orig = packed.shape[0]
    mesh = getattr(pipe, "mesh", None)
    if mesh is not None:
        # data-parallel fan-out: pad the batch to the data axis, shard,
        # slice the images back after (pipeline.py's SD path, FLUX shapes)
        from uce_tpu.parallel.mesh import batch_sharding, pad_batch

        n_data = dict(mesh.shape)["data"]
        sh = batch_sharding(mesh)
        packed, t5_embeds, pooled = (
            jax.device_put(pad_batch(x, n_data), sh)
            for x in (packed, t5_embeds, pooled))
    fn = _compiled_flux_generate(
        pipe.transformer_config, pipe.vae_config,
        (plan.kind, plan.num_calls),
        (packed.shape, str(packed.dtype)),
        latent_hw)
    out = fn(pipe.transformer_params, pipe.vae_params, plan, packed,
             t5_embeds, pooled, guidance)
    return out[:orig]
