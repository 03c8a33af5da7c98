"""HiDream-I1 text-to-image pipeline (flow matching, quad text encoders).

JAX-native equivalent of diffusers' ``HiDreamImagePipeline`` as
instantiated by the reference (``trainscripts/uce_hidream_edit.py:16-64``;
upstream's ``inference_hidream.ipynb`` blob is missing from the snapshot).
Text conditioning: pooled CLIP-L + CLIP-G (concatenated), a T5 sequence
stream, and Llama-3.1 hidden states (``output_hidden_states[1:]``) indexed
by the transformer config's ``llama_layers`` — ``max_sequence_length=128``
(``uce_hidream_edit.py:220``). The denoising loop is one ``lax.scan`` over
a FlowMatchEuler plan; HiDream's transformer predicts the negated flow
(the reference pipeline applies ``noise_pred = -noise_pred``).
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
from uce_tpu.diffusion.pipeline_flux import compute_shift_mu, make_img_ids
from uce_tpu.edit import embeddings as emb
from uce_tpu.models import clip_text, hidream as hd_mod, llama as llama_mod
from uce_tpu.models import t5 as t5_mod, unet as unet_mod, vae as vae_mod
from uce_tpu.models.hf_loader import (host_device_scope, load_json,
                                      load_state_dict)
from uce_tpu.utils import torch_rng


def pack_latents(latents: jnp.ndarray) -> jnp.ndarray:
    """[B, h, w, C] -> [B, (h/2)(w/2), 4C] 2x2 patch packing,
    PIXEL-major inner order (py, px, c) — HiDream's own patchify
    (upstream transformer einops 'B C (H p1) (W p2) -> B (H W)
    (p1 p2 C)'), which its trained x_embedder/proj_out expect. NOT the
    FLUX convention (channel-major, pipeline_flux.pack_latents)."""
    b, h, w, c = latents.shape
    x = latents.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [b, h/2, w/2, py, px, c]
    return x.reshape(b, (h // 2) * (w // 2), 4 * c)


def unpack_latents(packed: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Inverse of pack_latents; h, w are the unpacked latent dims."""
    b, s, c4 = packed.shape
    c = c4 // 4
    x = packed.reshape(b, h // 2, w // 2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def _load_hidream_transformer(model_dir: str, dtype, quantize: str | None):
    """Load (and optionally quantize) the MoE DiT HOST-side — conversion
    pinned to the CPU backend so a full-size (17 B-param) fp32 state dict
    never lands on the accelerator. Mirrors the reference's three-stage
    load/unload (uce_hidream_edit.py:16-28, 51-64, 97-108)."""
    tcfg = hd_mod.HiDreamConfig.from_hf(
        load_json(os.path.join(model_dir, "transformer", "config.json")))
    with host_device_scope():
        tparams = hd_mod.convert_hf_state_dict(
            load_state_dict(model_dir, "transformer", dtype=np.float32),
            tcfg)
        tparams = unet_mod.cast_params(tparams, dtype)
        if quantize:
            from uce_tpu.models import quantize as quantize_mod

            tparams = quantize_mod.quantize_params(
                tparams, quantize_mod.HIDREAM_SKIP, mode=quantize)
    return tparams, tcfg


@dataclasses.dataclass
class HiDreamPipeline:
    transformer_params: dict | None
    transformer_config: hd_mod.HiDreamConfig
    clip_params: dict
    clip_config: clip_text.CLIPTextConfig
    clip_tokenizer: object
    clip_params_2: dict
    clip_config_2: clip_text.CLIPTextConfig
    clip_tokenizer_2: object
    t5_params: dict
    t5_config: t5_mod.T5Config
    t5_tokenizer: object
    llama_params: dict
    llama_config: llama_mod.LlamaConfig
    llama_tokenizer: object
    vae_params: dict
    vae_config: vae_mod.VAEConfig
    scheduler_config: dict
    dtype: object = jnp.bfloat16
    max_sequence_length: int = 128
    # staged loading (from_pretrained(staged=True)): deferred DiT source
    model_dir: str | None = None
    pending_quantize: str | None = None
    pending_edits: list = dataclasses.field(default_factory=list)
    # optional jax.sharding.Mesh (apply_mesh) for multi-chip generation
    mesh: object | None = None

    @classmethod
    def from_pretrained(cls, model_dir: str, llama_dir: str | None = None,
                        dtype=jnp.bfloat16,
                        max_sequence_length: int = 128,
                        staged: bool = False,
                        quantize: str | None = None) -> "HiDreamPipeline":
        """Load a HiDream snapshot (+ separate Llama dir).

        staged=True defers the 17 B-param MoE DiT until the first
        generation call — encode prompts, ``free_encoders()``, then the
        DiT (optionally ``quantize``d host-side) loads into the vacated
        HBM: the reference's three-phase staging for one chip.
        """
        from transformers import AutoTokenizer

        if staged:
            tcfg = hd_mod.HiDreamConfig.from_hf(
                load_json(os.path.join(model_dir, "transformer",
                                       "config.json")))
            tparams = None
        else:
            tparams, tcfg = _load_hidream_transformer(model_dir, dtype,
                                                      quantize)

        def clip(sub, tok):
            cfg = clip_text.CLIPTextConfig.from_hf(
                load_json(os.path.join(model_dir, sub, "config.json")))
            params = clip_text.convert_hf_state_dict(
                load_state_dict(model_dir, sub, dtype=np.float32), cfg)
            return params, cfg, AutoTokenizer.from_pretrained(
                os.path.join(model_dir, tok))

        cparams, ccfg, ctok = clip("text_encoder", "tokenizer")
        cparams2, ccfg2, ctok2 = clip("text_encoder_2", "tokenizer_2")

        t5cfg = t5_mod.T5Config.from_hf(
            load_json(os.path.join(model_dir, "text_encoder_3",
                                   "config.json")))
        t5params = t5_mod.convert_hf_state_dict(
            load_state_dict(model_dir, "text_encoder_3", dtype=np.float32),
            t5cfg)
        t5tok = AutoTokenizer.from_pretrained(
            os.path.join(model_dir, "tokenizer_3"))

        # Llama-3.1 ships separately (the reference loads it from
        # meta-llama/Meta-Llama-3.1-8B-Instruct, uce_hidream_edit.py:44-50);
        # fall back to an in-snapshot text_encoder_4 if present.
        if llama_dir is None:
            cand = os.path.join(model_dir, "text_encoder_4")
            if os.path.isdir(cand):
                llama_dir = cand
            else:
                raise ValueError(
                    "HiDream needs the Llama-3.1 encoder: pass llama_dir")
        lcfg = llama_mod.LlamaConfig.from_hf(
            load_json(os.path.join(llama_dir, "config.json")))
        lparams = llama_mod.convert_hf_state_dict(
            load_state_dict(llama_dir, None,
                            keys=lambda k: not k.startswith("lm_head"),
                            dtype=np.float32), lcfg)
        ltok_dir = (os.path.join(model_dir, "tokenizer_4")
                    if os.path.isdir(os.path.join(model_dir, "tokenizer_4"))
                    else llama_dir)
        ltok = AutoTokenizer.from_pretrained(ltok_dir)
        if ltok.pad_token is None:
            # stock Llama-3.1 has no pad token; padding='max_length'
            # would raise (diffusers' pipeline substitutes eos the same
            # way before batching)
            ltok.pad_token = ltok.eos_token

        vcfg = vae_mod.VAEConfig.from_hf(
            load_json(os.path.join(model_dir, "vae", "config.json")))
        vparams = unet_mod.nest_state_dict(
            load_state_dict(model_dir, "vae", dtype=np.float32), dtype)
        sp = os.path.join(model_dir, "scheduler", "scheduler_config.json")
        scfg = (load_json(sp) if os.path.exists(sp)
                else {"_class_name": "FlowMatchEulerDiscreteScheduler",
                      "shift": 3.0})
        return cls(
            transformer_params=tparams, transformer_config=tcfg,
            clip_params=cparams, clip_config=ccfg, clip_tokenizer=ctok,
            clip_params_2=cparams2, clip_config_2=ccfg2,
            clip_tokenizer_2=ctok2,
            t5_params=t5params, t5_config=t5cfg, t5_tokenizer=t5tok,
            llama_params=lparams, llama_config=lcfg, llama_tokenizer=ltok,
            vae_params=vparams, vae_config=vcfg, scheduler_config=scfg,
            dtype=dtype, max_sequence_length=max_sequence_length,
            model_dir=model_dir, pending_quantize=quantize,
        )

    def free_encoders(self) -> None:
        """Drop all four text encoders' params (CLIP-L/G, T5, Llama) —
        frees their device memory once no embeddings reference them.
        After this, only ``generate_from_embeddings`` works."""
        self.clip_params = self.clip_params_2 = None
        self.t5_params = self.llama_params = None

    def apply_mesh(self, mesh) -> None:
        """Multi-chip generation: image batch over the mesh 'data' axis;
        a 'model' axis > 1 lays the MoE DiT out tensor/expert-parallel
        (parallel/mesh.shard_hidream_params). On a staged pipeline the
        layout is deferred with the DiT itself, preserving staging's
        memory contract (encoders first, DiT into the vacated HBM).
        Pass None to revert: batch sharding stops, and a model-sharded
        DiT is gathered back to the default device."""
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
            from uce_tpu.parallel.mesh import shard_hidream_params

            self.transformer_params = shard_hidream_params(
                self.transformer_params, mesh)
        # staged (params not loaded yet): _ensure_transformer lays the
        # DiT out over self.mesh at load time

    def _ensure_transformer(self) -> None:
        if self.transformer_params is None:
            if self.model_dir is None:
                raise RuntimeError(
                    "staged pipeline has no model_dir to load the DiT from")
            self.transformer_params, self.transformer_config = \
                _load_hidream_transformer(self.model_dir, self.dtype,
                                          self.pending_quantize)
            for path in self.pending_edits:
                self.load_uce_edits(path)
            self.pending_edits = []
            if (self.mesh is not None
                    and dict(self.mesh.shape).get("model", 1) > 1):
                from uce_tpu.parallel.mesh import shard_hidream_params

                self.transformer_params = shard_hidream_params(
                    self.transformer_params, self.mesh)

    def quantize_weights(self, mode: str = "w8") -> None:
        """Quantize the MoE DiT weights in place (models/quantize.py).

        ``mode="w8"`` = weight-only int8 (bf16 arithmetic) with
        per-(layer, expert, out-channel) scales on the routed-expert
        banks — halves the 17 B-param transformer's HBM residency. The
        UCE edit targets (caption_projection.*) and the MoE router gate
        stay float (quantize.HIDREAM_SKIP).
        """
        from uce_tpu.models import quantize as quantize_mod

        if self.transformer_params is None:  # staged: quantize at load
            self.pending_quantize = mode
            return
        self.transformer_params = quantize_mod.quantize_params(
            self.transformer_params, quantize_mod.HIDREAM_SKIP, mode=mode)

    def load_uce_edits(self, safetensors_path: str) -> None:
        """Overlay UCE-edited caption projections (uce_hidream_edit.py
        artifacts: 'caption_projection.<i>.linear.weight' keys)."""
        if self.transformer_params is None:  # staged: apply at DiT load
            self.pending_edits.append(safetensors_path)
            return
        from safetensors.numpy import load_file

        import re

        edits = load_file(safetensors_path)
        cp = self.transformer_params["caption_projection"]
        n_llama = cp["llama"]["weight"].shape[0]
        llama_w = None  # host copy of the full bank, pulled only on demand
        touched_llama = False
        for key, v in edits.items():
            m = re.match(r"caption_projection\.(\d+)\.linear\.weight$", key)
            if m is None:
                print(f"load_uce_edits: skipped unknown key {key}")
                continue
            i = int(m.group(1))
            if i > n_llama:
                # only index n_llama is the T5 projection; anything beyond
                # means the artifact came from a different model config —
                # llama and t5 weights share a shape, so routing it to t5
                # would silently corrupt the model
                raise ValueError(
                    f"{key}: index {i} exceeds this model's "
                    f"{n_llama} llama + 1 t5 caption projections")
            w = np.swapaxes(np.asarray(v, np.float32), -1, -2)
            expected = (cp["llama"]["weight"].shape[1:] if i < n_llama
                        else cp["t5"]["weight"].shape)
            if w.shape != tuple(expected):
                raise ValueError(
                    f"{key}: shape {v.shape} does not match the model's "
                    f"caption projection {tuple(expected)[::-1]}")
            if i < n_llama:
                if llama_w is None:
                    # deferred: a T5-only (or no-op) artifact must not pay
                    # the full-bank device->host->device round-trip
                    llama_w = np.array(cp["llama"]["weight"], np.float32)
                llama_w[i] = w
                touched_llama = True
            else:
                cp["t5"]["weight"] = jnp.asarray(w, self.dtype)
        if touched_llama:
            cp["llama"]["weight"] = jnp.asarray(llama_w, self.dtype)

    # --------------------------------------------------------------- text
    def encode_prompts(self, prompts: Sequence[str]):
        """Returns (t5 [B,S,D], llama [num_blocks, B, S, D] selected by
        llama_layers, pooled [B, 768+1280])."""
        if self.clip_params is None or self.t5_params is None \
                or self.llama_params is None:
            raise RuntimeError(
                "encoders were freed (free_encoders); encode prompts "
                "before freeing, then use generate_from_embeddings")
        pooled_parts = []
        for params, cfg, tok in (
            (self.clip_params, self.clip_config, self.clip_tokenizer),
            (self.clip_params_2, self.clip_config_2, self.clip_tokenizer_2),
        ):
            ids, _ = emb.tokenize_batch(tok, list(prompts),
                                        cfg.max_position_embeddings)
            _, pooled, _ = clip_text.encode_tokens(params, jnp.asarray(ids),
                                                   cfg)
            pooled_parts.append(pooled)
        pooled = jnp.concatenate(pooled_parts, axis=-1).astype(self.dtype)

        ids_t, mask_t = emb.tokenize_batch(self.t5_tokenizer, list(prompts),
                                           self.max_sequence_length)
        t5_out = t5_mod.encode_tokens(
            self.t5_params, jnp.asarray(ids_t), jnp.asarray(mask_t),
            self.t5_config).astype(self.dtype)

        ids_l, mask_l = emb.tokenize_batch(self.llama_tokenizer,
                                           list(prompts),
                                           self.max_sequence_length)
        hidden = llama_mod.encode_tokens(
            self.llama_params, jnp.asarray(ids_l), jnp.asarray(mask_l),
            self.llama_config)
        stack = hidden[1:]  # HF hidden_states[1:], uce_hidream_edit.py:72-91
        sel = jnp.stack([stack[i] for i in
                         self.transformer_config.llama_layers])
        return t5_out, sel.astype(self.dtype), pooled

    # ----------------------------------------------------------- generate
    def __call__(
        self,
        prompt: str | Sequence[str],
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        num_images_per_prompt: int = 1,
        seed: int = 0,
        height: int = 1024,
        width: int = 1024,
        negative_prompt: str | Sequence[str] | None = None,
        fast=None,
    ) -> np.ndarray:
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        n_prompts = len(prompts)
        prompts = [p for p in prompts for _ in range(num_images_per_prompt)]
        bsz = len(prompts)
        do_cfg = guidance_scale > 1.0
        t5_c, llama_c, pooled_c = self.encode_prompts(prompts)
        if do_cfg:
            if negative_prompt is None:
                negatives = [""] * bsz
            elif isinstance(negative_prompt, str):
                negatives = [negative_prompt] * bsz
            else:
                negatives = [n for n in negative_prompt
                             for _ in range(num_images_per_prompt)]
                if len(negatives) != bsz:
                    raise ValueError(
                        "len(negative_prompt) must match len(prompt)")
            t5_u, llama_u, pooled_u = self.encode_prompts(negatives)
            t5_e = jnp.concatenate([t5_u, t5_c], axis=0)
            llama_e = jnp.concatenate([llama_u, llama_c], axis=1)
            pooled_e = jnp.concatenate([pooled_u, pooled_c], axis=0)
        else:
            t5_e, llama_e, pooled_e = t5_c, llama_c, pooled_c
        return self.generate_from_embeddings(
            t5_e, llama_e, pooled_e, do_cfg=do_cfg, n_prompts=n_prompts,
            num_images_per_prompt=num_images_per_prompt,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, seed=seed,
            height=height, width=width, fast=fast)

    def generate_from_embeddings(
        self,
        t5_e: jnp.ndarray,
        llama_e: jnp.ndarray,
        pooled_e: jnp.ndarray,
        do_cfg: bool = False,
        n_prompts: int | None = None,
        num_images_per_prompt: int = 1,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        seed: int = 0,
        height: int = 1024,
        width: int = 1024,
        fast=None,
    ) -> np.ndarray:
        """Generate from precomputed embeddings (CFG-concatenated when
        ``do_cfg``: uncond rows first) — the staged path: encode,
        ``free_encoders()``, and the MoE DiT loads on first use into the
        freed HBM.

        ``fast``: optional ``sampler.FastConfig`` with a ``cfg_interval``
        window — outside it, only the cond branch of the DiT runs (half
        the batch). HiDream's protocol is 50 steps at CFG 5.0, so the
        window halves most of the dominant MoE-DiT cost. DeepCache does
        not apply to a DiT (no deep/shallow U-split): ``cache_interval``
        must stay 1.
        """
        if fast is not None:
            if fast.cache_interval != 1:
                raise ValueError(
                    "HiDream fast mode supports cfg_interval only "
                    "(a DiT has no deep UNet levels to cache)")
            if fast.cfg_interval is None or not do_cfg:
                fast = None  # nothing to confine: share the exact path
        self._ensure_transformer()
        rows = t5_e.shape[0]
        bsz = rows // (2 if do_cfg else 1)
        if n_prompts is None:
            n_prompts = bsz // num_images_per_prompt
        if (n_prompts * num_images_per_prompt * (2 if do_cfg else 1) != rows
                or pooled_e.shape[0] != rows
                or llama_e.shape[1] != rows):
            raise ValueError(
                f"embedding rows (t5 {rows}, pooled {pooled_e.shape[0]}, "
                f"llama {llama_e.shape[1]}) must equal n_prompts "
                f"({n_prompts}) x num_images_per_prompt "
                f"({num_images_per_prompt})"
                + (" x 2 (CFG: uncond rows first)" if do_cfg else "")
                + "; embeds must be pre-expanded per sample")

        vae_scale = 2 ** (len(self.vae_config.block_out_channels) - 1)
        gran = 2 * vae_scale  # VAE downsampling x the 2x2 patch pack
        if height % gran or width % gran:
            raise ValueError(
                f"height/width must be multiples of {gran} "
                f"(got {height}x{width}): VAE scale {vae_scale} x the 2x2 "
                "latent patchify")
        lh, lw = height // vae_scale, width // vae_scale
        lc = self.vae_config.latent_channels
        packed = pack_latents(jnp.asarray(
            torch_rng.draw_prompt_latents(
                (lh, lw, lc), seed, n_prompts, num_images_per_prompt),
            self.dtype))

        use_dyn = self.scheduler_config.get("use_dynamic_shifting", False)
        plan = schedulers.flow_match_euler_plan(
            num_inference_steps,
            shift=self.scheduler_config.get("shift", 3.0),
            use_dynamic_shifting=use_dyn,
            mu=compute_shift_mu(
                packed.shape[1],
                self.scheduler_config.get("base_image_seq_len", 256),
                self.scheduler_config.get("max_image_seq_len", 4096),
                self.scheduler_config.get("base_shift", 0.5),
                self.scheduler_config.get("max_shift", 1.15),
            ) if use_dyn else None,
        )
        images = _hidream_generate_jit(
            self, plan, packed, t5_e, llama_e, pooled_e,
            float(guidance_scale), do_cfg, (lh, lw), fast)
        return np.asarray(images)


@functools.lru_cache(maxsize=8)
def _compiled_hidream_generate(config, vae_config, plan_key, shape_key,
                               do_cfg, latent_hw, fast=None):
    lh, lw = latent_hw
    img_ids = make_img_ids(lh, lw)

    # guidance_scale rides as a TRACED argument (like the SD and FLUX
    # pipelines): a guidance sweep must not recompile the transformer.
    def fn(params, vae_params, plan, packed, t5_e, llama_e, pooled_e,
           guidance_scale):
        sigmas = plan.tables["sigmas"]
        bsz = packed.shape[0]

        def make_body(cond_only):
            def body(carry, i):
                lat, _ = carry
                t = plan.timesteps[i]
                if cond_only:  # CFG window: only the cond rows run
                    lat_in = lat
                    te, le, pe = t5_e[bsz:], llama_e[:, bsz:], pooled_e[bsz:]
                else:
                    lat_in = (jnp.concatenate([lat, lat], axis=0)
                              if do_cfg else lat)
                    te, le, pe = t5_e, llama_e, pooled_e
                pred = hd_mod.apply(
                    params, lat_in, te, le, pe,
                    jnp.broadcast_to(t, (lat_in.shape[0],)), img_ids,
                    config)
                v = -pred  # HiDream predicts the negated flow
                if do_cfg and not cond_only:
                    unc, txt = jnp.split(v, 2, axis=0)
                    v = unc + guidance_scale * (txt - unc)
                new = lat.astype(jnp.float32) + (
                    sigmas[i + 1] - sigmas[i]) * v.astype(jnp.float32)
                return (new.astype(lat.dtype), 0.0), None
            return body

        total = plan.num_calls
        segs = (fast.segments(total) if fast is not None
                else [(0, total, False)])
        carry = (packed, 0.0)
        for seg_start, seg_end, cond_only in segs:
            carry, _ = jax.lax.scan(
                make_body(cond_only), carry,
                jnp.arange(seg_start, seg_end))
        final = carry[0]
        lat = unpack_latents(final, lh, lw).astype(jnp.float32)
        lat = lat / vae_config.scaling_factor + vae_config.shift_factor
        imgs = vae_mod.decode(vae_params, lat.astype(packed.dtype),
                              vae_config)
        imgs = (imgs.astype(jnp.float32) / 2 + 0.5).clip(0.0, 1.0)
        return jnp.round(imgs * 255.0).astype(jnp.uint8)

    return jax.jit(fn)


def _hidream_generate_jit(pipe, plan, packed, t5_e, llama_e, pooled_e,
                          guidance, do_cfg, latent_hw, fast=None):
    orig = packed.shape[0]
    mesh = getattr(pipe, "mesh", None)
    if mesh is not None:
        # pad the PER-BRANCH batch to the data axis (CFG rows are
        # [uncond; cond] — padding must land inside each half), shard,
        # slice the images back after
        from uce_tpu.parallel.mesh import (batch_sharding, pad_batch,
                                           pad_batch_branched)

        n_data = dict(mesh.shape)["data"]
        n_br = 2 if do_cfg else 1
        packed = jax.device_put(pad_batch(packed, n_data),
                                batch_sharding(mesh))
        t5_e = jax.device_put(pad_batch_branched(t5_e, n_data, n_br),
                              batch_sharding(mesh))
        pooled_e = jax.device_put(pad_batch_branched(pooled_e, n_data, n_br),
                                  batch_sharding(mesh))
        llama_e = jax.device_put(
            pad_batch_branched(llama_e, n_data, n_br, axis=1),
            batch_sharding(mesh, axis=1))
    fn = _compiled_hidream_generate(
        pipe.transformer_config, pipe.vae_config,
        (plan.kind, plan.num_calls),
        (packed.shape, str(packed.dtype)),
        do_cfg, latent_hw, fast)
    out = fn(pipe.transformer_params, pipe.vae_params, plan, packed,
             t5_e, llama_e, pooled_e, jnp.float32(guidance))
    return out[:orig]
