"""Full text->image pipeline mirror in torch NCHW: the fixed-seed parity
oracle for the BASELINE gate "fixed-seed images match diffusers".

Transcribes the diffusers StableDiffusionPipeline /
StableDiffusionXLPipeline op ordering — tokenize -> CLIP encode (HF
transformers torch models, the very encoders diffusers calls) -> STATEFUL
per-step scheduler objects (set_timesteps / scale_model_input / step with
ets & derivative history, exactly the structure of
diffusers.schedulers.*) -> CFG chunk/guide -> VAE decode x 1/0.18215 ->
(x/2+0.5).clamp(0,1) -> uint8 round, per the reference's hand-rolled loop
(``evalscripts/debiasing_vl.py:114-153``) and eval defaults
(``evalscripts/generate-images-sd.py:37-46,58-62``).

Everything here is deliberately the OPPOSITE architecture of the JAX
pipeline (eager NCHW module loop + mutable scheduler objects vs NHWC
scan + static plan tables), sharing only the snapshot weights — so a
plan-construction, layout, CFG-ordering or uint8-rounding bug in either
side shows up as an image mismatch. Test-only; torch never appears in
the framework's compute path.
"""

from __future__ import annotations

import os

import numpy as np
import torch

from tests.torch_unet_mirror import unet_forward, vae_decode


# ---------------------------------------------------------------------------
# Stateful schedulers (diffusers semantics, numpy float64 tables)
# ---------------------------------------------------------------------------

def _alphas_cumprod(num_train=1000, beta_start=0.00085, beta_end=0.012):
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, num_train,
                        dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


class TorchDDIM:
    """DDIMScheduler, eta=0, clip_sample=False (SD snapshot config)."""

    def __init__(self, num_train=1000, steps_offset=1,
                 set_alpha_to_one=False):
        self.acp = _alphas_cumprod(num_train)
        self.num_train = num_train
        self.steps_offset = steps_offset
        self.final_alpha = 1.0 if set_alpha_to_one else self.acp[0]
        self.init_noise_sigma = 1.0

    def set_timesteps(self, n):
        self.ratio = self.num_train // n
        self.timesteps = ((np.arange(n) * self.ratio).round()[::-1]
                          .astype(np.int64) + self.steps_offset)

    def scale_model_input(self, x, t):
        return x

    def step(self, eps, t, sample):
        prev_t = int(t) - self.ratio
        a_t = self.acp[min(int(t), self.num_train - 1)]
        a_prev = self.acp[prev_t] if prev_t >= 0 else self.final_alpha
        x0 = (sample - (1.0 - a_t) ** 0.5 * eps) / a_t ** 0.5
        return a_prev ** 0.5 * x0 + (1.0 - a_prev) ** 0.5 * eps


class TorchPNDM:
    """PNDMScheduler with skip_prk_steps=True (PLMS) — the SD v1 default.

    Keeps diffusers' counter/ets/cur_sample state machine: the second
    call is a Heun corrector that re-steps the first interval from the
    held sample and does not extend the eps history."""

    def __init__(self, num_train=1000, steps_offset=1,
                 set_alpha_to_one=False):
        self.acp = _alphas_cumprod(num_train)
        self.num_train = num_train
        self.steps_offset = steps_offset
        self.final_alpha = 1.0 if set_alpha_to_one else self.acp[0]
        self.init_noise_sigma = 1.0

    def set_timesteps(self, n):
        self.ratio = self.num_train // n
        ts = ((np.arange(n) * self.ratio).round().astype(np.int64)
              + self.steps_offset)
        self.timesteps = np.concatenate(
            [ts[:-1], ts[-2:-1], ts[-1:]])[::-1].copy()
        self.ets = []
        self.counter = 0
        self.cur_sample = None

    def scale_model_input(self, x, t):
        return x

    def step(self, out, t, sample):
        t = int(t)
        prev_t = t - self.ratio
        if self.counter != 1:
            self.ets = self.ets[-3:]
            self.ets.append(out)
        else:
            prev_t = t
            t = t + self.ratio
        if len(self.ets) == 1 and self.counter == 0:
            eps = out
            self.cur_sample = sample
        elif len(self.ets) == 1 and self.counter == 1:
            eps = (out + self.ets[-1]) / 2
            sample = self.cur_sample
            self.cur_sample = None
        elif len(self.ets) == 2:
            eps = (3 * self.ets[-1] - self.ets[-2]) / 2
        elif len(self.ets) == 3:
            eps = (23 * self.ets[-1] - 16 * self.ets[-2]
                   + 5 * self.ets[-3]) / 12
        else:
            eps = (55 * self.ets[-1] - 59 * self.ets[-2]
                   + 37 * self.ets[-3] - 9 * self.ets[-4]) / 24
        self.counter += 1
        return self._prev_sample(sample, t, prev_t, eps)

    def _prev_sample(self, sample, t, prev_t, eps):
        a_t = self.acp[min(t, self.num_train - 1)]
        a_prev = self.acp[prev_t] if prev_t >= 0 else self.final_alpha
        b_t, b_prev = 1.0 - a_t, 1.0 - a_prev
        sample_coeff = (a_prev / a_t) ** 0.5
        denom = a_t * b_prev ** 0.5 + (a_t * b_t * a_prev) ** 0.5
        return sample_coeff * sample - (a_prev - a_t) * eps / denom


class TorchLMS:
    """LMSDiscreteScheduler, order 4 (the reference's hand-rolled loops)."""

    order = 4

    def __init__(self, num_train=1000):
        self.acp = _alphas_cumprod(num_train)
        self.num_train = num_train

    def set_timesteps(self, n):
        sig_all = ((1.0 - self.acp) / self.acp) ** 0.5
        t_float = np.linspace(0, self.num_train - 1, n,
                              dtype=np.float64)[::-1].copy()
        self.timesteps = t_float
        self.sigmas = np.concatenate(
            [np.interp(t_float, np.arange(self.num_train), sig_all), [0.0]])
        self.init_noise_sigma = float(self.sigmas.max())
        self.derivatives = []
        self.idx = 0

    def scale_model_input(self, x, t):
        sigma = self.sigmas[self.idx]
        return x / float((sigma ** 2 + 1.0) ** 0.5)

    def _lms_coeff(self, order, t, j):
        from scipy.integrate import quad

        def fn(tau):
            prod = 1.0
            for k in range(order):
                if k == j:
                    continue
                prod *= ((tau - self.sigmas[t - k])
                         / (self.sigmas[t - j] - self.sigmas[t - k]))
            return prod

        return quad(fn, self.sigmas[t], self.sigmas[t + 1], epsrel=1e-4)[0]

    def step(self, eps, t, sample):
        sigma = self.sigmas[self.idx]
        x0 = sample - float(sigma) * eps
        self.derivatives.append((sample - x0) / float(sigma))
        if len(self.derivatives) > self.order:
            self.derivatives.pop(0)
        order = min(self.idx + 1, self.order)
        coeffs = [self._lms_coeff(order, self.idx, j) for j in range(order)]
        prev = sample + sum(float(c) * d for c, d in
                            zip(coeffs, reversed(self.derivatives)))
        self.idx += 1
        return prev


class TorchEuler:
    """EulerDiscreteScheduler, leading spacing, s_churn=0 (SD config)."""

    def __init__(self, num_train=1000, steps_offset=1):
        self.acp = _alphas_cumprod(num_train)
        self.num_train = num_train
        self.steps_offset = steps_offset

    def set_timesteps(self, n):
        sig_all = ((1.0 - self.acp) / self.acp) ** 0.5
        ts = ((np.arange(n) * (self.num_train // n)).round()[::-1]
              .astype(np.float64) + self.steps_offset)
        self.timesteps = ts
        self.sigmas = np.concatenate(
            [np.interp(ts, np.arange(self.num_train), sig_all), [0.0]])
        # leading spacing: sqrt(max^2 + 1)
        self.init_noise_sigma = float((self.sigmas.max() ** 2 + 1) ** 0.5)
        self.idx = 0

    def scale_model_input(self, x, t):
        sigma = self.sigmas[self.idx]
        return x / float((sigma ** 2 + 1.0) ** 0.5)

    def step(self, eps, t, sample):
        sigma = float(self.sigmas[self.idx])
        x0 = sample - sigma * eps
        derivative = (sample - x0) / sigma
        prev = sample + float(self.sigmas[self.idx + 1] - sigma) * derivative
        self.idx += 1
        return prev


SCHEDULERS = {
    "ddim": TorchDDIM,
    "pndm": TorchPNDM,
    "lms": TorchLMS,
    "euler": TorchEuler,
}


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------

def _encode_sd(model_dir, prompts):
    from transformers import CLIPTextModel, CLIPTokenizer

    tok = CLIPTokenizer.from_pretrained(os.path.join(model_dir, "tokenizer"))
    te = CLIPTextModel.from_pretrained(
        os.path.join(model_dir, "text_encoder")).eval()
    ids = tok(prompts, padding="max_length",
              max_length=tok.model_max_length, truncation=True,
              return_tensors="pt").input_ids
    with torch.no_grad():
        return te(ids).last_hidden_state, None


def _encode_sdxl(model_dir, prompts):
    """diffusers SDXL encode_prompt: concat of both encoders' PENULTIMATE
    hidden states; pooled projection from encoder 2."""
    from transformers import (CLIPTextModel, CLIPTextModelWithProjection,
                              CLIPTokenizer)

    parts, pooled = [], None
    for te_name, tok_name, cls in (
        ("text_encoder", "tokenizer", CLIPTextModel),
        ("text_encoder_2", "tokenizer_2", CLIPTextModelWithProjection),
    ):
        tok = CLIPTokenizer.from_pretrained(os.path.join(model_dir, tok_name))
        te = cls.from_pretrained(os.path.join(model_dir, te_name)).eval()
        ids = tok(prompts, padding="max_length",
                  max_length=tok.model_max_length, truncation=True,
                  return_tensors="pt").input_ids
        with torch.no_grad():
            out = te(ids, output_hidden_states=True)
        parts.append(out.hidden_states[-2])
        if cls is CLIPTextModelWithProjection:
            pooled = out.text_embeds
    return torch.cat(parts, dim=-1), pooled


@torch.no_grad()
def generate_images(model_dir, prompt, num_inference_steps=50,
                    guidance_scale=7.5, seed=0, height=512, width=512,
                    scheduler="pndm", num_images_per_prompt=1,
                    uce_edits=None):
    """Returns uint8 images [N, H, W, 3] — the oracle the JAX pipeline's
    output must match to <= 1 uint8 level at fp32.

    ``uce_edits``: optional {module_name}.weight dict overlaid on the UNet
    state dict (the load_state_dict(strict=False) edit overlay)."""
    from uce_tpu.models import unet as unet_mod, vae as vae_mod
    from uce_tpu.models.hf_loader import load_json, load_state_dict

    ucfg = unet_mod.UNetConfig.from_hf(
        load_json(os.path.join(model_dir, "unet", "config.json")))
    usd = load_state_dict(model_dir, "unet", dtype=np.float32)
    if uce_edits:
        usd = dict(usd)
        for k, v in uce_edits.items():
            assert k in usd, f"edit key {k} not in UNet state dict"
            usd[k] = np.asarray(v, np.float32)
    vcfg = vae_mod.VAEConfig.from_hf(
        load_json(os.path.join(model_dir, "vae", "config.json")))
    vsd = load_state_dict(model_dir, "vae", dtype=np.float32)

    prompts = [prompt] if isinstance(prompt, str) else list(prompt)
    prompts = [p for p in prompts for _ in range(num_images_per_prompt)]
    bsz = len(prompts)
    is_sdxl = os.path.isdir(os.path.join(model_dir, "text_encoder_2"))
    encode = _encode_sdxl if is_sdxl else _encode_sd
    cond, pooled_cond = encode(model_dir, prompts)
    uncond, pooled_uncond = encode(model_dir, [""] * bsz)
    ctx = torch.cat([uncond, cond], dim=0)

    added_cond = None
    if is_sdxl:
        time_ids = torch.tensor(
            [height, width, 0, 0, height, width],
            dtype=torch.float32).repeat(2 * bsz, 1)
        added_cond = {
            "text_embeds": torch.cat([pooled_uncond, pooled_cond], dim=0),
            "time_ids": time_ids,
        }

    sched = SCHEDULERS[scheduler]()
    sched.set_timesteps(num_inference_steps)

    vae_scale = 2 ** (len(vcfg.block_out_channels) - 1)
    lh, lw = height // vae_scale, width // vae_scale
    gen = torch.Generator("cpu").manual_seed(int(seed))
    latents = torch.randn((bsz, ucfg.in_channels, lh, lw), generator=gen,
                          dtype=torch.float32)
    latents = latents * sched.init_noise_sigma

    for t in sched.timesteps:
        lat_in = torch.cat([latents] * 2, dim=0)
        lat_in = sched.scale_model_input(lat_in, t)
        tt = torch.full((2 * bsz,), float(t), dtype=torch.float32)
        eps = unet_forward(usd, lat_in, tt, ctx, ucfg, added_cond=added_cond)
        eps_u, eps_c = eps.chunk(2, dim=0)
        eps = eps_u + guidance_scale * (eps_c - eps_u)
        latents = sched.step(eps, t, latents)

    img = vae_decode(vsd, latents / vcfg.scaling_factor, vcfg)
    img = (img / 2 + 0.5).clamp(0.0, 1.0)
    img = (img * 255.0).round().to(torch.uint8)
    return img.permute(0, 2, 3, 1).numpy()
