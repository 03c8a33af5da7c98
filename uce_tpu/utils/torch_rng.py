"""Torch-parity RNG for fixed-seed image reproduction.

The reference seeds generation with ``torch.Generator().manual_seed(seed)``
(``evalscripts/generate-images-sd.py:37-42``) and initial latents are the
only stochastic input of the deterministic samplers, so bit-matching the
initial gaussian is what "fixed-seed images match diffusers" reduces to.

When torch is importable (it is CPU-only in this image) we draw the initial
latents with a CPU ``torch.Generator`` — exactly diffusers' ``randn_tensor``
path. Without torch we fall back to ``jax.random`` (documented
non-parity).
"""

from __future__ import annotations

import numpy as np


def torch_available() -> bool:
    try:
        import torch  # noqa: F401

        return True
    except ImportError:  # pragma: no cover
        return False


def randn(shape, seed: int, dtype=np.float32, layout: str = "nchw_to_nhwc"):
    """Gaussian noise matching torch.manual_seed semantics.

    diffusers draws latents in NCHW; our pipeline is NHWC, so with the
    default layout a 4D draw happens in NCHW order then transposes —
    preserving bit-parity with the reference.
    """
    if torch_available():
        import torch

        gen = torch.Generator("cpu").manual_seed(int(seed))
        if layout == "nchw_to_nhwc" and len(shape) == 4:
            b, h, w, c = shape
            t = torch.randn((b, c, h, w), generator=gen, dtype=torch.float32)
            arr = t.numpy().transpose(0, 2, 3, 1)
        else:
            t = torch.randn(tuple(shape), generator=gen, dtype=torch.float32)
            arr = t.numpy()
        return arr.astype(dtype)
    # Fallback: numpy (NOT bit-compatible with torch; used only when torch
    # is absent).
    rng = np.random.default_rng(seed)
    if layout == "nchw_to_nhwc" and len(shape) == 4:
        b, h, w, c = shape
        return rng.standard_normal((b, c, h, w)).transpose(0, 2, 3, 1).astype(dtype)
    return rng.standard_normal(tuple(shape)).astype(dtype)


def draw_prompt_latents(shape_hw_c, seed, n_prompts: int,
                        num_images_per_prompt: int,
                        dtype=np.float32) -> np.ndarray:
    """Initial latents with reference generator semantics, shared by every
    pipeline (SD/SDXL, FLUX, HiDream).

    int seed: ONE generator draws the whole batch sequentially (diffusers
    single-generator batching).  list seed: one generator per prompt
    (``evalscripts/generate-images-sd.py:37-42``), each advancing across
    that prompt's ``num_images_per_prompt`` samples — so samples within a
    prompt are distinct (generator-list parity)."""
    h, w, c = shape_hw_c
    total = n_prompts * num_images_per_prompt
    if isinstance(seed, (int, np.integer)):
        return randn((total, h, w, c), int(seed), dtype)
    if len(seed) != n_prompts:
        raise ValueError("len(seed) must match len(prompt)")
    return np.concatenate([
        randn((num_images_per_prompt, h, w, c), int(s), dtype)
        for s in seed])
