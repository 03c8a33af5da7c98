"""Fixed-seed FULL-PIPELINE image parity: JAX SDPipeline vs the torch
NCHW mirror (tests/torch_pipeline_mirror.py).

This closes the BASELINE gate "fixed-seed image outputs match diffusers"
as strongly as this image permits (diffusers itself is not installed):
the oracle transcribes diffusers' op ordering with HF transformers text
encoders, stateful scheduler objects and an eager NCHW torch loop —
none of which share code or structure with the JAX scan pipeline — fed
by the same ``torch.Generator`` latents
(``evalscripts/generate-images-sd.py:37-42``). Asserted to <= 1 uint8
level across every SD scheduler and the SDXL dual-encoder path, with
and without a UCE edit overlay.
"""

import numpy as np
import pytest

from tests.snapshot import make_sd_snapshot
from tests.test_sdxl_pipeline import make_sdxl_snapshot


@pytest.fixture(scope="module")
def sd_snap(tmp_path_factory):
    return make_sd_snapshot(tmp_path_factory.mktemp("parity_sd"))


@pytest.fixture(scope="module")
def sdxl_snap(tmp_path_factory):
    return make_sdxl_snapshot(tmp_path_factory.mktemp("parity_sdxl"))


def _run_both(snap, scheduler, prompt="a cat riding a bicycle", steps=6,
              seed=42, size=32, guidance=7.5, uce_path=None):
    import jax.numpy as jnp

    from tests import torch_pipeline_mirror as mirror
    from uce_tpu.diffusion.pipeline import SDPipeline

    pipe = SDPipeline.from_pretrained(snap, dtype=jnp.float32,
                                      scheduler=scheduler)
    if uce_path:
        pipe.load_uce_edits(uce_path)
    ours = pipe(prompt, num_inference_steps=steps,
                guidance_scale=guidance, seed=seed, height=size, width=size)

    edits = None
    if uce_path:
        from safetensors.numpy import load_file

        edits = load_file(uce_path)
    theirs = mirror.generate_images(
        snap, prompt, num_inference_steps=steps, guidance_scale=guidance,
        seed=seed, height=size, width=size, scheduler=scheduler,
        uce_edits=edits)
    return np.asarray(ours), theirs


@pytest.mark.parametrize("scheduler", ["ddim", "pndm", "lms", "euler"])
def test_sd_fixed_seed_image_parity(sd_snap, scheduler):
    ours, theirs = _run_both(sd_snap, scheduler)
    assert ours.shape == theirs.shape == (1, 32, 32, 3)
    assert ours.dtype == theirs.dtype == np.uint8
    diff = np.abs(ours.astype(np.int32) - theirs.astype(np.int32))
    assert diff.max() <= 1, (
        f"{scheduler}: max uint8 diff {diff.max()} "
        f"({(diff > 1).mean():.4%} of pixels beyond 1 level)")


@pytest.mark.parametrize("scheduler", ["euler", "pndm"])
def test_sdxl_fixed_seed_image_parity(sdxl_snap, scheduler):
    ours, theirs = _run_both(sdxl_snap, scheduler, seed=7)
    assert ours.shape == theirs.shape == (1, 32, 32, 3)
    diff = np.abs(ours.astype(np.int32) - theirs.astype(np.int32))
    assert diff.max() <= 1, f"sdxl/{scheduler}: max diff {diff.max()}"


def test_sd_parity_with_uce_edit_overlay(sd_snap, tmp_path):
    """The notebook A/B protocol: both sides overlay the same UCE edit
    safetensors; images must still match — covers the full edit ->
    overlay -> generate path against the independent implementation."""
    import subprocess
    import sys

    out = tmp_path / "edit"
    proc = subprocess.run(
        [sys.executable, "-m", "uce_tpu.cli.main", "edit-sd",
         "--model_id", sd_snap,
         "--edit_concepts", "cat",
         "--concept_type", "object",
         "--erase_scale", "10",  # tiny random weights: make the A/B visible
         "--preserve_concepts", "dog",
         "--save_dir", str(out), "--device", "cpu"],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    st = list(out.glob("*.safetensors"))
    assert len(st) == 1
    ours, theirs = _run_both(sd_snap, "pndm", uce_path=str(st[0]))
    diff = np.abs(ours.astype(np.int32) - theirs.astype(np.int32))
    assert diff.max() <= 1, f"edited: max diff {diff.max()}"

    # and the edit must actually change the image (A/B is a real A/B;
    # tiny random weights -> small but nonzero pixel motion)
    base, _ = _run_both(sd_snap, "pndm")
    assert (base != ours).any()
