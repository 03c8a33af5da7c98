"""End-to-end pipeline tests on the tiny snapshot."""

import numpy as np
import pytest

from tests.snapshot import make_sd_snapshot
from uce_tpu.diffusion.pipeline import SDPipeline


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    return make_sd_snapshot(tmp_path_factory.mktemp("snap"))


@pytest.fixture(scope="module")
def pipe(snapshot):
    import jax.numpy as jnp

    return SDPipeline.from_pretrained(snapshot, dtype=jnp.float32)


def test_generate_images(pipe):
    imgs = pipe("a photo of a cat", num_inference_steps=3, seed=42,
                height=32, width=32)
    assert imgs.shape == (1, 32, 32, 3) and imgs.dtype == np.uint8


def test_fixed_seed_deterministic(pipe):
    a = pipe("dog", num_inference_steps=2, seed=7, height=32, width=32)
    b = pipe("dog", num_inference_steps=2, seed=7, height=32, width=32)
    np.testing.assert_array_equal(a, b)
    c = pipe("dog", num_inference_steps=2, seed=8, height=32, width=32)
    assert (a != c).any()


def test_prompt_conditioning_matters(pipe):
    a = pipe("cat", num_inference_steps=2, seed=7, height=32, width=32,
             guidance_scale=7.5)
    b = pipe("submarine", num_inference_steps=2, seed=7, height=32, width=32,
             guidance_scale=7.5)
    assert (a != b).any()


def test_uce_edit_changes_output(pipe, snapshot, tmp_path):
    from uce_tpu.edit import sd as edit_sd

    base = pipe("van gogh painting", num_inference_steps=2, seed=3,
                height=32, width=32)
    res = edit_sd.load_resources(snapshot)
    edit_sd.run_erase(res, ["van gogh"], ["art"], [],
                      save_dir=str(tmp_path), exp_name="e")
    pipe.load_uce_edits(str(tmp_path / "e.safetensors"))
    try:
        edited = pipe("van gogh painting", num_inference_steps=2, seed=3,
                      height=32, width=32)
        assert (base != edited).any()
    finally:
        # restore by reloading original weights for other tests
        import jax.numpy as jnp

        fresh = SDPipeline.from_pretrained(snapshot, dtype=jnp.float32)
        pipe.unet_params = fresh.unet_params


def test_scheduler_variants(pipe):
    for name in ("ddim", "lms", "euler", "pndm"):
        imgs = pipe("x", num_inference_steps=2, seed=1, height=32, width=32,
                    scheduler=name)
        assert imgs.shape == (1, 32, 32, 3), name


def test_negative_prompt_and_nonsquare(pipe):
    base = pipe("a cat", num_inference_steps=2, seed=3, height=32, width=32)
    neg = pipe("a cat", num_inference_steps=2, seed=3, height=32, width=32,
               negative_prompt="blurry, low quality")
    assert (base != neg).any()  # negative prompt changes the uncond branch
    wide = pipe("a cat", num_inference_steps=2, seed=3, height=32, width=64)
    assert wide.shape == (1, 32, 64, 3)
