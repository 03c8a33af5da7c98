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


def test_list_seed_distinct_samples_within_prompt(pipe):
    """Regression: seed=[s] with num_images_per_prompt>1 must advance the
    per-prompt generator across samples (reference
    generate-images-sd.py:37-42), not repeat one (1,...) draw."""
    imgs = pipe("cat", num_inference_steps=2, seed=[5],
                num_images_per_prompt=2, height=32, width=32)
    assert imgs.shape[0] == 2
    assert (imgs[0] != imgs[1]).any(), "samples of one prompt are identical"


def test_list_seed_first_sample_matches_single_draw(pipe):
    """torch.Generator sequential-draw semantics: the first of N samples
    equals the single-sample draw from the same seed."""
    one = pipe("cat", num_inference_steps=2, seed=[5],
               num_images_per_prompt=1, height=32, width=32)
    two = pipe("cat", num_inference_steps=2, seed=[5],
               num_images_per_prompt=2, height=32, width=32)
    np.testing.assert_array_equal(one[0], two[0])


def test_list_seed_multi_prompt_blocks(pipe):
    """Two prompts x two samples: per-prompt generators are independent, so
    the same seed list gives reproducible, prompt-blocked latents."""
    imgs = pipe(["cat", "dog"], num_inference_steps=2, seed=[5, 9],
                num_images_per_prompt=2, height=32, width=32)
    assert imgs.shape[0] == 4
    assert (imgs[0] != imgs[1]).any() and (imgs[2] != imgs[3]).any()
    again = pipe(["cat", "dog"], num_inference_steps=2, seed=[5, 9],
                 num_images_per_prompt=2, height=32, width=32)
    np.testing.assert_array_equal(imgs, again)


def test_list_seed_length_mismatch_raises(pipe):
    with pytest.raises(ValueError):
        pipe(["cat", "dog"], num_inference_steps=2, seed=[5],
             height=32, width=32)


def test_rejects_nonmultiple_size(pipe):
    """height/width off the latent granularity must fail loudly, not
    silently floor to a smaller image."""
    with pytest.raises(ValueError, match="multiples"):
        pipe("a cat", num_inference_steps=2, height=33, width=32)


def test_debias_vl_requires_projection(pipe):
    with pytest.raises(ValueError, match="debias_projection"):
        pipe("a doctor", num_inference_steps=2, height=32, width=32,
             mode="debias_vl")
