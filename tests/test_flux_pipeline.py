"""FLUX pipeline tests: packing round-trip + tiny end-to-end generation."""

import numpy as np
import jax.numpy as jnp
import pytest

from uce_tpu.diffusion import pipeline_flux as pf
from uce_tpu.models import clip_text, flux as flux_mod, t5 as t5_mod
from uce_tpu.models import vae as vae_mod
from tests.helpers import ToyTokenizer


def test_pack_unpack_roundtrip(rng):
    lat = jnp.asarray(rng.standard_normal((2, 8, 12, 4)), jnp.float32)
    packed = pf.pack_latents(lat)
    assert packed.shape == (2, 4 * 6, 16)
    back = pf.unpack_latents(packed, 8, 12)
    np.testing.assert_allclose(np.asarray(back), np.asarray(lat))


def test_img_ids_grid():
    ids = pf.make_img_ids(8, 12)
    assert ids.shape == (24, 3)
    assert (ids[:, 0] == 0).all()
    assert ids[:, 1].max() == 3 and ids[:, 2].max() == 5
    assert ids[7][1] == 1 and ids[7][2] == 1  # row-major (y, x)


def test_shift_mu_endpoints():
    assert abs(pf.compute_shift_mu(256) - 0.5) < 1e-9
    assert abs(pf.compute_shift_mu(4096) - 1.15) < 1e-9


@pytest.fixture(scope="module")
def tiny_flux_pipe():
    tcfg = flux_mod.FluxConfig(
        in_channels=16, num_layers=1, num_single_layers=1,
        attention_head_dim=8, num_attention_heads=4,
        joint_attention_dim=16, pooled_projection_dim=24,
        guidance_embeds=False, axes_dims_rope=(4, 2, 2))
    t5cfg = t5_mod.T5Config(
        vocab_size=99, d_model=16, d_kv=4, d_ff=32, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16)
    ccfg = clip_text.CLIPTextConfig(
        vocab_size=99, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=16, eos_token_id=98)
    vcfg = vae_mod.VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                             norm_num_groups=4, latent_channels=4,
                             scaling_factor=0.3611, shift_factor=0.1159)
    # larger init scale so text-stream influence clears uint8 quantization
    return pf.FluxPipeline(
        transformer_params=flux_mod.init_params(tcfg, 0, scale=0.3),
        transformer_config=tcfg,
        t5_params=t5_mod.init_params(np.random.default_rng(1), t5cfg),
        t5_config=t5cfg, t5_tokenizer=ToyTokenizer(),
        clip_params=clip_text.init_params(np.random.default_rng(2), ccfg),
        clip_config=ccfg, clip_tokenizer=ToyTokenizer(),
        vae_params=vae_mod.init_params(vcfg, 3),
        vae_config=vcfg,
        scheduler_config={"_class_name": "FlowMatchEulerDiscreteScheduler",
                          "shift": 1.0},
        dtype=jnp.float32, max_sequence_length=16,
    )


def test_flux_generation(tiny_flux_pipe):
    imgs = tiny_flux_pipe("a cat on mars", num_inference_steps=2, seed=4,
                          height=16, width=16)
    assert imgs.shape == (1, 16, 16, 3) and imgs.dtype == np.uint8
    again = tiny_flux_pipe("a cat on mars", num_inference_steps=2, seed=4,
                           height=16, width=16)
    np.testing.assert_array_equal(imgs, again)
    other = tiny_flux_pipe("a dog", num_inference_steps=2, seed=4,
                           height=16, width=16)
    assert (imgs != other).any()


def test_flux_edit_changes_generation(tiny_flux_pipe, tmp_path):
    base = tiny_flux_pipe("van gogh style", num_inference_steps=2, seed=9,
                          height=16, width=16)
    # fabricate a context_embedder edit artifact and overlay it
    from safetensors.numpy import save_file

    d_in = tiny_flux_pipe.transformer_config.joint_attention_dim
    d_out = tiny_flux_pipe.transformer_config.inner_dim
    rng = np.random.default_rng(0)
    save_file({"context_embedder.weight":
               (rng.standard_normal((d_out, d_in)) * 0.02).astype(np.float32)},
              str(tmp_path / "edit.safetensors"))
    tiny_flux_pipe.load_uce_edits(str(tmp_path / "edit.safetensors"))
    edited = tiny_flux_pipe("van gogh style", num_inference_steps=2, seed=9,
                            height=16, width=16)
    assert (base != edited).any()


def test_flux_multi_seed_batch(tiny_flux_pipe):
    batched = tiny_flux_pipe(["cat", "dog"], num_inference_steps=2,
                             seed=[3, 4], height=16, width=16)
    solo = tiny_flux_pipe("dog", num_inference_steps=2, seed=4,
                          height=16, width=16)
    np.testing.assert_array_equal(batched[1], solo[0])


def test_flux_list_seed_distinct_samples(tiny_flux_pipe):
    """Regression: per-prompt generator must advance across samples."""
    imgs = tiny_flux_pipe("cat", num_inference_steps=2, seed=[5],
                          num_images_per_prompt=2, height=32, width=32)
    assert imgs.shape[0] == 2
    assert (imgs[0] != imgs[1]).any(), "samples of one prompt are identical"


# ---------------------------------------------------------------------------
# disk-snapshot loading: eager vs staged (encode -> free encoders -> DiT)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def flux_snapshot(tmp_path_factory):
    from tests.snapshot import make_flux_snapshot

    return make_flux_snapshot(tmp_path_factory.mktemp("flux_snap"))


def test_from_pretrained_generates(flux_snapshot):
    pipe = pf.FluxPipeline.from_pretrained(flux_snapshot,
                                           max_sequence_length=16)
    imgs = pipe("a cat", num_inference_steps=2, seed=4, height=16, width=16)
    assert imgs.shape == (1, 16, 16, 3) and imgs.dtype == np.uint8


def test_staged_matches_eager(flux_snapshot):
    """Staged (encode -> free_encoders -> lazy DiT load) must produce the
    SAME images as the eager path — the reference's three-phase memory
    staging (uce_flux_edit.py:15-41) without behavior change."""
    eager = pf.FluxPipeline.from_pretrained(flux_snapshot,
                                            max_sequence_length=16)
    ref = eager("a cat", num_inference_steps=2, seed=4, height=16, width=16)

    pipe = pf.FluxPipeline.from_pretrained(flux_snapshot, staged=True,
                                           max_sequence_length=16)
    assert pipe.transformer_params is None  # DiT deferred
    t5, pooled = pipe.encode_prompts(["a cat"])
    pipe.free_encoders()
    with pytest.raises(RuntimeError, match="freed"):
        pipe.encode_prompts(["a dog"])
    got = pipe.generate_from_embeddings(t5, pooled, num_inference_steps=2,
                                        seed=4, height=16, width=16)
    np.testing.assert_array_equal(got, ref)


def test_staged_defers_edits_and_quantize(flux_snapshot, tmp_path):
    """Edits + quantization requested before the staged DiT exists must
    apply at load; edit targets stay float (quantize.FLUX_SKIP)."""
    from safetensors.numpy import save_file as st_save

    from uce_tpu.ops import quant

    pipe = pf.FluxPipeline.from_pretrained(flux_snapshot, staged=True,
                                           quantize="w8",
                                           max_sequence_length=16)
    d = pipe.transformer_config.joint_attention_dim
    D = pipe.transformer_config.inner_dim
    edit = {"context_embedder.weight":
            np.full((D, d), 0.123, np.float32)}
    st_save(edit, str(tmp_path / "edit.safetensors"))
    pipe.load_uce_edits(str(tmp_path / "edit.safetensors"))
    assert pipe.pending_edits  # deferred

    t5, pooled = pipe.encode_prompts(["a cat"])
    pipe.free_encoders()
    pipe.generate_from_embeddings(t5, pooled, num_inference_steps=1,
                                  seed=0, height=16, width=16)
    tp = pipe.transformer_params
    assert not pipe.pending_edits
    np.testing.assert_allclose(
        np.asarray(tp["context_embedder"]["weight"], np.float32), 0.123,
        rtol=1e-2)
    assert quant.is_weight_only(
        tp["transformer_blocks"]["attn"]["to_q"]["weight"])


def test_generate_from_embeddings_validates_rows(flux_snapshot):
    """Mismatched embedding rows must fail with a clear ValueError at the
    API boundary, not a shape error deep inside the jitted DiT."""
    pipe = pf.FluxPipeline.from_pretrained(flux_snapshot,
                                           max_sequence_length=16)
    t5, pooled = pipe.encode_prompts(["a cat", "a dog", "a fox"])
    with pytest.raises(ValueError, match="pre-expanded"):
        pipe.generate_from_embeddings(t5, pooled, num_images_per_prompt=2,
                                      num_inference_steps=1,
                                      height=16, width=16)
    with pytest.raises(ValueError, match="pre-expanded"):
        pipe.generate_from_embeddings(t5, pooled[:2], num_inference_steps=1,
                                      height=16, width=16)


def test_pack_latents_is_channel_major():
    """Pin the diffusers/BFL FLUX packing convention non-circularly:
    packed[k] = lat[py, px, c] at k = c*4 + py*2 + px (channel-major) —
    FluxPipeline._pack_latents does NCHW view -> permute (0,2,4,1,3,5).
    Real x_embedder weights are trained against this order; a pixel-major
    pack would permute their input channels."""
    c_dim = 3
    lat = np.zeros((1, 2, 2, c_dim), np.float32)
    for py in range(2):
        for px in range(2):
            for c in range(c_dim):
                lat[0, py, px, c] = c * 100 + py * 10 + px
    packed = np.asarray(pf.pack_latents(jnp.asarray(lat)))
    assert packed.shape == (1, 1, 4 * c_dim)
    for k in range(4 * c_dim):
        c, rem = divmod(k, 4)
        py, px = divmod(rem, 2)
        assert packed[0, 0, k] == c * 100 + py * 10 + px, (k, c, py, px)
