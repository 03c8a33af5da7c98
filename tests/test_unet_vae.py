"""UNet / VAE structural tests: shapes, jit, conditioning sensitivity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uce_tpu.models import unet as unet_mod, vae as vae_mod

TINY_UNET = unet_mod.UNetConfig(
    block_out_channels=(8, 16),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    cross_attention_dim=32,
    attention_head_dim=2,
    norm_num_groups=4,
)

TINY_VAE = vae_mod.VAEConfig(
    block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4
)


@pytest.fixture(scope="module")
def unet_params():
    return unet_mod.init_params(TINY_UNET, seed=0)


@pytest.fixture(scope="module")
def vae_params():
    return vae_mod.init_params(TINY_VAE, seed=0)


def test_unet_forward_shape(unet_params):
    x = jnp.zeros((2, 16, 16, 4))
    ctx = jnp.zeros((2, 8, 32))
    out = unet_mod.apply(unet_params, x, jnp.asarray([10.0, 20.0]), ctx, TINY_UNET)
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_jit_and_text_conditioning(unet_params):
    f = jax.jit(lambda x, t, c: unet_mod.apply(unet_params, x, t, c, TINY_UNET))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    c1 = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    c2 = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    t = jnp.asarray([5.0])
    o1, o1b, o2 = f(x, t, c1), f(x, t, c1), f(x, t, c2)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o1b))  # deterministic
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6  # cross-attn live


def test_unet_timestep_sensitivity(unet_params):
    x = jnp.ones((1, 16, 16, 4))
    ctx = jnp.zeros((1, 8, 32))
    o1 = unet_mod.apply(unet_params, x, jnp.asarray([1.0]), ctx, TINY_UNET)
    o2 = unet_mod.apply(unet_params, x, jnp.asarray([900.0]), ctx, TINY_UNET)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6


def test_unet_state_dict_roundtrip(unet_params):
    flat = unet_mod.flatten_params(unet_params)
    renested = unet_mod.nest_state_dict(
        {k: (np.swapaxes(np.asarray(v), -1, -2) if k.endswith("weight")
             and np.asarray(v).ndim == 2 else
             np.transpose(np.asarray(v), (3, 2, 0, 1)) if k.endswith("weight")
             and np.asarray(v).ndim == 4 else np.asarray(v))
         for k, v in flat.items()}
    )
    ref = unet_mod.flatten_params(renested)
    for k in flat:
        np.testing.assert_allclose(np.asarray(flat[k]), np.asarray(ref[k]))


def test_overlay_edits(unet_params):
    key = "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight"
    flat = unet_mod.flatten_params(unet_params)
    new_w = np.full(np.asarray(flat[key]).T.shape, 0.5, np.float32)  # torch layout
    edited = unet_mod.overlay_edits(unet_params, {key: new_w})
    got = unet_mod.flatten_params(edited)[key]
    np.testing.assert_allclose(np.asarray(got), new_w.T)
    # original untouched
    assert np.abs(np.asarray(flat[key]) - np.asarray(got)).max() > 0


def test_sdxl_config_forward():
    cfg = unet_mod.UNetConfig(
        block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1,
        cross_attention_dim=32,
        attention_head_dim=(2, 4),
        transformer_layers_per_block=(1, 2),
        use_linear_projection=True,
        norm_num_groups=4,
        addition_embed_type="text_time",
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=16 + 8 * 6,
    )
    params = unet_mod.init_params(cfg, seed=1)
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 8, 32))
    added = {"text_embeds": jnp.ones((1, 16)), "time_ids": jnp.ones((1, 6))}
    out = unet_mod.apply(params, x, jnp.asarray([3.0]), ctx, cfg, added_cond=added)
    assert out.shape == (1, 16, 16, 4)


def test_vae_decode_shape(vae_params):
    lat = jnp.zeros((1, 8, 8, 4))
    img = vae_mod.decode(vae_params, lat, TINY_VAE)
    assert img.shape == (1, 16, 16, 3)  # 2 up blocks -> 1 upsample -> 2x


def test_vae_encode_decode_roundtrip_shapes(vae_params):
    img = jnp.zeros((1, 16, 16, 3))
    mean, logvar = vae_mod.encode_moments(vae_params, img, TINY_VAE)
    assert mean.shape == (1, 8, 8, 4) and logvar.shape == (1, 8, 8, 4)
    out = vae_mod.decode(vae_params, mean, TINY_VAE)
    assert out.shape == (1, 16, 16, 3)


def test_split_skip_matches_concat(unet_params, monkeypatch):
    """UCE_SPLIT_SKIP up-block path (no materialized skip concat) must
    match the concat path; tiny config has a group boundary that does NOT
    align with the [x, res] channel partition (16+8 cat, group size 6),
    exercising the additive-stats gather."""
    rng = np.random.default_rng(3)
    params = unet_mod.cast_params(unet_params, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)), jnp.bfloat16)
    ctx = jnp.asarray(rng.standard_normal((2, 8, 32)), jnp.bfloat16)
    t = jnp.asarray([10.0, 20.0])

    monkeypatch.delenv("UCE_SPLIT_SKIP", raising=False)
    ref = np.asarray(
        unet_mod.apply(params, x, t, ctx, TINY_UNET), np.float32)
    monkeypatch.setenv("UCE_SPLIT_SKIP", "1")
    out = np.asarray(
        unet_mod.apply(params, x, t, ctx, TINY_UNET), np.float32)
    # one extra fp32->bf16 rounding on two convs; everything else identical
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)
    assert np.abs(out - ref).mean() < 2e-3


def test_attn_out_einsum_matches_merge(unet_params, monkeypatch):
    """UCE_ATTN_OUT=einsum (head-merge absorbed into the out-projection
    as a per-head contraction — the r5 copies-bucket A/B candidate) must
    match the merge-then-project path to roundoff."""
    rng = np.random.default_rng(4)
    params = unet_mod.cast_params(unet_params, jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 8, 32)), jnp.float32)
    t = jnp.asarray([10.0, 20.0])

    monkeypatch.delenv("UCE_ATTN_OUT", raising=False)
    ref = np.asarray(unet_mod.apply(params, x, t, ctx, TINY_UNET))
    monkeypatch.setenv("UCE_ATTN_OUT", "einsum")
    out = np.asarray(unet_mod.apply(params, x, t, ctx, TINY_UNET))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_group_norm_reduce_stats_variant_matches(monkeypatch):
    """UCE_GN_STATS=reduce (consumer-fusible 'bhwc->bc' sums) must compute
    the same statistics as the indicator-matmul path."""
    import numpy as np

    from uce_tpu.models import layers

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.bfloat16)
    sc = jnp.asarray(rng.standard_normal(32), jnp.float32)
    bi = jnp.asarray(rng.standard_normal(32), jnp.float32)
    ref = np.asarray(layers.group_norm(x, sc, bi, num_groups=4), np.float32)
    monkeypatch.setenv("UCE_GN_STATS", "reduce")
    got = np.asarray(layers.group_norm(x, sc, bi, num_groups=4), np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-2)
