"""FLUX DiT structural/behavioral tests (tiny config)."""

import numpy as np
import jax.numpy as jnp
import pytest

from uce_tpu.models import flux as flux_mod

TINY = flux_mod.FluxConfig(
    in_channels=8,
    num_layers=2,
    num_single_layers=2,
    attention_head_dim=8,
    num_attention_heads=4,
    joint_attention_dim=16,
    pooled_projection_dim=12,
    guidance_embeds=False,
    axes_dims_rope=(4, 2, 2),
)


@pytest.fixture(scope="module")
def setup():
    params = flux_mod.init_params(TINY, seed=0)
    rng = np.random.default_rng(1)
    b, s_img, s_txt = 2, 16, 6
    latents = jnp.asarray(rng.standard_normal((b, s_img, 8)), jnp.float32)
    t5 = jnp.asarray(rng.standard_normal((b, s_txt, 16)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((b, 12)), jnp.float32)
    img_ids = np.zeros((s_img, 3))
    img_ids[:, 1] = np.repeat(np.arange(4), 4)
    img_ids[:, 2] = np.tile(np.arange(4), 4)
    txt_ids = np.zeros((s_txt, 3))
    return params, latents, t5, pooled, img_ids, txt_ids


def _apply(setup, t=0.5, **kw):
    params, latents, t5, pooled, img_ids, txt_ids = setup
    return flux_mod.apply(
        params, latents, t5, pooled,
        jnp.full((latents.shape[0],), t, jnp.float32),
        img_ids, txt_ids, TINY, **kw)


def test_forward_shape(setup):
    out = _apply(setup)
    assert out.shape == (2, 16, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_timestep_sensitivity(setup):
    o1, o2 = _apply(setup, t=0.1), _apply(setup, t=0.9)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6


def test_text_conditioning(setup):
    params, latents, t5, pooled, img_ids, txt_ids = setup
    out1 = _apply(setup)
    t5b = t5 + 1.0
    out2 = flux_mod.apply(params, latents, t5b, pooled,
                          jnp.full((2,), 0.5), img_ids, txt_ids, TINY)
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-6


def test_rope_position_sensitivity(setup):
    params, latents, t5, pooled, img_ids, txt_ids = setup
    out1 = _apply(setup)
    shifted = img_ids.copy()
    shifted[:, 1] += 3  # shift the y grid
    out2 = flux_mod.apply(params, latents, t5, pooled,
                          jnp.full((2,), 0.5), shifted, txt_ids, TINY)
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-6


def test_guidance_embeds_variant():
    cfg = flux_mod.FluxConfig(**{**TINY.__dict__, "guidance_embeds": True})
    params = flux_mod.init_params(cfg, seed=2)
    rng = np.random.default_rng(3)
    latents = jnp.asarray(rng.standard_normal((1, 16, 8)), jnp.float32)
    t5 = jnp.asarray(rng.standard_normal((1, 6, 16)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((1, 12)), jnp.float32)
    img_ids, txt_ids = np.zeros((16, 3)), np.zeros((6, 3))
    o1 = flux_mod.apply(params, latents, t5, pooled, jnp.asarray([0.5]),
                        img_ids, txt_ids, cfg, guidance=jnp.asarray([3.5]))
    o2 = flux_mod.apply(params, latents, t5, pooled, jnp.asarray([0.5]),
                        img_ids, txt_ids, cfg, guidance=jnp.asarray([1.0]))
    assert o1.shape == (1, 16, 8)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6


def test_rope_norm_preserved():
    # RoPE is a rotation: per-pair norms must be preserved.
    cos, sin = flux_mod.rope_freqs(
        np.arange(8)[:, None] * np.ones((1, 3)), (4, 2, 2))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 8)), jnp.float32)
    y = flux_mod.apply_rope(x, cos, sin)
    nx = np.asarray((x.reshape(1, 2, 8, 4, 2) ** 2).sum(-1))
    ny = np.asarray((y.reshape(1, 2, 8, 4, 2) ** 2).sum(-1))
    np.testing.assert_allclose(nx, ny, rtol=1e-5, atol=1e-6)


def test_cross_impl_parity_with_torch_mirror():
    """JAX layer-stacked scans vs independent eager torch implementation
    on shared weights (see tests/torch_flux_mirror.py)."""
    import pytest

    torch = pytest.importorskip("torch")
    from tests import torch_flux_mirror as mirror
    from uce_tpu.models.flux import init_state_dict, convert_hf_state_dict

    cfg = flux_mod.FluxConfig(**{**TINY.__dict__, "guidance_embeds": True,
                                 "num_layers": 2, "num_single_layers": 2})
    flat = init_state_dict(cfg, np.random.default_rng(21), scale=0.1)
    params = convert_hf_state_dict(flat, cfg)

    rng = np.random.default_rng(22)
    b, s_img, s_txt = 2, 16, 6
    latents = rng.standard_normal((b, s_img, cfg.in_channels)).astype(np.float32)
    t5 = rng.standard_normal((b, s_txt, cfg.joint_attention_dim)).astype(np.float32)
    pooled = rng.standard_normal((b, cfg.pooled_projection_dim)).astype(np.float32)
    img_ids = np.zeros((s_img, 3))
    img_ids[:, 1] = np.repeat(np.arange(4), 4)
    img_ids[:, 2] = np.tile(np.arange(4), 4)
    txt_ids = np.zeros((s_txt, 3))
    t = np.array([0.7, 0.2], np.float32)
    g = np.array([3.5, 3.5], np.float32)

    ours = np.asarray(flux_mod.apply(
        params, jnp.asarray(latents), jnp.asarray(t5), jnp.asarray(pooled),
        jnp.asarray(t), img_ids, txt_ids, cfg, guidance=jnp.asarray(g)))
    ref = mirror.flux_forward(
        flat, torch.tensor(latents), torch.tensor(t5), torch.tensor(pooled),
        torch.tensor(t), img_ids, txt_ids, cfg,
        guidance=torch.tensor(g)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)
