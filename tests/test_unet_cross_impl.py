"""Cross-implementation UNet parity: JAX NHWC scans vs torch NCHW eager.

Both implementations are written against the same architecture spec
(diffusers UNet2DConditionModel) but with different layouts and control
flow; agreement on shared weights catches transcription/layout bugs that
single-implementation tests cannot.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests import torch_unet_mirror as mirror  # noqa: E402
from uce_tpu.models import unet as unet_mod  # noqa: E402


@pytest.mark.parametrize("use_linear", [False, True])
def test_cross_impl_parity(use_linear):
    cfg = unet_mod.UNetConfig(
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1,
        cross_attention_dim=24,
        attention_head_dim=2,
        norm_num_groups=4,
        use_linear_projection=use_linear,
    )
    flat = unet_mod.init_state_dict(cfg, np.random.default_rng(3), scale=0.1)
    params = unet_mod.nest_state_dict(flat)

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    ctx = rng.standard_normal((2, 7, 24)).astype(np.float32)
    t = np.array([123.0, 801.0], np.float32)

    ours = np.asarray(unet_mod.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), cfg))
    ref = mirror.unet_forward(
        flat, torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(t),
        torch.tensor(ctx), cfg).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_cross_impl_parity_sd14_structure():
    """Four blocks, two layers per block — the real SD topology at 1/40
    width, exercising all skip-connection bookkeeping."""
    cfg = unet_mod.UNetConfig(
        block_out_channels=(8, 16, 32, 32),
        layers_per_block=2,
        cross_attention_dim=24,
        attention_head_dim=2,
        norm_num_groups=4,
    )
    flat = unet_mod.init_state_dict(cfg, np.random.default_rng(11), scale=0.1)
    params = unet_mod.nest_state_dict(flat)

    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 32, 32, 4)).astype(np.float32)
    ctx = rng.standard_normal((1, 7, 24)).astype(np.float32)
    t = np.array([500.0], np.float32)

    ours = np.asarray(unet_mod.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), cfg))
    ref = mirror.unet_forward(
        flat, torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(t),
        torch.tensor(ctx), cfg).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_vae_decoder_cross_impl():
    from uce_tpu.models import vae as vae_mod

    cfg = vae_mod.VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                            norm_num_groups=4)
    flat = vae_mod.init_state_dict(cfg, np.random.default_rng(2), scale=0.1)
    params = unet_mod.nest_state_dict(flat)

    rng = np.random.default_rng(4)
    lat = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    ours = np.asarray(vae_mod.decode(params, jnp.asarray(lat), cfg))
    ref = mirror.vae_decode(
        flat, torch.tensor(lat.transpose(0, 3, 1, 2)), cfg
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
