"""Pallas SD attention kernel vs the XLA reference path."""

import jax.numpy as jnp
import numpy as np
import pytest

from uce_tpu.ops.attention import _xla_attention
from uce_tpu.ops.pallas import sd_attention as sdk


@pytest.fixture
def rng():
    return np.random.default_rng(11)


@pytest.mark.parametrize("b,h,sq,skv,d", [
    (2, 2, 256, 256, 40),    # self, level-0 head dim
    (1, 4, 512, 512, 80),    # self, level-1
    (2, 2, 64, 64, 160),     # mid block
    (2, 2, 256, 77, 40),     # cross-attention, CLIP context
    (1, 2, 512, 77, 160),
])
def test_matches_xla(rng, b, h, sq, skv, d):
    q = jnp.asarray(rng.standard_normal((b, h, sq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, skv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, skv, d)), jnp.bfloat16)
    scale = d ** -0.5
    ref = _xla_attention(q, k, v, None, False, scale)
    got = sdk.sd_attention(q, k, v, scale, interpret=True)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.02, rtol=0.05)


@pytest.mark.parametrize("b,h,sq,skv,d", [
    (2, 2, 256, 256, 40),
    (1, 4, 512, 512, 80),
])
def test_int8_qk_close_to_fp(rng, b, h, sq, skv, d):
    # int8 QK^T with per-token scales + channel-centered K: logits carry
    # <=1% quantization error, so probabilities (and outputs) stay close.
    q = jnp.asarray(rng.standard_normal((b, h, sq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, skv, d)) + 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, skv, d)), jnp.bfloat16)
    scale = d ** -0.5
    ref = _xla_attention(q, k, v, None, False, scale)
    got = sdk.sd_attention(q, k, v, scale, interpret=True, qk_int8=True)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
    assert err.max() < 0.05, err.max()
    assert err.mean() < 0.005, err.mean()


def test_softmax_stability(rng):
    # large logits: max-subtraction must prevent overflow
    q = jnp.asarray(rng.standard_normal((1, 1, 64, 40)) * 30, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 1, 64, 40)) * 30, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 1, 64, 40)), jnp.bfloat16)
    got = sdk.sd_attention(q, k, v, 40 ** -0.5, interpret=True)
    assert np.isfinite(np.asarray(got, np.float32)).all()


def test_supported_gate():
    q = jnp.zeros((16, 8, 4096, 40), jnp.bfloat16)
    assert sdk.supported(q, jnp.zeros((16, 8, 4096, 40), jnp.bfloat16))
    assert sdk.supported(q, jnp.zeros((16, 8, 77, 40), jnp.bfloat16))
    fp32 = jnp.zeros((2, 2, 256, 40), jnp.float32)
    assert not sdk.supported(fp32, fp32)
    # FLUX-scale joint attention fits too (s=4352 d=128 -> ~13 MB)
    flux = jnp.zeros((1, 24, 4352, 128), jnp.bfloat16)
    assert sdk.supported(flux, flux)
    # VAE decoder mid-block (s=4096, d=512, single head): double-buffered
    # K/V residency alone is 16 MB, which Mosaic confirmed by OOMing at
    # compile time ("exceeded the vmem limit by 1.00M" on
    # bf16[12,1,4096,512]) when the old estimator let it through.
    vae = jnp.zeros((12, 1, 4096, 512), jnp.bfloat16)
    assert not sdk.supported(vae, vae)
    # wide-head long sequences likewise blow the K/V residency budget
    for shape in ((1, 8, 8192, 256), (1, 8, 8192, 512)):
        big = jnp.zeros(shape, jnp.bfloat16)
        assert not sdk.supported(big, big)


def test_block_picks_stable():
    """Pin the measured-optimal q blocks for the production shapes so an
    estimator change can't silently shift them (each entry was timed on
    hardware; see the module docstring)."""
    cases = {
        (4096, 4096, 40): 512,   # SD level-0 self-attn
        (4096, 77, 40): 512,     # SD level-0 cross-attn
        (1024, 1024, 80): 512,   # SD level-1 self-attn
        (256, 256, 160): 256,    # SD mid-block
        (4352, 4352, 128): 256,  # FLUX 1024px joint attn (4352 % 512 != 0)
        (1280, 1280, 128): 256,  # FLUX 512px joint attn
    }
    for (sq, skv, d), want in cases.items():
        assert sdk._pick_block_q(sq, skv, d) == want, (sq, skv, d)
