"""Fused Pallas GroupNorm(+SiLU) kernel vs the reference layer path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uce_tpu.models.layers import group_norm, group_norm_act, silu
from uce_tpu.ops.pallas import group_norm as gn_pallas


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 64), 8),
    ((3, 4, 4, 320), 32),
    ((1, 16, 16, 128), 32),
])
@pytest.mark.parametrize("act", ["none", "silu"])
def test_kernel_matches_reference(rng, shape, groups, act):
    x = jnp.asarray(rng.standard_normal(shape) * 2 + 0.5, jnp.bfloat16)
    c = shape[-1]
    scale = jnp.asarray(rng.standard_normal(c), jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal(c), jnp.bfloat16)
    ref = group_norm(x, scale, bias, groups)
    if act == "silu":
        ref = silu(ref)
    got = gn_pallas.group_norm_act(x, scale, bias, groups, 1e-5, act,
                                   interpret=True)
    assert got.dtype == x.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.06, rtol=0.05)


def test_eps_matters(rng):
    x = jnp.asarray(np.full((1, 4, 4, 32), 3.0), jnp.bfloat16)  # zero var
    scale = jnp.ones((32,), jnp.bfloat16)
    bias = jnp.zeros((32,), jnp.bfloat16)
    got = gn_pallas.group_norm_act(x, scale, bias, 8, 1e-2, "none",
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32), 0.0, atol=1e-2)


def test_supported_gate():
    ok = jnp.zeros((2, 64, 64, 320), jnp.bfloat16)
    assert gn_pallas.supported(ok, 32)
    vae_sized = jnp.zeros((1, 512, 512, 128), jnp.bfloat16)
    assert gn_pallas.supported(vae_sized, 32)  # row tiles handle any H*W
    fp32 = jnp.zeros((2, 8, 8, 64), jnp.float32)
    assert not gn_pallas.supported(fp32, 8)
    bad_groups = jnp.zeros((2, 8, 8, 65), jnp.bfloat16)
    assert not gn_pallas.supported(bad_groups, 8)


def test_large_map_row_tiling(rng):
    # H*W not a multiple of the default row tile exercise the tile search
    x = jnp.asarray(rng.standard_normal((1, 24, 24, 64)), jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal(64), jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal(64), jnp.bfloat16)
    ref = group_norm(x, scale, bias, 8)
    got = gn_pallas.group_norm_act(x, scale, bias, 8, 1e-5, "none",
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=0.06, rtol=0.05)


def test_dispatch_fallback_on_cpu(rng):
    # On the CPU test backend group_norm_act must route through the
    # reference path and still match group_norm + silu.
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.bfloat16)
    scale = jnp.ones((64,), jnp.bfloat16)
    bias = jnp.zeros((64,), jnp.bfloat16)
    got = group_norm_act(x, scale, bias, 8, act="silu")
    ref = silu(group_norm(x, scale, bias, 8))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=1e-6)
