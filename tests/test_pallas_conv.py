"""Pallas 3x3 conv kernel: tile-picker safety + interpret-mode parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uce_tpu.ops.pallas import conv3x3 as cp


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_pick_cout_tile_always_divides():
    """The grid writes cout//tc tiles, so a non-divisor tc would leave
    trailing output channels unwritten (regression: the old fallback
    returned min(cout, 128) for cout=320). Every tile must also be
    Mosaic-lowerable: the minor block dim is the FULL cout or a multiple
    of 128 (regression: tc=160 for cout=320 lowered fine in interpret
    mode but was rejected on the real chip)."""
    for cin, cout, hw in ((640, 640, 32), (1280, 1280, 16),
                          (320, 640, 64), (1280, 1280, 8), (4, 12, 8)):
        tc = cp._pick_cout_tile(cin, cout, hw, hw)
        assert tc > 0, (cin, cout, hw)
        assert cout % tc == 0, (cin, cout, hw, tc)
        assert tc == cout or tc % 128 == 0, (cin, cout, hw, tc)
    # no Mosaic-valid tile fits -> unsupported, not an invalid tile:
    # 320@64x64 (the SD top level) has no multiple-of-128 divisor and the
    # full-cout tile blows scoped VMEM -> XLA fallback
    assert cp._pick_cout_tile(320, 320, 64, 64) == 0
    # x tile alone over budget -> unsupported, not a wrong answer
    assert cp._pick_cout_tile(4096, 4096, 64, 64) == 0


def test_conv3x3_interpret_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 12)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 12, 20)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((20,)) * 0.1, jnp.bfloat16)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = cp.conv3x3(x, w, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05)


def test_conv3x3_interpret_nondivisor_128_cout(rng):
    """cout=20 has no 128-ish divisor; every channel must still be
    written (the old fallback would have produced garbage channels)."""
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 4)), jnp.bfloat16)
    w = jnp.zeros((3, 3, 4, 20), jnp.bfloat16).at[1, 1].set(
        jnp.asarray(rng.standard_normal((4, 20)), jnp.bfloat16))
    got = np.asarray(cp.conv3x3(x, w, interpret=True), np.float32)
    ref = np.asarray(x, np.float32) @ np.asarray(w, np.float32)[1, 1]
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)
    assert np.abs(got[..., 10:]).sum() > 0  # trailing channels written
