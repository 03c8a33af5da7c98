"""W8A8 int8 quantization: op correctness, tree pass, tiny-UNet accuracy."""

import jax.numpy as jnp
import numpy as np
import pytest

from uce_tpu.models import quantize
from uce_tpu.models.layers import conv2d, linear
from uce_tpu.ops import quant


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_quantize_weight_roundtrip(rng):
    w = rng.standard_normal((64, 32)).astype(np.float32)
    qw = quant.quantize_weight(jnp.asarray(w))
    assert qw[quant.QKEY].dtype == jnp.int8
    assert qw["scale"].shape == (1, 32)
    deq = np.asarray(qw[quant.QKEY], np.float32) * np.asarray(qw["scale"])
    # per-channel symmetric: max error is half a quantization step
    step = np.asarray(qw["scale"])
    assert np.all(np.abs(deq - w) <= step / 2 + 1e-7)


def test_qlinear_matches_float(rng):
    x = jnp.asarray(rng.standard_normal((4, 10, 48)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((48, 24)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((24,)) * 0.1, jnp.float32)
    ref = np.asarray(x @ w + b)
    got = np.asarray(quant.qlinear(x, quant.quantize_weight(w), b))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.02, rel


def test_qlinear_integer_path_exact(rng):
    # Integer-valued inputs within int8 range quantize losslessly when
    # every row of x (per-token scale) and every column of w (per-channel
    # scale) has amax exactly 127 -> output must be exact.
    x = jnp.asarray(rng.integers(-127, 128, (3, 16)), jnp.float32)
    x = x.at[:, 0].set(127.0)
    w = jnp.asarray(rng.integers(-127, 128, (16, 8)), jnp.float32)
    w = w.at[0, :].set(127.0)
    got = np.asarray(quant.qlinear(x, quant.quantize_weight(w)))
    ref = np.asarray(x) @ np.asarray(w)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


@pytest.mark.parametrize("stride,padding,ksize", [
    (1, 1, 3), (2, 1, 3), (1, 0, 1), (1, 1, 1), (2, 1, 1),
])
def test_qconv2d_matches_float(rng, stride, padding, ksize):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((ksize, ksize, 16, 12)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((12,)) * 0.1, jnp.float32)
    ref = np.asarray(conv2d(x, k, b, stride=stride, padding=padding))
    got = np.asarray(quant.qconv2d(x, quant.quantize_weight(k), b,
                                   stride=stride, padding=padding))
    assert got.shape == ref.shape
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.03, rel


def test_layer_dispatch_on_quantized(rng):
    x = jnp.asarray(rng.standard_normal((2, 6, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 16)) * 0.1, jnp.float32)
    out_q = linear(x, quant.quantize_weight(w))
    out_f = linear(x, w)
    rel = np.abs(np.asarray(out_q - out_f)).max() / np.abs(
        np.asarray(out_f)).max()
    assert rel < 0.02

    xc = jnp.asarray(rng.standard_normal((2, 8, 8, 8)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
    oq = conv2d(xc, quant.quantize_weight(kc))
    of = conv2d(xc, kc)
    rel = np.abs(np.asarray(oq - of)).max() / np.abs(np.asarray(of)).max()
    assert rel < 0.03


def test_quantize_params_skips_and_counts(rng):
    params = {
        "conv_in": {"weight": jnp.ones((3, 3, 4, 8)), "bias": jnp.ones(8)},
        "down_blocks": {
            "0": {
                "resnets": {
                    "0": {
                        "conv1": {"weight": jnp.ones((3, 3, 8, 8)),
                                  "bias": jnp.ones(8)},
                        "norm1": {"weight": jnp.ones(8), "bias": jnp.ones(8)},
                        "time_emb_proj": {"weight": jnp.ones((16, 8)),
                                          "bias": jnp.ones(8)},
                    }
                }
            }
        },
        "conv_out": {"weight": jnp.ones((3, 3, 8, 4)), "bias": jnp.ones(4)},
    }
    qp = quantize.quantize_params(params)
    assert not quant.is_quantized(qp["conv_in"]["weight"])
    assert not quant.is_quantized(qp["conv_out"]["weight"])
    assert quant.is_quantized(
        qp["down_blocks"]["0"]["resnets"]["0"]["conv1"]["weight"])
    # time_emb_proj skipped by the time_emb token
    assert not quant.is_quantized(
        qp["down_blocks"]["0"]["resnets"]["0"]["time_emb_proj"]["weight"])
    nq, nw = quantize.count_quantized(qp)
    assert (nq, nw) == (1, 4)


def test_tiny_unet_quantized_forward_close(rng):
    import jax

    from uce_tpu.models import unet as unet_mod

    config = unet_mod.UNetConfig(
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, cross_attention_dim=32,
        attention_head_dim=2, norm_num_groups=4,
    )
    params = unet_mod.nest_state_dict(
        unet_mod.init_state_dict(config, rng), jnp.float32)
    qparams = quantize.quantize_params(params)
    nq, nw = quantize.count_quantized(qparams)
    assert nq > 10

    lat = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 7, 32)), jnp.float32)
    t = jnp.asarray(500.0)
    ref = np.asarray(unet_mod.apply(params, lat, t, ctx, config))
    got = np.asarray(unet_mod.apply(qparams, lat, t, ctx, config))
    assert got.shape == ref.shape
    # random-init tiny net (4-channel norm groups, no central-limit
    # averaging) is a worst case; real SD-scale layers track tighter
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.1, rel
    cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.995, cos

    # quantized tree must still jit (dicts ride the pytree)
    jit_out = np.asarray(jax.jit(
        lambda p, l, c: unet_mod.apply(p, l, t, c, config)
    )(qparams, lat, ctx))
    np.testing.assert_allclose(jit_out, got, rtol=1e-5, atol=1e-5)
