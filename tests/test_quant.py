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


# ---------------------------------------------------------------------------
# weight-only int8 ("w8"): bf16 arithmetic, int8 storage (memory mode)
# ---------------------------------------------------------------------------

def test_wlinear_matches_manual_dequant(rng):
    x = jnp.asarray(rng.standard_normal((4, 10, 48)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((48, 24)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((24,)) * 0.1, jnp.float32)
    qw = quant.quantize_weight(w, weight_only=True)
    assert qw[quant.WKEY].dtype == jnp.int8 and "scale" in qw
    deq = np.asarray(qw[quant.WKEY], np.float32) * np.asarray(qw["scale"])
    ref = np.asarray(x) @ deq + np.asarray(b)
    got = np.asarray(quant.wlinear(x, qw, b))
    # fp32 activations: exact up to matmul accumulation order
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    rel = np.abs(got - np.asarray(x @ w + b)).max() / np.abs(ref).max()
    assert rel < 0.02, rel


@pytest.mark.parametrize("stride,padding,ksize", [
    (1, 1, 3), (2, 1, 3), (1, 0, 1),
])
def test_wconv2d_matches_float(rng, stride, padding, ksize):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((ksize, ksize, 16, 12)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((12,)) * 0.1, jnp.float32)
    ref = np.asarray(conv2d(x, k, b, stride=stride, padding=padding))
    got = np.asarray(conv2d(x, quant.quantize_weight(k, weight_only=True),
                            b, stride=stride, padding=padding))
    assert got.shape == ref.shape
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.01, rel


def test_layer_dispatch_on_weight_only(rng):
    x = jnp.asarray(rng.standard_normal((2, 6, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 16)) * 0.1, jnp.float32)
    got = np.asarray(linear(x, quant.quantize_weight(w, weight_only=True)))
    ref = np.asarray(linear(x, w))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.01


def test_concat_weights_weight_only(rng):
    ws = [jnp.asarray(rng.standard_normal((16, 8)) * 0.1, jnp.float32)
          for _ in range(3)]
    qws = [quant.quantize_weight(w, weight_only=True) for w in ws]
    cat = quant.concat_weights(qws)
    assert quant.is_weight_only(cat)
    assert cat[quant.WKEY].shape == (16, 24)
    assert cat["scale"].shape == (1, 24)
    # mixed raw/quantized falls back
    assert quant.concat_weights([ws[0], qws[1]]) is None


def test_quantize_params_w8_flux_skips_and_per_layer_scales(rng):
    from uce_tpu.models import flux as flux_mod

    cfg = flux_mod.FluxConfig(
        in_channels=16, num_layers=2, num_single_layers=2,
        attention_head_dim=8, num_attention_heads=2,
        joint_attention_dim=16, pooled_projection_dim=24,
        guidance_embeds=False, axes_dims_rope=(4, 2, 2))
    params = flux_mod.init_params(cfg, 0)
    qp = quantize.quantize_params(params, quantize.FLUX_SKIP, mode="w8")

    # edit targets + entry/exit stay float
    for key in ("x_embedder", "context_embedder", "proj_out"):
        assert not quant.is_weight_only(qp[key]["weight"]), key
    assert not quant.is_weight_only(
        qp["time_text_embed"]["text_embedder"]["linear_1"]["weight"])
    assert not quant.is_weight_only(qp["norm_out"]["linear"]["weight"])
    # block projections (incl. adaLN and the single-block proj_out)
    # quantize with per-layer scales
    blocks = qp["transformer_blocks"]
    for sub in (blocks["attn"]["to_q"], blocks["norm1"]["linear"],
                qp["single_transformer_blocks"]["proj_out"]):
        w = sub["weight"]
        assert quant.is_weight_only(w)
        assert w[quant.WKEY].shape[0] == 2          # stacked depth
        assert w["scale"].shape[:2] == (2, 1)       # per-layer scales
    # stacked RMSNorm scales ([L, d] "weight" leaves) stay float
    assert not quant.is_weight_only(blocks["attn"]["norm_q"]["weight"])


def test_tiny_flux_w8_forward_close(rng):
    import jax

    from uce_tpu.diffusion.pipeline_flux import make_img_ids
    from uce_tpu.models import flux as flux_mod

    cfg = flux_mod.FluxConfig(
        in_channels=16, num_layers=2, num_single_layers=2,
        attention_head_dim=8, num_attention_heads=2,
        joint_attention_dim=16, pooled_projection_dim=24,
        guidance_embeds=False, axes_dims_rope=(4, 2, 2))
    params = flux_mod.init_params(cfg, 0, 0.1)
    qp = quantize.quantize_params(params, quantize.FLUX_SKIP, mode="w8")

    lat = jnp.asarray(rng.standard_normal((2, 16, 16)), jnp.float32)
    t5 = jnp.asarray(rng.standard_normal((2, 8, 16)) * 0.3, jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((2, 24)) * 0.3, jnp.float32)
    t = jnp.full((2,), 0.5, jnp.float32)
    img_ids, txt_ids = make_img_ids(8, 8), np.zeros((8, 3))

    fwd = jax.jit(lambda p, z: flux_mod.apply(
        p, z, t5, pooled, t, img_ids, txt_ids, cfg))
    ref = np.asarray(fwd(params, lat))
    got = np.asarray(fwd(qp, lat))
    assert got.shape == ref.shape
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel
    cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.998, cos


def test_bench_flux_tiny_smoke_both_modes():
    """bench.py's FLUX device-fill machinery (spec tree, dtype rules,
    w8-quantized proto widening) must execute end-to-end; the full-size
    configs only differ in dims."""
    import bench

    assert bench.bench_flux(batch=1, w8=False, _tiny=True) > 0
    assert bench.bench_flux(batch=1, w8=True, _tiny=True) > 0


def test_bench_hidream_tiny_smoke():
    """bench.py's HiDream half-depth-w8 path (device-fill widening incl.
    the stacked caption_projection.llama leaf and the [L, E, ...] expert
    banks, CFG batch doubling, Euler scan) must execute end-to-end."""
    import bench

    assert bench.bench_hidream(batch=1, _tiny=True) > 0


def _tiny_hidream_setup(rng):
    """Shared tiny MoE-DiT config + jitted forward for the quant tests."""
    import jax

    from uce_tpu.diffusion.pipeline_flux import make_img_ids
    from uce_tpu.models import hidream as hd_mod

    cfg = hd_mod.HiDreamConfig(
        patch_size=2, in_channels=4, out_channels=4, num_layers=2,
        num_single_layers=2, attention_head_dim=8, num_attention_heads=2,
        caption_channels=(16, 16), text_emb_dim=20, num_routed_experts=2,
        num_activated_experts=1, axes_dims_rope=(4, 2, 2),
        llama_layers=(0, 1, 2, 3), ffn_multiple_of=8)
    params = hd_mod.init_params(cfg, 0, 0.1)

    hx = jnp.asarray(rng.standard_normal((2, 16, 16)), jnp.float32)
    t5 = jnp.asarray(rng.standard_normal((2, 6, 16)) * 0.3, jnp.float32)
    llama = jnp.asarray(rng.standard_normal((4, 2, 5, 16)) * 0.3,
                        jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((2, 20)) * 0.3, jnp.float32)
    t = jnp.full((2,), 500.0, jnp.float32)
    img_ids = make_img_ids(8, 8)

    fwd = jax.jit(lambda p, z: hd_mod.apply(
        p, z, t5, llama, pooled, t, img_ids, cfg))
    return cfg, params, hx, fwd


def test_tiny_hidream_w8_forward_close(rng):
    cfg, params, hx, fwd = _tiny_hidream_setup(rng)
    qp = quantize.quantize_params(params, quantize.HIDREAM_SKIP, mode="w8")

    # edit targets + router gate stay float; experts get per-layer,
    # per-expert scales
    assert not quant.is_weight_only(
        qp["caption_projection"]["llama"]["weight"])
    dsb = qp["double_stream_blocks"]
    assert not quant.is_weight_only(dsb["ff_i"]["gate"]["weight"])
    ew = dsb["ff_i"]["experts"]["w1"]["weight"]
    assert quant.is_weight_only(ew)
    assert ew["scale"].shape[:3] == (2, 2, 1)  # [L, E, 1, out]

    ref = np.asarray(fwd(params, hx))
    got = np.asarray(fwd(qp, hx))
    assert got.shape == ref.shape
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel
    cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.998, cos


def test_tiny_hidream_int8_forward_runs(rng):
    """W8A8 ("int8") HiDream: routed-expert banks have no int8-MXU einsum
    path, so _expert_mm must degrade them to dequant+float arithmetic
    instead of crashing on the quantized dict (regression: einsum used to
    receive the raw dict at trace time)."""
    cfg, params, hx, fwd = _tiny_hidream_setup(rng)
    qp = quantize.quantize_params(params, quantize.HIDREAM_SKIP,
                                  mode="int8")
    ew = qp["double_stream_blocks"]["ff_i"]["experts"]["w1"]["weight"]
    assert quant.is_quantized(ew)

    ref = np.asarray(fwd(params, hx))
    got = np.asarray(fwd(qp, hx))
    assert got.shape == ref.shape and np.isfinite(got).all()
    cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.99, cos


def test_overlay_edits_quantized_slot_uses_pipeline_dtype(rng):
    """A float edit replacing a quantized slot must take the requested
    dtype, not hardcoded bf16 (fp32 pipelines keep fp32 parity)."""
    from uce_tpu.models import unet as unet_mod

    w = rng.standard_normal((8, 8)).astype(np.float32)
    params = {"attn": {"to_k": {
        "weight": quant.quantize_weight(jnp.asarray(w), weight_only=True)}}}
    edit = rng.standard_normal((8, 8)).astype(np.float32)
    out = unet_mod.overlay_edits(params, {"attn.to_k.weight": edit},
                                 dtype=jnp.float32)
    leaf = out["attn"]["to_k"]["weight"]
    assert leaf.dtype == jnp.float32
    out16 = unet_mod.overlay_edits(params, {"attn.to_k.weight": edit})
    assert out16["attn"]["to_k"]["weight"].dtype == jnp.bfloat16
