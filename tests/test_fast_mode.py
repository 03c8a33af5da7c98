"""FastConfig (CFG-interval + DeepCache) correctness tests.

The fast path is an opt-in, beyond-protocol acceleration (the reference
always runs CFG at every step — ``evalscripts/generate-images-sd.py:58-62``);
these tests pin down its exactness claims:

* a FastConfig that disables nothing reproduces ``denoise()`` BITWISE,
* DeepCache's partial UNet execution fed its own same-step deep feature
  reproduces the full forward exactly (the split is lossless; only the
  cross-step reuse is an approximation),
* the scan carry survives the guided -> cond segment boundary, and a
  segment entered with an invalid cache forces a full step,
* cheap configs on the tiny pipeline produce finite, bounded-delta images.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.snapshot import make_sd_snapshot
from uce_tpu.diffusion import sampler, schedulers
from uce_tpu.diffusion.pipeline import SDPipeline
from uce_tpu.diffusion.sampler import FastConfig
from uce_tpu.models import unet as unet_mod

TINY3 = unet_mod.UNetConfig(
    block_out_channels=(8, 16, 16),
    down_block_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                      "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1, cross_attention_dim=32,
    attention_head_dim=2, norm_num_groups=4,
)


def _tiny3_inputs(batch=2, hw=16, seed=0):
    rng = np.random.default_rng(seed)
    params = unet_mod.nest_state_dict(
        unet_mod.init_state_dict(TINY3, rng))
    x = jnp.asarray(rng.standard_normal((batch, hw, hw, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((batch, 8, 32)) * 0.1, jnp.float32)
    t = jnp.asarray(17.0)
    return params, x, ctx, t


# --------------------------------------------------------------- validation
def test_fastconfig_validation():
    with pytest.raises(ValueError):
        FastConfig(cache_interval=0)
    with pytest.raises(ValueError):
        FastConfig(cache_level=0)
    with pytest.raises(ValueError):
        FastConfig(cache_level=-1)
    with pytest.raises(ValueError):
        FastConfig(cfg_interval=(3, 1))
    with pytest.raises(ValueError):
        FastConfig(cfg_interval=(-1, 5))
    assert FastConfig().is_noop
    assert not FastConfig(cache_interval=2).is_noop
    assert not FastConfig(cfg_interval=(0, 50)).is_noop


def test_fastconfig_from_spec():
    fc = FastConfig.from_spec("cfg_interval=5:40,cache=3,level=2")
    assert fc.cfg_interval == (5, 40)
    assert fc.cache_interval == 3 and fc.cache_level == 2
    assert FastConfig.from_spec("cache=2") == FastConfig(cache_interval=2)
    assert FastConfig.from_spec("") == FastConfig()
    with pytest.raises(ValueError):
        FastConfig.from_spec("bogus=1")


def test_bench_default_fast_spec_is_valid():
    """bench.py's round-end side measurement uses DEFAULT_FAST_SPEC; a
    typo there would quietly downgrade the headline artifact's "fast"
    sub-object to an error record, so pin it here."""
    import bench

    fc = FastConfig.from_spec(bench.DEFAULT_FAST_SPEC)
    assert not fc.is_noop
    lo, hi = fc.cfg_interval
    assert 0 <= lo < hi <= 50  # a real window inside the 50-call protocol
    assert fc.cache_interval >= 2  # caching actually on
    # every segment must be non-empty at the headline's 50 calls
    assert all(s < e for s, e, _ in fc.segments(50))


# ------------------------------------------- UNet partial-execution split
@pytest.mark.parametrize("cache_level", [1, 2])
def test_same_step_deep_feedback_reproduces_full(cache_level):
    """return_deep + feeding the deep feature back at the SAME step must
    equal the plain full forward bitwise: the shallow/deep split is
    lossless, only cross-step reuse approximates."""
    params, x, ctx, t = _tiny3_inputs()
    full = unet_mod.apply(params, x, t, ctx, TINY3)
    eps, deep = unet_mod.apply(params, x, t, ctx, TINY3,
                               return_deep=True, cache_level=cache_level)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(eps))
    shallow = unet_mod.apply(params, x, t, ctx, TINY3,
                             deep_feature=deep, cache_level=cache_level)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(shallow))


@pytest.mark.parametrize("cache_level", [1, 2])
def test_deep_feature_shape_matches(cache_level):
    params, x, ctx, t = _tiny3_inputs()
    _, deep = unet_mod.apply(params, x, t, ctx, TINY3,
                             return_deep=True, cache_level=cache_level)
    want = unet_mod.deep_feature_shape(TINY3, x.shape[0], x.shape[1],
                                       x.shape[2], cache_level)
    assert deep.shape == want


def test_stale_deep_feature_changes_output():
    """Sanity: a WRONG deep feature must not reproduce the full forward —
    otherwise the exactness test above would be vacuous."""
    params, x, ctx, t = _tiny3_inputs()
    full = unet_mod.apply(params, x, t, ctx, TINY3)
    _, deep = unet_mod.apply(params, x, t, ctx, TINY3, return_deep=True)
    stale = unet_mod.apply(params, x, t, ctx, TINY3,
                           deep_feature=deep * 1.5)
    assert np.abs(np.asarray(full) - np.asarray(stale)).max() > 1e-6


def test_cache_level_bounds_raise():
    params, x, ctx, t = _tiny3_inputs()
    with pytest.raises(ValueError):
        unet_mod.apply(params, x, t, ctx, TINY3, return_deep=True,
                       cache_level=3)  # == n_blocks: nothing shallow left


# ------------------------------------------------ denoise_fast scan logic
def _denoise_pair(fast, steps=6, batch=2, hw=16, seed=3):
    """Run denoise() and denoise_fast() on one tiny model; return images."""
    rng = np.random.default_rng(seed)
    params = unet_mod.nest_state_dict(unet_mod.init_state_dict(TINY3, rng))
    lat = jnp.asarray(rng.standard_normal((batch, hw, hw, 4)), jnp.float32)
    ctx = jnp.asarray(
        rng.standard_normal((2 * batch, 8, 32)) * 0.1, jnp.float32)
    plan = schedulers.ddim_plan(steps)
    g = 7.5

    def model_fn(lat_in, t):
        return unet_mod.apply(params, lat_in, t, ctx, TINY3)

    exact = sampler.denoise(
        model_fn, plan, lat,
        guidance_fn=lambda e: sampler.cfg_combine(e, g))

    def model_factory(cond_only, cached, want_deep):
        c = ctx[batch:] if cond_only else ctx
        if cached:
            return lambda li, t, d: unet_mod.apply(
                params, li, t, c, TINY3, deep_feature=d,
                cache_level=fast.cache_level)
        return lambda li, t: unet_mod.apply(
            params, li, t, c, TINY3, return_deep=want_deep,
            cache_level=fast.cache_level)

    fast_out = sampler.denoise_fast(
        model_factory, plan, lat, guidance_scale=g, fast=fast)
    return np.asarray(exact), np.asarray(fast_out)


def test_full_window_no_cache_is_bitwise_exact():
    """cfg_interval spanning every step with cache_interval=1 changes no
    arithmetic: the single guided segment's body must mirror denoise()
    cast-for-cast (the docstring's bit-for-bit claim)."""
    steps = 6
    exact, fast = _denoise_pair(FastConfig(cfg_interval=(0, steps)),
                                steps=steps)
    np.testing.assert_array_equal(exact, fast)


def test_cache_interval_every_step_is_bitwise_exact():
    """cache_interval=1 takes the f_full branch at every step; the
    lossless split (tested above) makes this bitwise-equal too."""
    exact, fast = _denoise_pair(FastConfig(cache_interval=1,
                                           cfg_interval=(0, 6)), steps=6)
    np.testing.assert_array_equal(exact, fast)


@pytest.mark.parametrize("fast", [
    FastConfig(cache_interval=2),
    FastConfig(cache_interval=3, cache_level=2),
    FastConfig(cfg_interval=(1, 4)),
    FastConfig(cfg_interval=(1, 4), cache_interval=2),
    FastConfig(cfg_interval=(0, 4), cache_interval=2),   # no leading seg
    FastConfig(cfg_interval=(2, 6), cache_interval=2),   # no trailing seg
    FastConfig(cfg_interval=(0, 0), cache_interval=2),   # cond-only run
])
def test_fast_configs_finite_and_latent_scale(fast):
    """Every segment combination runs, stays finite, and stays in the same
    numeric range as the exact path (the approximation perturbs, it does
    not blow up)."""
    exact, out = _denoise_pair(fast, steps=6)
    assert np.isfinite(out).all()
    assert np.abs(out).max() < 10 * max(np.abs(exact).max(), 1.0)


def test_guided_to_cond_boundary_uses_cond_half_cache():
    """Entering the trailing cond-only segment right after a full step: the
    kept cond-half cache is VALID, so no forced-full happens and the first
    trailing step (odd index) may run cached. Verify by checking the fast
    path with the boundary differs from one where the cache is invalidated
    (cfg window not ending on a full step) — both finite, and the boundary
    logic produces a result identical to manually simulating the schedule.
    """
    steps, batch, hw = 6, 1, 16
    rng = np.random.default_rng(11)
    params = unet_mod.nest_state_dict(unet_mod.init_state_dict(TINY3, rng))
    lat0 = jnp.asarray(rng.standard_normal((batch, hw, hw, 4)), jnp.float32)
    ctx = jnp.asarray(
        rng.standard_normal((2 * batch, 8, 32)) * 0.1, jnp.float32)
    plan = schedulers.ddim_plan(steps)
    g, n_cache = 7.5, 2
    fast = FastConfig(cfg_interval=(0, 4), cache_interval=n_cache)

    def model_factory(cond_only, cached, want_deep):
        c = ctx[batch:] if cond_only else ctx
        if cached:
            return lambda li, t, d: unet_mod.apply(
                params, li, t, c, TINY3, deep_feature=d)
        return lambda li, t: unet_mod.apply(
            params, li, t, c, TINY3, return_deep=want_deep)

    got = np.asarray(sampler.denoise_fast(
        model_factory, plan, lat0, guidance_scale=g, fast=fast))

    # manual eager simulation of the same schedule
    lat = lat0 * plan.init_noise_sigma
    hist = plan.init_carry(lat.shape, jnp.float32)
    deep = None
    for i in range(steps):
        cond_only = i >= 4
        branches = 1 if cond_only else 2
        li = jnp.concatenate([lat] * branches, 0)
        li = plan.scale_model_input(li, i)
        t = plan.timesteps[i]
        c = ctx[batch:] if cond_only else ctx
        if cond_only and deep is not None and deep.shape[0] == 2 * batch:
            deep = deep[batch:]
        if i % n_cache == 0 or deep is None or deep.shape[0] != branches:
            eps, deep = unet_mod.apply(params, li, t, c, TINY3,
                                       return_deep=True)
        else:
            eps = unet_mod.apply(params, li, t, c, TINY3, deep_feature=deep)
        if not cond_only:
            eps = sampler.cfg_combine(eps, g)
        eps = eps.astype(lat.dtype)
        lat, hist = plan.step(eps.astype(jnp.float32), i,
                              lat.astype(jnp.float32), hist)
        lat = lat.astype(lat0.dtype)
    np.testing.assert_allclose(got, np.asarray(lat), rtol=0, atol=2e-4)


def test_entering_guided_segment_forces_full_step():
    """cfg_interval=(1, 5): the guided segment starts at step 1 (odd, would
    be 'cached' under interval 2) with NO valid uncond cache — the forced
    full step must kick in. The eager simulation below treats every
    segment entry with a shape-mismatched cache as full, and must agree."""
    steps, batch, hw = 6, 1, 16
    rng = np.random.default_rng(12)
    params = unet_mod.nest_state_dict(unet_mod.init_state_dict(TINY3, rng))
    lat0 = jnp.asarray(rng.standard_normal((batch, hw, hw, 4)), jnp.float32)
    ctx = jnp.asarray(
        rng.standard_normal((2 * batch, 8, 32)) * 0.1, jnp.float32)
    plan = schedulers.ddim_plan(steps)
    g, n_cache = 7.5, 2
    fast = FastConfig(cfg_interval=(1, 5), cache_interval=n_cache)

    def model_factory(cond_only, cached, want_deep):
        c = ctx[batch:] if cond_only else ctx
        if cached:
            return lambda li, t, d: unet_mod.apply(
                params, li, t, c, TINY3, deep_feature=d)
        return lambda li, t: unet_mod.apply(
            params, li, t, c, TINY3, return_deep=want_deep)

    got = np.asarray(sampler.denoise_fast(
        model_factory, plan, lat0, guidance_scale=g, fast=fast))

    lat = lat0 * plan.init_noise_sigma
    hist = plan.init_carry(lat.shape, jnp.float32)
    deep = None
    seg_entry_forced = {0: 0, 1: 1, 2: 5}  # per-segment forced-full step
    seg_of = lambda i: 0 if i < 1 else (1 if i < 5 else 2)
    for i in range(steps):
        cond_only = not (1 <= i < 5)
        branches = 1 if cond_only else 2
        li = jnp.concatenate([lat] * branches, 0)
        li = plan.scale_model_input(li, i)
        t = plan.timesteps[i]
        c = ctx[batch:] if cond_only else ctx
        if cond_only and deep is not None and deep.shape[0] == 2 * batch:
            deep = deep[batch:]
        force = (deep is None or deep.shape[0] != branches * batch) and \
            i == seg_entry_forced[seg_of(i)]
        if i % n_cache == 0 or force:
            eps, deep = unet_mod.apply(params, li, t, c, TINY3,
                                       return_deep=True)
        else:
            assert deep is not None and deep.shape[0] == branches * batch
            eps = unet_mod.apply(params, li, t, c, TINY3, deep_feature=deep)
        if not cond_only:
            eps = sampler.cfg_combine(eps, g)
        eps = eps.astype(lat.dtype)
        lat, hist = plan.step(eps.astype(jnp.float32), i,
                              lat.astype(jnp.float32), hist)
        lat = lat.astype(lat0.dtype)
    np.testing.assert_allclose(got, np.asarray(lat), rtol=0, atol=2e-4)


def test_deep_carry_dtype_follows_model_not_latents():
    """fp32 latents through a bf16-computing model: the deep-cache carry
    must adopt the model's feature dtype or lax.scan fails at trace time
    (ADVICE r3). Wrap the model to force a bf16 deep feature."""
    steps, batch, hw = 4, 1, 16
    rng = np.random.default_rng(13)
    params = unet_mod.nest_state_dict(unet_mod.init_state_dict(TINY3, rng))
    lat0 = jnp.asarray(rng.standard_normal((batch, hw, hw, 4)), jnp.float32)
    ctx = jnp.asarray(
        rng.standard_normal((2 * batch, 8, 32)) * 0.1, jnp.float32)
    plan = schedulers.ddim_plan(steps)
    fast = FastConfig(cache_interval=2, cfg_interval=(0, steps))

    def model_factory(cond_only, cached, want_deep):
        c = ctx[batch:] if cond_only else ctx
        if cached:
            return lambda li, t, d: unet_mod.apply(
                params, li, t, c, TINY3, deep_feature=d.astype(jnp.float32))

        def f(li, t):
            out = unet_mod.apply(params, li, t, c, TINY3,
                                 return_deep=want_deep)
            if want_deep:
                eps, deep = out
                return eps, deep.astype(jnp.bfloat16)
            return out
        return f

    out = sampler.denoise_fast(model_factory, plan, lat0,
                               guidance_scale=7.5, fast=fast)
    assert np.isfinite(np.asarray(out)).all()


# ------------------------------------------------------- pipeline surface
@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    snap = make_sd_snapshot(tmp_path_factory.mktemp("snap"))
    return SDPipeline.from_pretrained(snap, dtype=jnp.float32)


def test_pipeline_noop_fast_is_identical(pipe):
    base = pipe("a cat", num_inference_steps=3, seed=5, height=32, width=32)
    noop = pipe("a cat", num_inference_steps=3, seed=5, height=32, width=32,
                fast=FastConfig())
    np.testing.assert_array_equal(base, noop)


def test_pipeline_full_window_fast_is_identical(pipe):
    base = pipe("a cat", num_inference_steps=4, seed=5, height=32, width=32)
    fast = pipe("a cat", num_inference_steps=4, seed=5, height=32, width=32,
                fast=FastConfig(cfg_interval=(0, 100)))
    np.testing.assert_array_equal(base, fast)


def test_pipeline_fast_modes_bounded_delta(pipe):
    """Real approximating configs on the tiny pipeline: deterministic,
    finite uint8 images whose per-pixel delta vs the exact path stays
    small relative to the 255-level range (loose, but catches a broken
    carry producing garbage)."""
    base = pipe("a cat", num_inference_steps=8, seed=5, height=32, width=32)
    for fc in (FastConfig(cache_interval=2),
               FastConfig(cfg_interval=(1, 6)),
               FastConfig(cfg_interval=(1, 6), cache_interval=2)):
        out = pipe("a cat", num_inference_steps=8, seed=5,
                   height=32, width=32, fast=fc)
        assert out.shape == base.shape and out.dtype == np.uint8
        again = pipe("a cat", num_inference_steps=8, seed=5,
                     height=32, width=32, fast=fc)
        np.testing.assert_array_equal(out, again)
        delta = np.abs(out.astype(np.int32) - base.astype(np.int32))
        assert delta.mean() < 64, (fc, delta.mean())


def test_pipeline_fast_rejects_multi_branch_modes(pipe):
    with pytest.raises(ValueError):
        pipe("a cat", num_inference_steps=2, seed=1, height=32, width=32,
             mode="sld", fast=FastConfig(cache_interval=2))


def test_fastconfig_from_spec_missing_colon_message():
    """A cfg_interval without ':' must explain the lo:hi syntax instead
    of raising a bare int('') ValueError."""
    with pytest.raises(ValueError, match="lo:hi"):
        FastConfig.from_spec("cfg_interval=5")
    with pytest.raises(ValueError, match="lo:hi"):
        FastConfig.from_spec("cfg_interval=5:")
