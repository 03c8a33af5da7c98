"""Headline benchmark: SD v1.4 512x512 50-step generation throughput/chip.

Prints ONE JSON line:
  {"metric": "sd14_512_50step_img_per_s", "value": N, "unit": "img/s",
   "vs_baseline": N / 2.0}

Baseline 2.0 img/s/chip is the driver's north-star target (BASELINE.md).
Runs on real-shape random weights (no model download; throughput is
value-independent). A secondary line on stderr reports the 100-concept
edit wall-clock against its <1 s target.

Tunnel resilience: the default invocation is a PARENT process that never
imports jax. It probes the TPU backend in bounded subprocesses with
backoff (the axon tunnel goes down and comes back — a hung backend init
has been observed blocking 45+ min, so in-process retry is not safe),
then runs the measurement as a ``--_worker`` subprocess with a hard
per-attempt timeout, retrying on failure until ``UCE_BENCH_DEADLINE_S``
(default 7200 s) is exhausted. On terminal failure it still prints the
single parseable JSON line, with an ``"error"`` field instead of a
silent traceback (round-2 lesson: BENCH_r02.json captured rc=1 and no
number because a dead tunnel raised at first device contact).

Usage: python bench.py [--tiny] [--batch N] [--steps N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

# Fast-path spec the default headline run measures alongside the exact
# protocol (override with UCE_BENCH_FAST_SPEC; on-chip sweep in
# docs/PERF.md "Fast mode"). Measured 2.089 img/s on chip (vs 1.265
# exact): CFG confined to scheduler calls [3, 25) (Kynkaanniemi et al.
# 2024) + DeepCache N=2 (Ma et al. 2023). Chosen over the equally-mild
# 5:30 window because it measures strictly LESS perturbation on the
# pixel-delta probe (PSNR 30.5 vs 27.3 dB, docs/bench/FASTQ_r04.json)
# at the same throughput. Both numbers land in ONE JSON line, labeled.
DEFAULT_FAST_SPEC = "cfg_interval=3:25,cache=2"


def bench_edit(d: int = 768, n_layers: int = 32, n_concepts: int = 100,
               n_preserve: int = 50) -> float:
    """100-concept edit of all cross-attn layers; returns seconds/edit."""
    import jax
    import numpy as np

    from uce_tpu.ops.solver import apply_edit_matrix, uce_edit_matrix

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    out_dims = ([320] * 12 + [640] * 8 + [1280] * 12)[:n_layers]
    # weights/embeddings staged on device once, as in a real serving flow
    w_cat = jnp.asarray(
        rng.standard_normal((sum(out_dims), d)).astype(np.float32) * 0.02)
    c_edit = jnp.asarray(rng.standard_normal((n_concepts, d)).astype(np.float32))
    c_guide = jnp.asarray(rng.standard_normal((n_concepts, d)).astype(np.float32))
    c_pres = jnp.asarray(rng.standard_normal((n_preserve, d)).astype(np.float32))
    jax.block_until_ready((w_cat, c_edit, c_guide, c_pres))

    jit_edit = jax.jit(lambda w, ce, cg, cp: apply_edit_matrix(
        w, uce_edit_matrix(ce, cg, cp, 1.0, 1.0, 0.5)))

    def run():
        return jit_edit(w_cat, c_edit, c_guide, c_pres)

    jax.block_until_ready(run())  # compile
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        out = run()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def bench_generation(tiny: bool, batch: int, steps: int,
                     quantize: bool = False, fast=None,
                     sdxl: bool = False, sd2: bool = False) -> float:
    """Returns images/second for 512x512 SD v1.4-architecture generation.

    ``fast``: optional ``sampler.FastConfig`` — measures the opt-in
    beyond-protocol path (CFG interval + DeepCache) instead of the exact
    reference protocol. The headline metric is always the exact path;
    fast numbers are reported alongside, clearly labeled.

    ``sdxl``: the reference notebook's flagship protocol instead
    (notebooks/inference_sd.ipynb: stabilityai/stable-diffusion-xl-base,
    50 steps, CFG 7.5, 1024x1024): SDXL UNet (2048-dim context, 10-layer
    mid transformers, text_time added-cond) + VAE decode at 1024px.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uce_tpu.diffusion import sampler, schedulers
    from uce_tpu.models import unet as unet_mod, vae as vae_mod

    if fast is not None and fast.is_noop:
        fast = None

    if tiny:
        config = unet_mod.UNetConfig(
            block_out_channels=(8, 16),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            layers_per_block=1, cross_attention_dim=32,
            attention_head_dim=2, norm_num_groups=4,
        )
        vae_config = vae_mod.VAEConfig(block_out_channels=(8, 16),
                                       layers_per_block=1, norm_num_groups=4)
        hw, text_dim, seq = 8, 32, 8
    elif sdxl:
        config = unet_mod.SDXL_UNET_CONFIG
        vae_config = vae_mod.SD_VAE_CONFIG  # same decoder architecture
        hw, text_dim, seq = 128, 2048, 77
    elif sd2:
        # SD 2.1 native protocol: 768x768, v-prediction scheduler config
        # is timing-equivalent to eps here (same ops per step)
        config = unet_mod.SD21_UNET_CONFIG
        vae_config = vae_mod.SD_VAE_CONFIG
        hw, text_dim, seq = 96, 1024, 77
    else:
        config = unet_mod.SD14_UNET_CONFIG
        vae_config = vae_mod.SD_VAE_CONFIG
        hw, text_dim, seq = 64, 768, 77

    dtype = jnp.bfloat16
    params = unet_mod.nest_state_dict(
        unet_mod.init_state_dict(config, np.random.default_rng(0)), dtype)
    vae_params = unet_mod.nest_state_dict(
        vae_mod.init_state_dict(vae_config, np.random.default_rng(1)), dtype)
    if quantize:
        from uce_tpu.models import quantize as quantize_mod

        params = quantize_mod.quantize_params(params)
        vae_params = quantize_mod.quantize_params(
            vae_params, quantize_mod.VAE_SKIP)
        print("W8A8 int8: UNet %d/%d, VAE %d/%d weights quantized"
              % (*quantize_mod.count_quantized(params),
                 *quantize_mod.count_quantized(vae_params)),
              file=sys.stderr)
    jax.block_until_ready((params, vae_params))
    plan = schedulers.pndm_plan(steps)

    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.standard_normal((batch, hw, hw, 4)), dtype)
    context = jnp.asarray(
        rng.standard_normal((2 * batch, seq, text_dim)) * 0.1, dtype)
    added_cond = None
    if sdxl:
        added_cond = {
            "text_embeds": jnp.asarray(
                rng.standard_normal((2 * batch, 1280)) * 0.1, dtype),
            "time_ids": jnp.tile(jnp.asarray(
                [hw * 8, hw * 8, 0, 0, hw * 8, hw * 8], jnp.float32),
                (2 * batch, 1)),
        }

    @jax.jit
    def generate(params, vae_params, plan, latents, context):
        if fast is not None:
            def model_factory(cond_only, cached, want_deep):
                ctx = context[batch:] if cond_only else context
                ac = None
                if added_cond is not None:
                    ac = ({k: v[batch:] for k, v in added_cond.items()}
                          if cond_only else added_cond)
                if cached:
                    return lambda li, t, d: unet_mod.apply(
                        params, li, t, ctx, config, added_cond=ac,
                        deep_feature=d, cache_level=fast.cache_level)
                return lambda li, t: unet_mod.apply(
                    params, li, t, ctx, config, added_cond=ac,
                    return_deep=want_deep, cache_level=fast.cache_level)

            final = sampler.denoise_fast(
                model_factory, plan, latents, guidance_scale=7.5,
                fast=fast)
        else:
            def model_fn(lat_in, t):
                return unet_mod.apply(params, lat_in, t, context, config,
                                      added_cond=added_cond)

            final = sampler.denoise(
                model_fn, plan, latents,
                guidance_fn=lambda e: sampler.cfg_combine(e, 7.5),
            )
        imgs = vae_mod.decode(
            vae_params,
            (final.astype(jnp.float32) / vae_config.scaling_factor).astype(dtype),
            vae_config)
        imgs = (imgs.astype(jnp.float32) / 2 + 0.5).clip(0, 1)
        return jnp.round(imgs * 255).astype(jnp.uint8)

    # Force full materialization via device->host copy: on the experimental
    # axon platform block_until_ready alone has been observed to return
    # before execution completes (measured: impossible throughputs).
    t0 = time.perf_counter()
    np.asarray(generate(params, vae_params, plan, latents, context))
    compile_s = time.perf_counter() - t0
    print(f"compile+first-run: {compile_s:.1f}s", file=sys.stderr)

    # Steady-state serving throughput: dispatch all runs (JAX dispatch is
    # async, so the device queue pipelines run N+1's compute under run
    # N's device->host copy), then force full D2H materialization of
    # EVERY run's images — the same per-image work and transfer as the
    # sequential loop, minus the artificial copy/compute serialization.
    # Two independent steady-state blocks, best taken: host/tunnel jitter
    # (GIL pauses, socket stalls, remote-server contention) only ever
    # SUBTRACTS from measured throughput — the chip cannot execute its
    # compiled program faster than its real rate — so max-of-k is the
    # lowest-variance estimator of the device's steady-state img/s.
    # Both blocks are printed so the noise band stays visible.
    n_runs = 3
    block_secs = []
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [generate(params, vae_params, plan, latents, context)
                for _ in range(n_runs)]
        for out in outs:
            np.asarray(out)
        block_secs.append((time.perf_counter() - t0) / n_runs)
        del out, outs
    print("steady-state blocks: "
          + ", ".join(f"{batch / s:.4f}" for s in block_secs)
          + " img/s (best reported)", file=sys.stderr)
    sec_per_run = min(block_secs)
    if not tiny and fast is None:
        # Analytic FLOP budget, cross-checked against XLA's CPU-backend
        # cost_analysis (tools/flop_count.py): SD1.4 UNet fwd = 788 GFLOP
        # at 64x64 latents, VAE decode = 2504 GFLOP at 512x512; SDXL UNet
        # fwd = 6761 GFLOP at 128x128 latents, VAE decode = 10470 GFLOP
        # at 1024x1024.  The TPU backend's own cost_analysis undercounts
        # convs ~20x, so it is not used here.  v5e bf16 peak: 197 TFLOP/s
        # (measured attainable on this chip: ~157 on chained large
        # matmuls — docs/PERF.md).
        if sdxl:
            unet_tf, vae_tf = 6.7612, 10.4704
        elif sd2:
            # SD2.1 at 96x96 latents / 768px (tools/flop_count.py:
            # sd14_unet(hw=96, ctx_dim=1024)); SOL at 157 TFLOP/s: 0.711
            unet_tf, vae_tf = 2.1491, 5.7543
        else:
            unet_tf, vae_tf = 0.788137, 2.503597
        flops = batch * (2 * plan.num_calls * unet_tf + vae_tf) * 1e12
        tflops = flops / sec_per_run / 1e12
        print(f"per-run {sec_per_run*1000:.0f} ms, {flops/1e12:.1f} TFLOP "
              f"analytic -> {tflops:.1f} TFLOP/s, MFU {tflops/197:.1%} "
              f"(197 TFLOP/s v5e bf16 peak)", file=sys.stderr)
        if sdxl and steps == 50:
            # SDXL speed of light at the 157 TFLOP/s realized chained-
            # matmul rate (tools/flop_count.py): 0.229 img/s
            sol = 157e12 / ((2 * 50 * unet_tf + vae_tf) * 1e12)
            print(f"= {batch / sec_per_run / sol:.0%} of the "
                  f"~{sol:.3f} img/s analytic speed-of-light for SDXL "
                  "1024px on this chip (157 TFLOP/s realized rate)",
                  file=sys.stderr)
        if sd2 and steps == 50:
            sol = 157e12 / ((2 * 50 * unet_tf + vae_tf) * 1e12)
            print(f"= {batch / sec_per_run / sol:.0%} of the "
                  f"~{sol:.3f} img/s analytic speed-of-light for SD2.1 "
                  "768px on this chip (157 TFLOP/s realized rate)",
                  file=sys.stderr)
        if steps == 50 and batch == 8 and not sdxl and not sd2:
            # Practical exact-bf16 ceiling for the HEADLINE protocol
            # (batch 8, 50 steps — docs/PERF.md "Roofline honesty"):
            # d=40 attention at its padded-MXU floor + the rest at the
            # 157 TFLOP/s realized chained-matmul rate. Only meaningful
            # for that protocol, so gated on it.
            ceiling = 1.40
            print(f"= {batch / sec_per_run / ceiling:.0%} of the "
                  f"~{ceiling:.2f} img/s practical exact-bf16 ceiling "
                  "for this chip (see docs/PERF.md roofline)",
                  file=sys.stderr)
    return batch / sec_per_run


class _Spec:  # sentinel leaf: (shape, fill value, dtype)
    def __init__(self, shape, val, dtype):
        self.shape, self.val, self.dtype = shape, val, dtype


def _device_fill_params(proto: dict, depth_for) -> dict:
    """Build a full-size DiT parameter tree ON DEVICE from a 1-layer proto.

    The host->device tunnel moves ~30 MB/s and a host init materializes
    many GB of fp32, so neither is benchable. TPU matmul/softmax timing is
    value-independent, so constant fills preserve the measurement while
    skipping host RNG, the host materialization, and per-shape
    eager-compile round-trips: take the shape tree of a 1-block config,
    widen the scan-stacked leading axes to the benched depth, and run ONE
    jitted fill program on the chip.

    ``depth_for(top_key, path, leaf) -> int | None``: the widened leading
    axis for this leaf (None = keep the proto shape). Fill values: 1.0
    for norm-scale-like leaves (1-D once the layer axis is counted out),
    0.0 elsewhere — they only need to keep the arithmetic finite. int8
    payloads and f32 quantization scales keep their dtypes; float leaves
    run bf16.
    """
    import jax
    import jax.numpy as jnp

    def _respec(top, tree):
        def spec(path, l):
            depth = depth_for(top, path, l)
            eff_ndim = l.ndim - (1 if depth else 0)
            last = getattr(path[-1], "key", None) if path else None
            if l.dtype == jnp.int8:        # w8 payload
                dtype, val = jnp.int8, 0
            elif last == "scale":          # w8 per-channel scale: f32
                dtype, val = jnp.float32, 1.0
            else:                          # float params run bf16
                dtype, val = jnp.bfloat16, 1.0 if eff_ndim == 1 else 0.0
            return _Spec((depth,) + l.shape[1:] if depth else l.shape,
                         val, dtype)

        return jax.tree_util.tree_map_with_path(spec, tree)

    spec_tree = {k: _respec(k, v) for k, v in proto.items()}
    specs, treedef = jax.tree.flatten(
        spec_tree, is_leaf=lambda x: isinstance(x, _Spec))

    @jax.jit
    def _fill():
        return [jnp.full(s.shape, s.val, s.dtype) for s in specs]

    return jax.tree.unflatten(treedef, _fill())


def bench_flux(batch: int = 4, w8: bool = False,
               _tiny: bool = False) -> float:
    """FLUX-schnell protocol (reference: inference_flux.ipynb cell 4 —
    4 steps, CFG 0, max_sequence_length 256) at 512x512.

    Default: HALF-DEPTH DiT (9 dual + 19 single blocks, ~6 GB bf16) —
    the full 12 B-param model exceeds a single v5e's 16 GB HBM in bf16
    (multi-chip TP territory — parallel/mesh.py shard_flux_params), so
    the single-chip bf16 number is a per-block-honest proxy; scale by
    ~2x for full depth.

    ``w8=True``: FULL-DEPTH (19 dual + 38 single) with weight-only int8
    (models/quantize.py mode="w8", ~12 GB int8 + bf16 arithmetic) — the
    whole 12 B-param DiT served from ONE chip. Secondary metric on
    stderr; returns images/second.

    ``_tiny=True`` is a CPU smoke hook (tests/test_quant.py): tiny
    dims, same code path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uce_tpu.diffusion.pipeline_flux import make_img_ids
    from uce_tpu.models import flux as flux_mod

    if _tiny:
        base = dict(in_channels=16, attention_head_dim=8,
                    num_attention_heads=2, joint_attention_dim=32,
                    pooled_projection_dim=24, guidance_embeds=False,
                    axes_dims_rope=(4, 2, 2))
        config = flux_mod.FluxConfig(num_layers=2, num_single_layers=2,
                                     **base)
    else:
        base = dict(guidance_embeds=False)
        config = (flux_mod.FluxConfig(**base)  # schnell, full depth
                  if w8 else
                  flux_mod.FluxConfig(num_layers=9, num_single_layers=19,
                                      **base))
    # Initialize on DEVICE from a 1-layer proto (_device_fill_params):
    # a host init would materialize ~13 GB fp32 behind a ~30 MB/s tunnel.
    small = flux_mod.FluxConfig(num_layers=1, num_single_layers=1, **base)
    proto = flux_mod.init_params(small, 0, 0.02)
    if w8:
        from uce_tpu.models import quantize as quantize_mod

        proto = quantize_mod.quantize_params(
            proto, quantize_mod.FLUX_SKIP, mode="w8")

    depths = {"transformer_blocks": config.num_layers,
              "single_transformer_blocks": config.num_single_layers}
    params = _device_fill_params(
        proto, lambda top, path, leaf: depths.get(top))
    del proto
    rng = np.random.default_rng(0)
    if _tiny:
        s_img, s_txt, lat_hw = 16, 8, 8
    else:
        s_img, s_txt, lat_hw = 1024, 256, 64  # 512x512 -> 32x32 2x2 patches
    lat = jnp.asarray(
        rng.standard_normal((batch, s_img, config.in_channels)),
        jnp.bfloat16)
    t5 = jnp.asarray(
        rng.standard_normal((batch, s_txt, config.joint_attention_dim)) * 0.1,
        jnp.bfloat16)
    pooled = jnp.asarray(
        rng.standard_normal((batch, config.pooled_projection_dim)) * 0.1,
        jnp.bfloat16)
    # 512x512 -> 64x64 latents -> 32x32 packed patches (ids take the
    # latent dims and halve internally)
    img_ids, txt_ids = make_img_ids(lat_hw, lat_hw), np.zeros((s_txt, 3))
    sigmas = jnp.linspace(1.0, 0.0, 5)

    @jax.jit
    def generate(params, lat, t5, pooled):
        def step(carry, i):
            z = carry
            t = jnp.full((batch,), sigmas[i], jnp.float32)
            v = flux_mod.apply(params, z, t5, pooled, t, img_ids, txt_ids,
                               config)
            return (z + (sigmas[i + 1] - sigmas[i]) * v).astype(z.dtype), None

        z, _ = jax.lax.scan(step, lat, jnp.arange(4))
        return z

    np.asarray(generate(params, lat, t5, pooled))  # compile + first run
    n_runs = 3
    t0 = time.perf_counter()
    outs = [generate(params, lat, t5, pooled) for _ in range(n_runs)]
    for out in outs:
        np.asarray(out)
    sec_per_run = (time.perf_counter() - t0) / n_runs
    return batch / sec_per_run


def bench_hidream(batch: int = 1, _tiny: bool = False,
                  cfg_window: tuple | None = None) -> float:
    """HiDream-I1 protocol (50 steps, CFG 5.0, 1024x1024 — the pipeline
    defaults, diffusion/pipeline_hidream.py:287-296; reference family:
    uce_hidream_edit.py) on a HALF-DEPTH (8 dual + 16 single block)
    weight-only-int8 MoE DiT.

    Depth honesty: the full 16+32-block model is ~17 B params — ~17 GB
    even as int8, beyond one 16 GB v5e — so half depth at w8 (~8.6 GB)
    is the largest single-chip-honest proxy; scale ~2x for full depth,
    which is multi-chip TP territory (parallel/mesh.py
    shard_hidream_params) like full-size bf16 FLUX.

    ``_tiny=True`` is a CPU smoke hook (tests): tiny dims, same code
    path. Returns images/second (DiT denoise only; excludes the quad
    text encoders and VAE, as bench_flux excludes T5/VAE).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uce_tpu.diffusion.pipeline_flux import make_img_ids
    from uce_tpu.models import hidream as hidream_mod
    from uce_tpu.models import quantize as quantize_mod

    if _tiny:
        base = dict(in_channels=4, out_channels=4, attention_head_dim=8,
                    num_attention_heads=2, caption_channels=(32, 32),
                    text_emb_dim=24, axes_dims_rope=(4, 2, 2),
                    ffn_multiple_of=8)
        config = hidream_mod.HiDreamConfig(num_layers=2,
                                           num_single_layers=2, **base)
        s_t5 = s_ll = 8
        lat_hw = 8
    else:
        base = {}
        config = hidream_mod.HiDreamConfig(num_layers=8,
                                           num_single_layers=16, **base)
        s_t5 = s_ll = 128   # reference truncation: uce_hidream_edit.py:220
        lat_hw = 128        # 1024px -> 128x128 latents -> 64x64 patches

    small = hidream_mod.HiDreamConfig(num_layers=1, num_single_layers=1,
                                      **base)
    proto = hidream_mod.init_params(small, 0, 0.02)
    proto = quantize_mod.quantize_params(
        proto, quantize_mod.HIDREAM_SKIP, mode="w8")

    n_blocks = config.num_layers + config.num_single_layers
    depths = {"double_stream_blocks": config.num_layers,
              "single_stream_blocks": config.num_single_layers}

    def depth_for(top, path, leaf):
        if top in depths:
            return depths[top]
        if top == "caption_projection":
            # llama projections are stacked [n_blocks, 4096, D]; the
            # final T5 projection is a plain [4096, D] leaf
            if any(getattr(p, "key", None) == "llama" for p in path):
                return n_blocks
        return None

    params = _device_fill_params(proto, depth_for)
    del proto

    rng = np.random.default_rng(0)
    s_img = (lat_hw // config.patch_size) ** 2
    feat = config.in_channels * config.patch_size ** 2
    # CFG 5.0 > 1 -> uncond+cond stacked on the batch axis (2x batch),
    # exactly like the pipeline's compiled step
    x = jnp.asarray(rng.standard_normal((batch, s_img, feat)), jnp.bfloat16)
    t5 = jnp.asarray(
        rng.standard_normal((2 * batch, s_t5, config.caption_channels[0]))
        * 0.1, jnp.bfloat16)
    llama = jnp.asarray(
        rng.standard_normal(
            (n_blocks, 2 * batch, s_ll, config.caption_channels[1])) * 0.1,
        jnp.bfloat16)
    pooled = jnp.asarray(
        rng.standard_normal((2 * batch, config.text_emb_dim)) * 0.1,
        jnp.bfloat16)
    img_ids = make_img_ids(lat_hw, lat_hw)
    n_steps = 2 if _tiny else 50
    sigmas = jnp.linspace(1.0, 0.0, n_steps + 1)

    @jax.jit
    def generate(params, x, t5, llama, pooled):
        def make_step(cond_only):
            def step(z, i):
                n_rows = batch if cond_only else 2 * batch
                t = jnp.full((n_rows,), sigmas[i] * 1000.0, jnp.float32)
                if cond_only:  # CFG window: only the cond rows run
                    v = hidream_mod.apply(
                        params, z, t5[batch:], llama[:, batch:],
                        pooled[batch:], t, img_ids, config)
                else:
                    v = hidream_mod.apply(
                        params, jnp.concatenate([z, z], axis=0), t5, llama,
                        pooled, t, img_ids, config)
                    vu, vc = v[:batch], v[batch:]
                    v = vu + 5.0 * (vc - vu)      # CFG combine
                # pipeline applies noise_pred = -v before the Euler step
                z = (z - (sigmas[i + 1] - sigmas[i]) * v).astype(z.dtype)
                return z, None
            return step

        if cfg_window is not None:
            from uce_tpu.diffusion.sampler import FastConfig

            segs = FastConfig(cfg_interval=cfg_window).segments(n_steps)
        else:
            segs = [(0, n_steps, False)]
        z = x
        for s, e, cond_only in segs:
            z, _ = jax.lax.scan(make_step(cond_only), z, jnp.arange(s, e))
        return z

    np.asarray(generate(params, x, t5, llama, pooled))  # compile + run 1
    n_runs = 2
    t0 = time.perf_counter()
    outs = [generate(params, x, t5, llama, pooled) for _ in range(n_runs)]
    for out in outs:
        np.asarray(out)
    sec_per_run = (time.perf_counter() - t0) / n_runs
    return batch / sec_per_run


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache next to this file.

    The axon tunnel's remote compiler is congestion-sensitive (measured
    128 s .. 1032 s for the SAME headline program), so a cold-cache bench
    run can dwarf the measurement wall-clock. Executable serialization
    works on this plugin (verified), making re-runs compile in seconds.
    Best-effort: any failure falls back to cold compiles.
    """
    import os

    from uce_tpu.utils.compile_cache import enable

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    if enable(cache_dir) is None:
        print("compile cache unavailable; cold compiles", file=sys.stderr)


def _probe_backend(timeout_s: float) -> bool:
    """True if a fresh subprocess can see TPU (or any) devices in time."""
    import os
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print(jax.default_backend())"],
            timeout=timeout_s, capture_output=True, text=True,
            env=dict(os.environ))
        # a dead tunnel can fall back to the CPU platform, which would
        # "pass" the probe and then burn a full worker timeout on a
        # 512px 50-step CPU run — require the real TPU backend
        return proc.returncode == 0 and \
            proc.stdout.strip().split("\n")[-1] in ("tpu", "axon")
    except subprocess.TimeoutExpired:
        return False


def _error_result(metric: str, msg: str) -> dict:
    return {"metric": metric, "value": None, "unit": "img/s",
            "vs_baseline": None, "error": msg}


def _orchestrate(argv: list) -> int:
    """Parent mode: never imports jax; retries worker attempts until a
    JSON result lands or the deadline runs out."""
    import os
    import subprocess

    deadline_s = float(os.environ.get("UCE_BENCH_DEADLINE_S", "7200"))
    t_start = time.monotonic()

    def remaining() -> float:
        return deadline_s - (time.monotonic() - t_start)

    tiny = "--tiny" in argv
    metric = "tiny_smoke_img_per_s" if tiny else "sd14_512_50step_img_per_s"
    if "--sdxl" in argv:
        metric = metric.replace("sd14_512", "sdxl_1024")
    if "--sd2" in argv:
        metric = metric.replace("sd14_512", "sd21_768")
    if "--quantize" in argv:
        metric += "_w8a8"  # keep error records keyed like success records
    if "--fast" in argv:
        metric += "_fast"
    if "--breakdown" in argv:
        metric = "per_step_breakdown_ms"
    last_err = "no attempt made"
    probe_backoff = 60.0
    attempt = 0
    while remaining() > 60:
        # Cheap bounded probe first: a dead tunnel hangs backend init for
        # 45+ min, which would eat the whole deadline inside one worker.
        if not tiny:
            if not _probe_backend(min(420.0, remaining())):
                last_err = "TPU backend probe timed out/failed"
                print(f"bench: backend probe failed; retrying in "
                      f"{probe_backoff:.0f}s ({remaining():.0f}s left)",
                      file=sys.stderr)
                time.sleep(min(probe_backoff, max(0.0, remaining())))
                probe_backoff = min(probe_backoff * 2, 600.0)
                continue
            probe_backoff = 60.0
        attempt += 1
        # --breakdown runs 5 full benches inside one worker; give it the
        # whole remaining deadline instead of the single-bench cap
        cap = 7200.0 if "--breakdown" in argv else 3900.0
        per_attempt = min(cap, max(60.0, remaining()))
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--_worker"]
                + argv,
                timeout=per_attempt, stdout=subprocess.PIPE,
                stderr=None, text=True, env=dict(os.environ))
        except subprocess.TimeoutExpired:
            last_err = f"worker attempt {attempt} timed out ({per_attempt:.0f}s)"
            print("bench: " + last_err, file=sys.stderr)
            continue
        json_lines = [ln for ln in proc.stdout.splitlines()
                      if ln.startswith("{")]
        if proc.returncode == 0 and json_lines:
            print(json_lines[-1])
            return 0
        last_err = (f"worker attempt {attempt} rc={proc.returncode}; "
                    f"stdout tail: {proc.stdout[-300:]!r}")
        print("bench: " + last_err, file=sys.stderr)
        time.sleep(min(30.0, max(0.0, remaining())))
    print(json.dumps(_error_result(metric, last_err)))
    return 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--_worker", action="store_true",
                    help=argparse.SUPPRESS)
    ap.add_argument("--tiny", action="store_true",
                    help="smoke-test mode (tiny model, CPU-friendly)")
    ap.add_argument("--batch", type=int, default=8)  # measured sweet spot
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--sdxl", action="store_true",
                    help="bench the SDXL protocol instead (reference "
                         "notebook flagship: 50 steps, CFG 7.5, 1024px — "
                         "notebooks/inference_sd.ipynb); separate metric "
                         "sdxl_1024_50step_img_per_s")
    ap.add_argument("--sd2", action="store_true",
                    help="bench the SD 2.1 protocol instead (768px, "
                         "cross-attn 1024, linear projections); separate "
                         "metric sd21_768_50step_img_per_s")
    ap.add_argument("--flux", action="store_true",
                    help="also time the FLUX-schnell 4-step DiT protocol "
                         "(secondary metric, stderr)")
    ap.add_argument("--flux_w8", action="store_true",
                    help="also time FULL-DEPTH FLUX-schnell with "
                         "weight-only int8 (12 B params on one chip; "
                         "secondary metric, stderr)")
    ap.add_argument("--hidream_w8", action="store_true",
                    help="also time the HiDream-I1 protocol (50 steps, "
                         "CFG 5, 1024px) on a half-depth w8 MoE DiT "
                         "(secondary metric, stderr)")
    ap.add_argument("--hidream_w8_fast", action="store_true",
                    help="also time the HiDream w8 DiT with the CFG "
                         "window cfg_interval=5:30 (secondary, stderr)")
    ap.add_argument("--skip_edit", action="store_true")
    ap.add_argument("--breakdown", action="store_true",
                    help="attribute per-step cost to op families by "
                         "measured ablation deltas (stderr)")
    ap.add_argument("--quantize", action="store_true",
                    help="W8A8 int8 deployment mode (2x MXU rate on v5e); "
                         "the headline metric stays bf16")
    ap.add_argument("--fast", type=str, default=None, metavar="SPEC",
                    help="measure ONLY the opt-in fast path "
                         "(FastConfig.from_spec, e.g. "
                         "'cfg_interval=2:25,cache=2'); reported as a "
                         "separate clearly-labeled metric")
    ap.add_argument("--no_fast", action="store_true",
                    help="suppress the fast-mode side measurement the "
                         "default headline run includes")
    args = ap.parse_args()
    if not args._worker:
        return _orchestrate(sys.argv[1:])
    _enable_compile_cache()

    if args.breakdown:
        # One subprocess per config: accumulating five compiled programs +
        # param sets in one process was observed to poison the timings.
        import json as json_mod
        import os
        import subprocess

        steps = args.steps
        results = {}
        for abl in ("", "attn", "gn", "ln", "attn,gn,ln"):
            env = dict(os.environ, UCE_ABLATE=abl)
            proc = subprocess.run(
                [sys.executable, __file__, "--_worker", "--skip_edit",
                 "--batch", str(args.batch), "--steps", str(steps)]
                + (["--tiny"] if args.tiny else [])
                + (["--quantize"] if args.quantize else []),
                env=env, capture_output=True, text=True, timeout=1800)
            lines = [l for l in proc.stdout.splitlines()
                     if l.startswith("{")]
            if proc.returncode != 0 or not lines:
                sys.stderr.write(proc.stderr)
                print(f"ablation subprocess [{abl or 'none'}] failed "
                      f"(rc={proc.returncode})", file=sys.stderr)
                return 1
            img_s = json_mod.loads(lines[-1])["value"]
            results[abl or "full"] = args.batch / img_s  # sec per run
            print(f"ablate[{abl or 'none'}]: {img_s:.4f} img/s",
                  file=sys.stderr)
        full = results["full"]
        per_step = full / steps * 1000
        print(f"\nper-step breakdown at batch {args.batch} "
              f"(CFG batch {2 * args.batch}), {steps} steps:",
              file=sys.stderr)
        for abl, label in (("attn", "attention"), ("gn", "group norms"),
                           ("ln", "layer norms")):
            delta = (full - results[abl]) / steps * 1000
            print(f"  {label:12s} {delta:6.1f} ms "
                  f"({delta / per_step:5.1%} of {per_step:.1f} ms)",
                  file=sys.stderr)
        rest = results["attn,gn,ln"] / steps * 1000
        print(f"  convs+rest   {rest:6.1f} ms (residual)", file=sys.stderr)
        # one stdout JSON line so the parent orchestrator (which gates on
        # a parseable '{' line) recognizes the breakdown as a success
        print(json_mod.dumps({
            "metric": "per_step_breakdown_ms",
            "value": round(per_step, 3),
            "unit": "ms/step",
            "parts": {
                "attention": round((full - results["attn"]) / steps * 1e3, 3),
                "group_norms": round((full - results["gn"]) / steps * 1e3, 3),
                "layer_norms": round((full - results["ln"]) / steps * 1e3, 3),
                "convs_rest": round(rest, 3),
            },
        }))
        return 0

    if not args.skip_edit:
        edit_s = bench_edit()
        print(f"100-concept edit: {edit_s*1000:.1f} ms "
              f"(target < 1000 ms, {1.0/edit_s:.1f}x headroom)",
              file=sys.stderr)

    if args.flux:
        flux_img_s = bench_flux(batch=args.batch)
        print(f"flux-schnell 512x512 4-step half-depth DiT: "
              f"{flux_img_s:.3f} img/s (secondary; ~/2 for full depth; "
              "excludes T5/VAE)", file=sys.stderr)
        print(json.dumps({"metric": "flux_halfdepth_img_per_s",
                          "value": round(flux_img_s, 4),
                          "unit": "img/s", "secondary": True}),
              file=sys.stderr)

    if args.flux_w8:
        flux_w8_img_s = bench_flux(w8=True)
        print(f"flux-schnell 512x512 4-step FULL-DEPTH w8 DiT "
              f"(12 B params, weight-only int8, one chip): "
              f"{flux_w8_img_s:.3f} img/s (secondary; excludes T5/VAE)",
              file=sys.stderr)
        print(json.dumps({"metric": "flux_fulldepth_w8_img_per_s",
                          "value": round(flux_w8_img_s, 4),
                          "unit": "img/s", "secondary": True}),
              file=sys.stderr)

    if args.hidream_w8:
        hd_img_s = bench_hidream()
        print(f"hidream-I1 1024x1024 50-step CFG5 half-depth w8 MoE DiT: "
              f"{hd_img_s:.4f} img/s (secondary; ~/2 for full depth; "
              "excludes encoders/VAE)", file=sys.stderr)
        print(json.dumps({"metric": "hidream_halfdepth_w8_img_per_s",
                          "value": round(hd_img_s, 4),
                          "unit": "img/s", "secondary": True}),
              file=sys.stderr)

    if args.hidream_w8_fast:
        hd_fast = bench_hidream(cfg_window=(5, 30))
        print(f"hidream-I1 w8 MoE DiT with cfg_interval=5:30: "
              f"{hd_fast:.4f} img/s (secondary; cond-only outside the "
              "window)", file=sys.stderr)
        print(json.dumps({"metric": "hidream_halfdepth_w8_fast_img_per_s",
                          "value": round(hd_fast, 4),
                          "unit": "img/s", "secondary": True,
                          "fast_spec": "cfg_interval=5:30"}),
              file=sys.stderr)

    fast_cfg = None
    if args.fast:
        from uce_tpu.diffusion.sampler import FastConfig

        fast_cfg = FastConfig.from_spec(args.fast)
    img_per_s = bench_generation(args.tiny, args.batch, args.steps,
                                 args.quantize, fast=fast_cfg,
                                 sdxl=args.sdxl, sd2=args.sd2)
    metric = "sd14_512_50step_img_per_s" if not args.tiny \
        else "tiny_smoke_img_per_s"
    if args.sdxl:
        metric = metric.replace("sd14_512", "sdxl_1024")
    if args.sd2:
        metric = metric.replace("sd14_512", "sd21_768")
    if args.quantize:
        metric += "_w8a8"
    if fast_cfg is not None:
        metric += "_fast"
    result = {
        "metric": metric,
        "value": round(img_per_s, 4),
        "unit": "img/s",
        "vs_baseline": round(img_per_s / 2.0, 4),
    }
    if args.sdxl or args.sd2:
        # no published SDXL/SD2.1 throughput target exists (BASELINE.md
        # is SD1.4-only); anchor against the analytic speed of light
        sol = 0.229 if args.sdxl else 0.711
        result["vs_baseline"] = None
        result["speed_of_light_img_per_s"] = sol
        result["pct_of_sol"] = round(img_per_s / sol, 4)
        result["batch"] = args.batch
    if fast_cfg is not None:
        result["fast_spec"] = args.fast
    elif not (args.tiny or args.quantize or args.no_fast):
        # The default headline run reports the exact reference protocol
        # (above) AND the opt-in fast path side by side, clearly labeled.
        # Quality evidence for the default spec: docs/PERF.md "Fast mode"
        # (pixel-delta A/B via tools/fast_quality.py; real-weights CLIP/
        # LPIPS gate scripted in tools/real_smoke.sh step 6).
        import os

        spec = os.environ.get("UCE_BENCH_FAST_SPEC", DEFAULT_FAST_SPEC)
        try:
            from uce_tpu.diffusion.sampler import FastConfig

            fast_img_s = bench_generation(
                args.tiny, args.batch, args.steps, args.quantize,
                fast=FastConfig.from_spec(spec), sdxl=args.sdxl,
                sd2=args.sd2)
            result["fast"] = {
                "spec": spec,
                "value": round(fast_img_s, 4),
                "vs_baseline": round(fast_img_s / 2.0, 4),
                "quality": "docs/PERF.md 'Fast mode'",
            }
        except Exception as exc:  # the exact headline must still land
            result["fast"] = {"spec": spec, "error": str(exc)[:200]}
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
