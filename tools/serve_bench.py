"""On-chip serving-load measurement at SD v1.4 scale.

Builds an SD1.4-architecture SDPipeline on RANDOM weights (throughput is
value-independent; no model download exists in this image), wraps it in
the GenerationServer (uce_tpu/serving/server.py: compile-once, dynamic
batching into one static shape), and drives it with the seeded Poisson
load generator (uce_tpu/serving/loadgen.py) at several offered rates.

This is the measured counterpart to bench.py's closed-loop ceiling: the
reference has no serving layer at all (its eval scripts reload the
pipeline per process — /root/reference/evalscripts/generate-images-sd.py:13-15),
so these numbers quantify what the serving layer adds on TPU. Results
are recorded in docs/PERF.md "Serving under load".

Prints one JSON line per rate:
  {"offered_rps": .., "throughput_rps": .., "latency_p50_s": ..,
   "latency_p95_s": .., "occupancy": .., "batch_seconds_mean": ..}

Usage (on the TPU chip):
  python tools/serve_bench.py --rates 0.3,0.9,1.5 --requests 24 \
      --batch 8 --max_wait_ms 2000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))  # snapshot.py helpers


def build_sd14_pipeline(tiny: bool = False):
    """SD1.4-architecture pipeline on random weights, bf16 on device.

    The tokenizer is the char-vocab CLIPTokenizer from tests/snapshot.py
    at model_max_length=77 — its ids are all < 74, valid rows of the
    full-size 49408x768 embedding, and the BPE/padding/attention-mask
    behavior matches the real tokenizer's.

    ``tiny`` swaps in the bench.py tiny configs (CPU smoke of the
    harness itself, not a measurement).
    """
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from snapshot import _write_tokenizer
    from transformers import CLIPTokenizer

    from uce_tpu.diffusion.pipeline import SDPipeline
    from uce_tpu.models import clip_text
    from uce_tpu.models import unet as unet_mod
    from uce_tpu.models import vae as vae_mod

    tok_root = tempfile.mkdtemp(prefix="uce_serve_bench_tok_")
    _write_tokenizer(tok_root, "tokenizer", max_pos=77)
    tokenizer = CLIPTokenizer.from_pretrained(
        os.path.join(tok_root, "tokenizer"))

    if tiny:
        ucfg = unet_mod.UNetConfig(
            block_out_channels=(8, 16),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            layers_per_block=1, cross_attention_dim=32,
            attention_head_dim=2, norm_num_groups=4,
        )
        vcfg = vae_mod.VAEConfig(block_out_channels=(8, 16),
                                 layers_per_block=1, norm_num_groups=4)
        tcfg = dataclasses.replace(clip_text.SD14_TEXT_CONFIG,
                                   hidden_size=32, num_hidden_layers=2,
                                   num_attention_heads=4,
                                   intermediate_size=64)
    else:
        ucfg = unet_mod.SD14_UNET_CONFIG
        vcfg = vae_mod.SD_VAE_CONFIG
        tcfg = clip_text.SD14_TEXT_CONFIG
    text_params = clip_text.init_params(np.random.default_rng(0), tcfg)
    uparams = unet_mod.nest_state_dict(
        unet_mod.init_state_dict(ucfg, np.random.default_rng(1)))
    vparams = unet_mod.nest_state_dict(
        vae_mod.init_state_dict(vcfg, np.random.default_rng(2)))
    sched = {
        "_class_name": "PNDMScheduler",
        "beta_start": 0.00085, "beta_end": 0.012,
        "beta_schedule": "scaled_linear", "num_train_timesteps": 1000,
        "set_alpha_to_one": False, "steps_offset": 1,
        "skip_prk_steps": True,
    }
    dtype = jnp.bfloat16
    return SDPipeline(
        unet_params=unet_mod.cast_params(uparams, dtype), unet_config=ucfg,
        # text params stay fp32, matching SDPipeline.from_pretrained
        text_params=text_params, text_config=tcfg, tokenizer=tokenizer,
        vae_params=unet_mod.cast_params(vparams, dtype), vae_config=vcfg,
        scheduler_config=sched, dtype=dtype,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rates", type=str, default="0.3,0.9,1.5",
                    help="comma-separated offered request/s rates; a "
                         "'rate@waitms' entry overrides --max_wait_ms "
                         "for that run (e.g. '0.3@100' = latency mode)")
    ap.add_argument("--requests", type=int, default=24,
                    help="requests per rate")
    ap.add_argument("--batch", type=int, default=8,
                    help="compiled serving batch (requests pad into it)")
    ap.add_argument("--batch_sizes", type=str, default=None,
                    help="comma-separated compiled batch LADDER "
                         "(e.g. '1,2,4,8'; overrides --batch)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--max_wait_ms", type=float, default=2000.0,
                    help="batch-fill linger once a request arrives; "
                         "small = latency mode, ~batch/rate = "
                         "throughput mode")
    ap.add_argument("--fast", type=str, default=None, metavar="SPEC",
                    help="serve with the beyond-protocol fast path "
                         "(FastConfig.from_spec, e.g. "
                         "'cfg_interval=3:25,cache=2')")
    ap.add_argument("--pin_rung", action="store_true",
                    help="pad every batch into the top rung "
                         "(bit-reproducible ladder)")
    ap.add_argument("--mesh", type=str, default=None, metavar="SPEC",
                    help="serve over a device mesh 'data=N[,model=M]' "
                         "(uce serve --mesh path); on the 1-chip bench "
                         "box this is only meaningful with --tiny on "
                         "the virtual CPU mesh")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny-config CPU smoke of the harness (forces "
                         "the cpu backend; not a measurement)")
    args = ap.parse_args()

    if args.tiny:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from uce_tpu.utils.compile_cache import enable
    enable(os.path.join(REPO, ".jax_cache"))

    from uce_tpu.serving.loadgen import run_load
    from uce_tpu.serving.server import GenerationServer, ServerConfig

    pipe = build_sd14_pipeline(tiny=args.tiny)
    if args.tiny:
        args.size, args.steps = 64, min(args.steps, 5)
    if args.mesh:
        from uce_tpu.parallel.mesh import mesh_from_spec

        pipe.apply_mesh(mesh_from_spec(args.mesh))
    cfg = ServerConfig(
        batch_size=args.batch, num_inference_steps=args.steps,
        guidance_scale=7.5, height=args.size, width=args.size,
        max_wait_ms=args.max_wait_ms, warmup=True,
        batch_sizes=tuple(int(s) for s in args.batch_sizes.split(",")
                          if s.strip())
        if args.batch_sizes else (),
        fast=args.fast, pin_rung=args.pin_rung,
    )
    runs = []
    for entry in (r.strip() for r in args.rates.split(",") if r.strip()):
        rate, _, wait = entry.partition("@")
        runs.append((float(rate),
                     float(wait) if wait else args.max_wait_ms))

    t0 = time.time()
    server = GenerationServer(pipe, cfg)
    with server:
        print(f"warmup (compile + first batch): {time.time() - t0:.1f}s",
              file=sys.stderr)
        import dataclasses as _dc
        for rate, wait_ms in runs:
            # ServerConfig is frozen; swapping the config only changes the
            # batching POLICY (max_wait), never the compiled signature
            server.config = _dc.replace(server.config, max_wait_ms=wait_ms)
            report = run_load(server, rate, args.requests)
            line = report.json()
            line["max_wait_ms"] = wait_ms
            print(json.dumps(line), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
