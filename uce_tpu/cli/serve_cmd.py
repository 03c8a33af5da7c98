"""``uce serve``: compile-once generation server over a Unix socket.

Starts an SDPipeline (optionally with a UCE edit overlay), warms ONE
static serving signature (batch x size x steps), and serves JSON-line
requests with dynamic batching into that shape (uce_tpu/serving/). The
reference has no serving path — its eval scripts reload the pipeline per
process (evalscripts/generate-images-sd.py:13-15).

Client example::

    uce serve --model_id /models/sd14 --socket /tmp/uce.sock &
    python -c "from uce_tpu.serving.socket_api import request; \
        print(request('/tmp/uce.sock', {'prompt': 'a cat', 'seed': 7, \
                                        'save_path': 'cat.png'}))"
"""

from __future__ import annotations


def register_cli(sub) -> None:
    p = sub.add_parser(
        "serve", help="generation server with dynamic batching (Unix socket)")
    p.add_argument("--model_id", type=str, required=True,
                   help="local HF snapshot directory")
    p.add_argument("--family", type=str, default="sd",
                   choices=["sd", "flux", "hidream"],
                   help="pipeline family (sd covers SD v1/v2/SDXL)")
    p.add_argument("--llama_dir", type=str, default=None,
                   help="Llama snapshot for --family hidream")
    p.add_argument("--socket", type=str, default="/tmp/uce.sock")
    p.add_argument("--uce_model_path", type=str, default=None,
                   help="safetensors edit overlay to serve")
    p.add_argument("--quantize", type=str, default=None,
                   choices=["w8", "int8"],
                   help="quantize model weights: w8 = weight-only int8 "
                        "(half weight HBM, bf16 arithmetic)")
    p.add_argument("--batch_size", type=int, default=4,
                   help="compiled serving batch (requests pad into it)")
    p.add_argument("--batch_sizes", type=str, default=None,
                   help="comma-separated LADDER of compiled batch sizes "
                        "(e.g. '1,2,4,8'): each gathered batch runs the "
                        "smallest compiled size that fits, so low-rate "
                        "traffic avoids paying full-batch device time; "
                        "warmup compiles every rung (overrides "
                        "--batch_size)")
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--scheduler", type=str, default=None)
    p.add_argument("--max_wait_ms", type=float, default=50.0,
                   help="max linger for batch fill once a request arrives")
    p.add_argument("--pin_rung", action="store_true",
                   help="always run the TOP batch rung: one XLA program "
                        "serves all traffic, restoring bit-reproducible "
                        "outputs per (prompt, seed) under a --batch_sizes "
                        "ladder (costs the low-rate latency win)")
    p.add_argument("--fast", type=str, default=None, metavar="SPEC",
                   help="beyond-protocol accelerations, e.g. "
                        "'cfg_interval=2:25,cache=2,level=1' (CFG only in "
                        "the step window; DeepCache deep-UNet reuse every "
                        "N steps) — quantified quality delta in "
                        "docs/PERF.md")
    p.add_argument("--no_warmup", action="store_true",
                   help="skip the warmup batch (first request compiles)")
    p.add_argument("--bench", type=str, default=None, metavar="RATES",
                   help="instead of serving a socket, run a synthetic "
                        "Poisson load at these comma-separated request/s "
                        "rates (e.g. '0.5,1,2') and print one JSON report "
                        "line per rate (serving/loadgen.py)")
    p.add_argument("--bench_requests", type=int, default=24,
                   help="requests per --bench rate")
    p.add_argument("--mesh", type=str, default=None, metavar="SPEC",
                   help="multi-chip mesh 'data=N[,model=M]': shard each "
                        "served batch over N data groups and lay the "
                        "UNet/DiT out tensor-parallel (HiDream: expert-"
                        "parallel MoE) over M chips")
    p.add_argument("--device", type=str, default=None)
    p.set_defaults(func=_cmd)


def _cmd(args) -> int:
    from uce_tpu.cli.main import apply_device_flag

    apply_device_flag(args.device)
    from uce_tpu.serving.server import GenerationServer, ServerConfig
    from uce_tpu.serving.socket_api import SocketFrontend

    # DiT families quantize HOST-side at load (from_pretrained(quantize=)):
    # a full-size bf16 FLUX/HiDream tree may not fit the chip at all, so
    # quantize-after-load would OOM before quantize_weights could run.
    if args.family == "flux":
        from uce_tpu.diffusion.pipeline_flux import FluxPipeline

        pipe = FluxPipeline.from_pretrained(args.model_id,
                                            quantize=args.quantize)
    elif args.family == "hidream":
        from uce_tpu.diffusion.pipeline_hidream import HiDreamPipeline

        pipe = HiDreamPipeline.from_pretrained(args.model_id,
                                               llama_dir=args.llama_dir,
                                               quantize=args.quantize)
    else:
        from uce_tpu.diffusion.pipeline import SDPipeline

        pipe = SDPipeline.from_pretrained(args.model_id)
        if args.quantize:
            pipe.quantize_weights(args.quantize)
    if args.uce_model_path:
        pipe.load_uce_edits(args.uce_model_path)
    if args.mesh:
        from uce_tpu.parallel.mesh import mesh_from_spec

        pipe.apply_mesh(mesh_from_spec(args.mesh))
    batch_sizes = tuple(
        int(s) for s in args.batch_sizes.split(",") if s.strip()
    ) if args.batch_sizes else ()
    cfg = ServerConfig(
        batch_size=args.batch_size,
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale,
        height=args.image_size, width=args.image_size,
        scheduler=args.scheduler, max_wait_ms=args.max_wait_ms,
        warmup=not args.no_warmup,
        batch_sizes=batch_sizes,
        pin_rung=args.pin_rung,
        fast=args.fast,
    )
    if args.bench:
        import json

        from uce_tpu.serving.loadgen import run_load

        rates = [float(r) for r in args.bench.split(",") if r.strip()]
        server = GenerationServer(pipe, cfg)
        with server:
            for rate in rates:
                report = run_load(server, rate, args.bench_requests)
                print(json.dumps(report.json()), flush=True)
        return 0

    # Bind the socket BEFORE the warmup compile: an occupied socket path
    # fails in milliseconds instead of after minutes of XLA compilation,
    # and clients can queue on the endpoint while warmup runs.
    server = GenerationServer(pipe, cfg)
    frontend = SocketFrontend(server, args.socket)
    try:
        server.start()
        print(f"uce serve: listening on {args.socket} "
              f"(batches={list(server.batch_sizes)}, "
              f"{cfg.height}x{cfg.width}, "
              f"steps={cfg.num_inference_steps})", flush=True)
        frontend.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        frontend.close()
        server.close()
    return 0
