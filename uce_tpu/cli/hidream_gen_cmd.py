"""generate-hidream subcommand: HiDream-I1 batch generation over a prompts
CSV (eval protocol: {case}_{num}.png naming, case windows; Full defaults
50 steps / guidance 5.0 / max_sequence_length 128, the configuration the
reference edits against in trainscripts/uce_hidream_edit.py:16-64,220)."""

from __future__ import annotations



def register_cli(sub) -> None:
    p = sub.add_parser("generate-hidream",
                       help="HiDream-I1 CSV prompts -> PNG images")
    p.add_argument("--model_name", type=str, required=True,
                   help="local HiDream snapshot directory")
    p.add_argument("--llama_path", type=str, default=None,
                   help="local Llama-3.1-8B-Instruct snapshot (defaults to "
                        "<model_name>/text_encoder_4 when present)")
    p.add_argument("--prompts_path", type=str, required=True)
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--uce_model_path", type=str, default=None)
    p.add_argument("--device", type=str, default=None)
    p.add_argument("--guidance_scale", type=float, default=5.0)
    p.add_argument("--image_size", type=int, default=1024)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--max_sequence_length", type=int, default=128)
    p.add_argument("--quantize", type=str, default=None,
                   choices=["w8", "int8"],
                   help="quantize the MoE DiT: w8 = weight-only int8 "
                        "(half weight HBM, bf16 arithmetic)")
    p.add_argument("--staged", action="store_true",
                   help="memory-staged: encode ALL prompts with the quad "
                        "encoders first, free them, then load the DiT "
                        "into the vacated HBM (reference "
                        "uce_hidream_edit.py three-phase load)")
    p.add_argument("--mesh", type=str, default=None, metavar="SPEC",
                   help="multi-chip mesh 'data=N[,model=M]': shard "
                        "the batch over N data groups, lay the DiT "
                        "out tensor-parallel over M chips")
    p.add_argument("--fast", type=str, default=None, metavar="SPEC",
                   help="CFG-interval window (cond-only DiT outside it — "
                        "halves the dominant MoE cost there); "
                        "'cfg_interval=5:30' is the measured default pick "
                        "(1.35x at the lowest latent perturbation of the "
                        "r5 window sweep, docs/bench/HIDREAM_FASTQ_r05."
                        "json); cache=N is UNet-only and rejected")
    p.add_argument("--from_case", type=int, default=0)
    p.add_argument("--till_case", type=int, default=1_000_000)
    p.set_defaults(func=_cmd)


def _cmd(args) -> int:
    from uce_tpu.cli.main import apply_device_flag

    apply_device_flag(args.device)
    import pandas as pd

    from uce_tpu.diffusion.pipeline_hidream import HiDreamPipeline
    from uce_tpu.utils.imaging import save_case_images

    fast_cfg = None
    if args.fast:
        # parse AND validate up front: a bad spec (typo, or cache=N —
        # UNet-only, rejected for a DiT) must fail before the expensive
        # staged quad-encoder pass, not after it
        from uce_tpu.diffusion.sampler import FastConfig

        fast_cfg = FastConfig.from_spec(args.fast)
        if fast_cfg.cache_interval != 1:
            raise SystemExit(
                "generate-hidream --fast supports cfg_interval only "
                "(a DiT has no deep UNet levels to cache)")

    pipe = HiDreamPipeline.from_pretrained(
        args.model_name, llama_dir=args.llama_path,
        max_sequence_length=args.max_sequence_length,
        staged=args.staged, quantize=args.quantize)
    if args.uce_model_path:
        pipe.load_uce_edits(args.uce_model_path)
    if args.mesh:
        from uce_tpu.parallel.mesh import mesh_from_spec

        pipe.apply_mesh(mesh_from_spec(args.mesh))

    from uce_tpu.utils.imaging import case_window, uce_output_folder

    folder = uce_output_folder(args.save_path, args.uce_model_path)
    df = pd.read_csv(args.prompts_path)
    rows = case_window(df, args.from_case, args.till_case)
    do_cfg = args.guidance_scale > 1.0

    embeds = None
    if args.staged:
        # phase 1: encode every case with the quad encoders (CFG uncond
        # rows first, matching __call__), then free them so the MoE DiT
        # loads into the vacated HBM (phase 2, on first generate)
        import jax
        import jax.numpy as jnp

        # the unconditional batch never changes — encode it ONCE, not
        # one CLIP-L+CLIP-G+T5+Llama-8B forward per CSV row
        uncond = (pipe.encode_prompts([""] * args.num_samples)
                  if do_cfg else None)

        def _encode_case(prompt: str):
            t5_c, ll_c, p_c = pipe.encode_prompts([prompt] * args.num_samples)
            if not do_cfg:
                return t5_c, ll_c, p_c
            t5_u, ll_u, p_u = uncond
            return (jnp.concatenate([t5_u, t5_c], axis=0),
                    jnp.concatenate([ll_u, ll_c], axis=1),
                    jnp.concatenate([p_u, p_c], axis=0))

        # Embeddings live on HOST between phases: each HiDream case holds
        # multi-layer Llama hidden states (num_llama_layers x samples x
        # seq x 4096 bf16, x2 under CFG — tens of MB), so keeping every
        # case resident would OOM the 16 GB chip next to the DiT, the
        # exact scenario --staged exists for. They re-upload per case at
        # generate time (implicit transfer into the jitted step).
        embeds = [jax.device_get(_encode_case(str(row.prompt)))
                  for row in rows]
        pipe.free_encoders()

    n = 0
    for i, row in enumerate(rows):
        if args.staged:
            t5_e, llama_e, pooled_e = embeds[i]
            images = pipe.generate_from_embeddings(
                t5_e, llama_e, pooled_e, do_cfg=do_cfg, n_prompts=1,
                num_images_per_prompt=args.num_samples,
                num_inference_steps=args.num_inference_steps,
                guidance_scale=args.guidance_scale,
                seed=int(row.evaluation_seed),
                height=args.image_size, width=args.image_size,
                fast=fast_cfg)
        else:
            images = pipe(
                str(row.prompt),
                num_inference_steps=args.num_inference_steps,
                guidance_scale=args.guidance_scale,
                num_images_per_prompt=args.num_samples,
                seed=int(row.evaluation_seed),
                height=args.image_size, width=args.image_size,
                fast=fast_cfg)
        save_case_images(images, folder, row.case_number)
        n += 1
    print(f"generated {n} cases")
    return 0
