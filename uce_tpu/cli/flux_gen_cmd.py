"""generate-flux subcommand: FLUX.1 batch generation over a prompts CSV
(eval protocol: {case}_{num}.png naming, case windows; schnell defaults
4 steps / guidance 0 per notebooks/inference_flux.ipynb)."""

from __future__ import annotations



def register_cli(sub) -> None:
    p = sub.add_parser("generate-flux",
                       help="FLUX.1 CSV prompts -> PNG images")
    p.add_argument("--model_name", type=str, required=True,
                   help="local FLUX snapshot directory")
    p.add_argument("--prompts_path", type=str, required=True)
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--uce_model_path", type=str, default=None)
    p.add_argument("--device", type=str, default=None)
    p.add_argument("--guidance_scale", type=float, default=0.0)
    p.add_argument("--image_size", type=int, default=1024)
    p.add_argument("--num_inference_steps", type=int, default=4)
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--max_sequence_length", type=int, default=None)
    p.add_argument("--quantize", type=str, default=None,
                   choices=["w8", "int8"],
                   help="quantize the DiT: w8 = weight-only int8 (half "
                        "weight HBM; fits the 12B DiT on a 16 GB chip)")
    p.add_argument("--staged", action="store_true",
                   help="memory-staged: encode ALL prompts first, free "
                        "the T5/CLIP encoders, then load the DiT into "
                        "the vacated HBM (reference uce_flux_edit.py "
                        "three-phase load, adapted for one 16 GB chip)")
    p.add_argument("--mesh", type=str, default=None, metavar="SPEC",
                   help="multi-chip mesh 'data=N[,model=M]': shard "
                        "the batch over N data groups, lay the DiT "
                        "out tensor-parallel over M chips")
    p.add_argument("--from_case", type=int, default=0)
    p.add_argument("--till_case", type=int, default=1_000_000)
    p.set_defaults(func=_cmd)


def _cmd(args) -> int:
    from uce_tpu.cli.main import apply_device_flag

    apply_device_flag(args.device)
    import pandas as pd

    from uce_tpu.diffusion.pipeline_flux import FluxPipeline
    from uce_tpu.utils.imaging import save_case_images

    pipe = FluxPipeline.from_pretrained(
        args.model_name, max_sequence_length=args.max_sequence_length,
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

    embeds = None
    if args.staged:
        # phase 1: encode every case's prompts, then free the encoders so
        # the DiT loads into the vacated HBM (phase 2, on first generate)
        # Pull each case's embeddings to HOST so a large prompts CSV
        # cannot accumulate device residency next to the 12B DiT; they
        # re-upload per case at generate time.
        import jax

        embeds = [jax.device_get(
                      pipe.encode_prompts([str(row.prompt)] * args.num_samples))
                  for row in rows]
        pipe.free_encoders()

    n = 0
    for i, row in enumerate(rows):
        if args.staged:
            t5_embeds, pooled = embeds[i]
            images = pipe.generate_from_embeddings(
                t5_embeds, pooled, n_prompts=1,
                num_images_per_prompt=args.num_samples,
                num_inference_steps=args.num_inference_steps,
                guidance_scale=args.guidance_scale,
                seed=int(row.evaluation_seed),
                height=args.image_size, width=args.image_size)
        else:
            images = pipe(
                str(row.prompt),
                num_inference_steps=args.num_inference_steps,
                guidance_scale=args.guidance_scale,
                num_images_per_prompt=args.num_samples,
                seed=int(row.evaluation_seed),
                height=args.image_size, width=args.image_size)
        save_case_images(images, folder, row.case_number)
        n += 1
    print(f"generated {n} cases")
    return 0
