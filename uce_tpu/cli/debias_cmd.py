"""debias-sd subcommand (reference: trainscripts/uce_sd_debias.py CLI)."""

from __future__ import annotations


def register_cli(sub) -> None:
    p = sub.add_parser("debias-sd",
                       help="iterative debiasing via generate->classify loop")
    p.add_argument("--edit_concepts", type=str, required=True)
    p.add_argument("--debias_concepts", type=str, required=True,
                   help="attributes to debias across, ;-separated")
    p.add_argument("--preserve_concepts", type=str, default=None)
    p.add_argument("--model_id", type=str,
                   default="CompVis/stable-diffusion-v1-4",
                   help="local HF snapshot directory")
    p.add_argument("--clip_model_id", type=str,
                   default="openai/clip-vit-base-patch32",
                   help="local CLIP snapshot directory for classification")
    p.add_argument("--device", type=str, default=None)
    p.add_argument("--edit_scale", type=float, default=1.0)
    p.add_argument("--preserve_scale", type=float, default=1.0)
    p.add_argument("--lamb", type=float, default=0.5)
    p.add_argument("--save_dir", type=str, default="../uce_models")
    p.add_argument("--exp_name", type=str, default="uce_test")
    p.add_argument("--desired_ratios", type=float, nargs="+",
                   default=[0.5, 0.5])
    p.add_argument("--max_iterations", type=int, default=30)
    p.add_argument("--max_diff", type=float, default=0.05)
    p.add_argument("--step_size", type=float, default=0.1,
                   help="accepted for reference-CLI compatibility (the "
                        "reference never uses it — SURVEY.md §2.1)")
    p.add_argument("--num_images_per_prompt", type=int, default=10)
    p.add_argument("--num_inference_steps", type=int, default=20)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--snapshot_every", type=int, default=None,
                   help="save intermediate safetensors every N iterations")
    p.add_argument("--telemetry_path", type=str, default=None,
                   help="CSV to record per-iteration observed/ratio values")
    p.add_argument("--mesh", type=str, default=None, metavar="SPEC",
                   help="multi-chip mesh 'data=N[,model=M]': the loop's "
                        "per-concept image batches (the wall-clock-dominant "
                        "cost, SURVEY §3.2) shard over the data axis")
    p.add_argument("--fast", type=str, default=None, metavar="SPEC",
                   help="beyond-protocol fast path for the measurement "
                        "generations, e.g. 'cfg_interval=3:25,cache=2' "
                        "(the controller reads CLIP ratios, not pixels; "
                        "still opt-in — see docs/PERF.md 'Fast mode')")
    p.add_argument("--device_resident", choices=["true", "false"],
                   default="true",
                   help="keep the per-iteration re-solve + weight swap on "
                        "device (bit-identical to the host path, ~4 s/iter "
                        "cheaper on chip); 'false' restores the host "
                        "solve + re-upload path")
    p.set_defaults(func=_cmd)


def _cmd(args) -> int:
    from uce_tpu.cli.main import apply_device_flag

    apply_device_flag(args.device)

    import jax.numpy as jnp

    from uce_tpu.diffusion.pipeline import SDPipeline
    from uce_tpu.edit.debias import DebiasSettings, run_debias
    from uce_tpu.models.clip import CLIPModel
    from uce_tpu.utils.prompts import parse_concepts

    edit_concepts = parse_concepts(args.edit_concepts)
    debias_concepts = parse_concepts(args.debias_concepts)
    preserve_concepts = (parse_concepts(args.preserve_concepts)
                         if args.preserve_concepts else [])
    if len(debias_concepts) != len(args.desired_ratios):
        raise SystemExit(
            "Error! The length of debias concepts and their corresponding "
            "desired ratios do not match.")

    print(f"\n\nEditing: {edit_concepts}\n")
    print(f"Debias Across: {debias_concepts}\n")
    print(f"Preserving: {preserve_concepts}\n")

    pipe = SDPipeline.from_pretrained(args.model_id, dtype=jnp.bfloat16)
    if args.mesh:
        from uce_tpu.parallel.mesh import mesh_from_spec

        pipe.apply_mesh(mesh_from_spec(args.mesh))
    clip_model = CLIPModel.from_pretrained(args.clip_model_id)
    settings = DebiasSettings(
        desired_ratios=args.desired_ratios,
        max_iterations=args.max_iterations, max_diff=args.max_diff,
        num_images_per_prompt=args.num_images_per_prompt,
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale,
        edit_scale=args.edit_scale, preserve_scale=args.preserve_scale,
        lamb=args.lamb,
    )
    fast_cfg = None
    if args.fast:
        from uce_tpu.diffusion.sampler import FastConfig

        fast_cfg = FastConfig.from_spec(args.fast)
    run_debias(pipe, clip_model, edit_concepts, debias_concepts,
               preserve_concepts, settings=settings, save_dir=args.save_dir,
               exp_name=args.exp_name, image_size=args.image_size,
               snapshot_every=args.snapshot_every,
               telemetry_path=args.telemetry_path, fast=fast_cfg,
               device_resident=args.device_resident == "true")
    return 0
