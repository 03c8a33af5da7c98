"""generate-hidream subcommand: HiDream-I1 batch generation over a prompts
CSV (eval protocol: {case}_{num}.png naming, case windows; Full defaults
50 steps / guidance 5.0 / max_sequence_length 128, the configuration the
reference edits against in trainscripts/uce_hidream_edit.py:16-64,220)."""

from __future__ import annotations

import os


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
    p.add_argument("--from_case", type=int, default=0)
    p.add_argument("--till_case", type=int, default=1_000_000)
    p.set_defaults(func=_cmd)


def _cmd(args) -> int:
    from uce_tpu.cli.main import apply_device_flag

    apply_device_flag(args.device)
    import pandas as pd

    from uce_tpu.diffusion.pipeline_hidream import HiDreamPipeline
    from uce_tpu.utils.imaging import save_case_images

    pipe = HiDreamPipeline.from_pretrained(
        args.model_name, llama_dir=args.llama_path,
        max_sequence_length=args.max_sequence_length)
    if args.uce_model_path:
        pipe.load_uce_edits(args.uce_model_path)

    folder = os.path.join(
        args.save_path,
        os.path.basename(args.uce_model_path).replace(".safetensors", "")
        if args.uce_model_path else "original")
    os.makedirs(folder, exist_ok=True)

    df = pd.read_csv(args.prompts_path)
    n = 0
    for _, row in df.iterrows():
        if not (args.from_case <= row.case_number <= args.till_case):
            continue
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
