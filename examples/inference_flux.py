"""Before/after UCE A/B demo for FLUX.1 — the runnable equivalent of the
reference's ``notebooks/inference_flux.ipynb`` (cells 4/6: FLUX.1-schnell at
4 steps, ``guidance_scale=0``, ``max_sequence_length=256``, same seed before
and after the text-entry-projection edit).

Usage:
    python examples/inference_flux.py --model_id /path/to/flux_snapshot \
        --uce_model_path uce_models/erased-flux.safetensors \
        [--out_dir demo_flux]
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_id", required=True,
                    help="local HF snapshot directory (FLUX.1 schnell/dev)")
    ap.add_argument("--uce_model_path", required=True,
                    help="UCE safetensors artifact from `uce edit-flux`")
    ap.add_argument("--erased_prompt",
                    default="a painting in the style of Van Gogh")
    ap.add_argument("--preserved_prompt",
                    default="a photo of a red sports car")
    ap.add_argument("--seed", type=int, default=2024)
    ap.add_argument("--num_inference_steps", type=int, default=4)
    ap.add_argument("--guidance_scale", type=float, default=0.0)
    ap.add_argument("--image_size", type=int, default=1024)
    ap.add_argument("--out_dir", default="demo_flux")
    args = ap.parse_args()

    from uce_tpu.diffusion.pipeline_flux import FluxPipeline
    from uce_tpu.utils.imaging import save_png

    pipe = FluxPipeline.from_pretrained(args.model_id)
    prompts = [args.erased_prompt, args.preserved_prompt]
    kwargs = dict(num_inference_steps=args.num_inference_steps,
                  guidance_scale=args.guidance_scale,
                  height=args.image_size, width=args.image_size,
                  seed=args.seed)

    os.makedirs(args.out_dir, exist_ok=True)
    before = pipe(prompts, **kwargs)
    save_png(before[0], os.path.join(args.out_dir, "erased_before.png"))
    save_png(before[1], os.path.join(args.out_dir, "preserved_before.png"))

    pipe.load_uce_edits(args.uce_model_path)
    after = pipe(prompts, **kwargs)
    save_png(after[0], os.path.join(args.out_dir, "erased_after.png"))
    save_png(after[1], os.path.join(args.out_dir, "preserved_after.png"))
    print(f"wrote 4 images to {args.out_dir}/")


if __name__ == "__main__":
    main()
