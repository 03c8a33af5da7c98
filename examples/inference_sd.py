"""Before/after UCE A/B demo for SD / SDXL — the runnable equivalent of the
reference's ``notebooks/inference_sd.ipynb`` (cells 1/3/5: snapshot original
weights for the edited keys, render an erased and a preserved prompt with the
same seed before and after ``load_state_dict(uce_weights, strict=False)``;
50 steps, CFG 7.5).

Usage:
    python examples/inference_sd.py --model_id /path/to/sd_snapshot \
        --uce_model_path uce_models/erased-vangogh.safetensors \
        [--erased_prompt ...] [--preserved_prompt ...] [--out_dir demo_sd]

Produces four PNGs: {erased,preserved}_{before,after}.png.  The edit overlay
is non-destructive (safetensors keyed by module path, applied strict=False
both here and in the reference, ``generate-images-sd.py:17-19``).
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_id", required=True,
                    help="local HF snapshot directory (SD v1.x/v2.x/SDXL)")
    ap.add_argument("--uce_model_path", required=True,
                    help="UCE safetensors artifact from `uce edit-sd`")
    ap.add_argument("--erased_prompt",
                    default="a painting in the style of Van Gogh")
    ap.add_argument("--preserved_prompt",
                    default="a photo of a red sports car")
    ap.add_argument("--seed", type=int, default=2024)
    ap.add_argument("--num_inference_steps", type=int, default=50)
    ap.add_argument("--guidance_scale", type=float, default=7.5)
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--out_dir", default="demo_sd")
    args = ap.parse_args()

    from uce_tpu.diffusion.pipeline import SDPipeline
    from uce_tpu.utils.imaging import save_png

    pipe = SDPipeline.from_pretrained(args.model_id)
    prompts = [args.erased_prompt, args.preserved_prompt]
    kwargs = dict(num_inference_steps=args.num_inference_steps,
                  guidance_scale=args.guidance_scale,
                  height=args.image_size, width=args.image_size,
                  seed=args.seed)

    os.makedirs(args.out_dir, exist_ok=True)
    before = pipe(prompts, **kwargs)
    save_png(before[0], os.path.join(args.out_dir, "erased_before.png"))
    save_png(before[1], os.path.join(args.out_dir, "preserved_before.png"))

    # Apply the edit overlay (reference notebook cell 5) and re-render with
    # the same seed: the erased prompt should change, the preserved one
    # should stay close.
    pipe.load_uce_edits(args.uce_model_path)
    after = pipe(prompts, **kwargs)
    save_png(after[0], os.path.join(args.out_dir, "erased_after.png"))
    save_png(after[1], os.path.join(args.out_dir, "preserved_after.png"))
    print(f"wrote 4 images to {args.out_dir}/")


if __name__ == "__main__":
    main()
