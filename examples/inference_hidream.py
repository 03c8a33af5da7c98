"""Before/after UCE A/B demo for HiDream-I1 — the runnable equivalent of the
reference's ``notebooks/inference_hidream.ipynb`` (the notebook existed
upstream but its blob is absent from the reference snapshot,
``.MISSING_LARGE_BLOBS:1``; protocol reconstructed from
``trainscripts/uce_hidream_edit.py`` and the HiDream pipeline defaults:
50 steps, ``guidance_scale=5.0``, ``max_sequence_length=128``, same seed
before and after the caption-projection edit).

Usage:
    python examples/inference_hidream.py --model_id /path/to/hidream_snapshot \
        --llama_dir /path/to/llama31_snapshot \
        --uce_model_path uce_models/erased-hidream.safetensors \
        [--out_dir demo_hidream]
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_id", required=True,
                    help="local HF snapshot directory (HiDream-I1)")
    ap.add_argument("--llama_dir", default=None,
                    help="local Llama-3.1-8B-Instruct snapshot (defaults to "
                         "the snapshot's text_encoder_4)")
    ap.add_argument("--uce_model_path", required=True,
                    help="UCE safetensors artifact from `uce edit-hidream`")
    ap.add_argument("--erased_prompt",
                    default="a painting in the style of Van Gogh")
    ap.add_argument("--preserved_prompt",
                    default="a photo of a red sports car")
    ap.add_argument("--seed", type=int, default=2024)
    ap.add_argument("--num_inference_steps", type=int, default=50)
    ap.add_argument("--guidance_scale", type=float, default=5.0)
    ap.add_argument("--image_size", type=int, default=1024)
    ap.add_argument("--out_dir", default="demo_hidream")
    args = ap.parse_args()

    from uce_tpu.diffusion.pipeline_hidream import HiDreamPipeline
    from uce_tpu.utils.imaging import save_png

    pipe = HiDreamPipeline.from_pretrained(args.model_id,
                                           llama_dir=args.llama_dir)
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
