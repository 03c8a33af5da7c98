"""Convert a DreamSim checkpoint into the JAX loader's safetensors format.

Run ONCE in an environment that has the ``dreamsim`` package (absent from
this image AND from the reference's requirements.txt — the reference's
``evalscripts/dreamsim_eval.py:36`` assumes a researcher installed it):

    python tools/convert_dreamsim.py --cache_dir ~/.cache/dreamsim \\
        --out dreamsim_ensemble.safetensors

then evaluate anywhere with:

    uce eval-dreamsim --jax_weights dreamsim_ensemble.safetensors ...

What it does: loads ``dreamsim(pretrained=True)``, merges each backbone's
LoRA adapters into dense weights (``peft`` merge_and_unload when the
checkpoint is LoRA-wrapped), re-keys each ViT into the timm layout that
``uce_tpu.models.vision_backbones.convert_vit_timm`` consumes, and writes
one safetensors file with per-model prefixes plus normalization metadata.
"""

from __future__ import annotations

import argparse
import sys

# per-backbone preprocessing constants (dreamsim feature extractors)
_NORMS = {
    "dino": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "clip": ((0.48145466, 0.4578275, 0.40821073),
             (0.26862954, 0.26130258, 0.27577711)),
    "open_clip": ((0.48145466, 0.4578275, 0.40821073),
                  (0.26862954, 0.26130258, 0.27577711)),
}


def _merged_state_dict(extractor):
    model = extractor.model
    if hasattr(model, "merge_and_unload"):  # peft LoRA wrapper
        model = model.merge_and_unload()
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache_dir", type=str, default="./models")
    ap.add_argument("--out", type=str, default="dreamsim_ensemble.safetensors")
    ap.add_argument("--dreamsim_type", type=str, default="ensemble")
    args = ap.parse_args()

    try:
        from dreamsim import dreamsim as load_dreamsim
    except ImportError:
        print("the 'dreamsim' package is required for conversion; run this "
              "tool where it is installed (see docs/REAL_WEIGHTS.md)",
              file=sys.stderr)
        return 1
    import numpy as np
    from safetensors.numpy import save_file

    model, _ = load_dreamsim(pretrained=True, device="cpu",
                             cache_dir=args.cache_dir,
                             dreamsim_type=args.dreamsim_type)
    tensors, meta = {}, {}
    names = []
    for extractor in model.extractor_list:
        name = extractor.model_type if hasattr(extractor, "model_type") \
            else type(extractor).__name__
        names.append(name)
        sd = _merged_state_dict(extractor)
        for k, v in sd.items():
            tensors[f"{name}/{k}"] = np.asarray(v)
        heads = None
        for probe in ("num_heads", "nhead"):
            heads = heads or getattr(
                getattr(extractor.model, "blocks", [None])[0] and
                extractor.model.blocks[0].attn, probe, None)
        meta[f"{name}.num_heads"] = str(heads or 12)
        family = next((f for f in _NORMS if name.startswith(f)), "dino")
        mean, std = _NORMS[family]
        meta[f"{name}.mean"] = ",".join(str(v) for v in mean)
        meta[f"{name}.std"] = ",".join(str(v) for v in std)
    meta["models"] = ",".join(names)
    save_file(tensors, args.out, metadata=meta)
    print(f"wrote {args.out}: models={names}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
