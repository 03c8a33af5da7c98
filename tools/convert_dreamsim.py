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
    """State dict of the extractor's ViT with LoRA adapters merged.

    dreamsim versions differ in WHERE peft wraps the model (the whole
    PerceptualModel, the extractor, or the inner ViT), so probe every
    level for ``merge_and_unload``; afterwards HARD-FAIL if any LoRA
    key survived — silently exporting un-merged base weights would
    produce an ensemble that loads fine but computes non-DreamSim
    distances."""
    model = extractor.model
    for candidate in (model, extractor):
        merge = getattr(candidate, "merge_and_unload", None)
        if callable(merge):
            model = merge()
            break
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    # peft prefixes merged models with base_model.model.
    sd = {k.removeprefix("base_model.model."): v for k, v in sd.items()}
    leftovers = [k for k in sd if "lora_" in k]
    if leftovers:
        raise SystemExit(
            f"un-merged LoRA adapters in the checkpoint ({leftovers[:3]}"
            " ...): this dreamsim version wraps peft at a level this tool "
            "does not handle — merge_and_unload the PerceptualModel "
            "before export")
    return sd


def _probe_num_heads(extractor, sd):
    """Number of attention heads for the extractor's ViT.

    Probe every module for a ``num_heads``/``nhead`` attribute (timm
    and open_clip both carry one on the attention block); fall back to
    embed_dim // 64 (the universal ViT head size) derived from the
    patch-embedding weight rather than a hard-coded 12."""
    import torch.nn as nn

    root = extractor.model
    if isinstance(root, nn.Module):
        for mod in root.modules():
            for attr in ("num_heads", "nhead"):
                heads = getattr(mod, attr, None)
                if isinstance(heads, int) and heads > 0:
                    return heads
    for key, v in sd.items():
        if key.endswith("patch_embed.proj.weight"):
            return max(1, v.shape[0] // 64)
    raise SystemExit(
        f"cannot determine num_heads for {type(extractor).__name__}: "
        "no module exposes num_heads/nhead and no patch_embed weight "
        "found — pass the value explicitly by editing the metadata")


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
    if callable(getattr(model, "merge_and_unload", None)):
        # some dreamsim versions peft-wrap the whole PerceptualModel
        model = model.merge_and_unload()
    tensors, meta = {}, {}
    names = []
    for extractor in model.extractor_list:
        name = extractor.model_type if hasattr(extractor, "model_type") \
            else type(extractor).__name__
        names.append(name)
        sd = _merged_state_dict(extractor)
        for k, v in sd.items():
            tensors[f"{name}/{k}"] = np.asarray(v)
        meta[f"{name}.num_heads"] = str(_probe_num_heads(extractor, sd))
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
