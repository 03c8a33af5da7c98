"""Comparison-baseline generators: concept-algebra, debias-VL, SLD.

CLI surfaces mirror ``evalscripts/concept_algebra.py``,
``evalscripts/debiasing_vl.py`` and ``evalscripts/sld-generate-images.py``
(including SLD's folder naming ``SLD_{type}_{concept}`` and its hard-coded
case filter, exposed as an optional ``--cases`` flag instead of a constant).
All three ride the same fused-scan pipeline with a different guidance mode.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from uce_tpu.diffusion.guidance import (
    DEBIAS_VL_DEFAULT_PROFESSIONS,
    SLDConfig,
    build_gender_pairs,
    debias_vl_calibration,
)
from uce_tpu.utils.imaging import save_case_images


def _iter_cases(prompts_path, from_case, till_case, cases=None):
    df = pd.read_csv(prompts_path)
    for _, row in df.iterrows():
        case = row.case_number
        if cases is not None and int(case) not in cases:
            continue
        if not (from_case <= case <= till_case):
            continue
        yield row


def generate_concept_algebra(
    pipe, prompts_path, concepts_to_project, save_path, model_name="original",
    guidance_scale=7.5, image_size=512, ddim_steps=100, num_samples=10,
    from_case=0, till_case=1_000_000,
) -> int:
    folder = os.path.join(
        save_path, model_name.replace("diffusers-", "").replace(".pt", ""))
    os.makedirs(folder, exist_ok=True)
    n = 0
    for row in _iter_cases(prompts_path, from_case, till_case):
        images = pipe(
            str(row.prompt), num_inference_steps=ddim_steps,
            guidance_scale=guidance_scale,
            num_images_per_prompt=num_samples,
            seed=int(row.evaluation_seed),
            height=image_size, width=image_size,
            scheduler="lms",  # reference uses LMSDiscrete (:24)
            mode="concept_algebra", concepts_to_project=concepts_to_project,
        )
        save_case_images(images, folder, row.case_number)
        n += 1
    return n


def generate_debias_vl(
    pipe, prompts_path, debias_concepts, save_path, model_name="original",
    guidance_scale=7.5, image_size=512, ddim_steps=100, num_samples=10,
    from_case=0, till_case=1_000_000, lam=500.0,
) -> int:
    """Calibration projection built from the pipeline's own text encoder
    (eos-position embeddings, normalized — debiasing_vl.py:69-79)."""
    import jax.numpy as jnp

    from uce_tpu.edit.embeddings import tokenize_batch
    from uce_tpu.models import clip_text

    if getattr(pipe, "is_sdxl", False):
        # the calibration projection is built from encoder-1 (768-dim);
        # applying it to the 2048-dim dual-encoder context would fail with
        # an obscure shape error deep in the denoise loop
        raise ValueError(
            "debias-vl supports SD 1.x/2.x pipelines only (the reference "
            "implementation is single-encoder, debiasing_vl.py:69-79); "
            "got an SDXL pipeline")
    prompts, pairs = build_gender_pairs(debias_concepts)
    ids, _ = tokenize_batch(pipe.tokenizer, prompts,
                            pipe.text_config.max_position_embeddings)
    last_hidden, _, _ = clip_text.encode_tokens(
        pipe.text_params, jnp.asarray(ids), pipe.text_config)
    eos_idx = np.asarray(ids).argmax(-1)
    embeds = np.asarray(last_hidden)[np.arange(len(prompts)), eos_idx]
    embeds = embeds / np.linalg.norm(embeds, axis=-1, keepdims=True)
    proj = debias_vl_calibration(embeds, pairs, lam)

    folder = os.path.join(
        save_path, model_name.replace("diffusers-", "").replace(".pt", ""))
    os.makedirs(folder, exist_ok=True)
    n = 0
    for row in _iter_cases(prompts_path, from_case, till_case):
        images = pipe(
            str(row.prompt), num_inference_steps=ddim_steps,
            guidance_scale=guidance_scale,
            num_images_per_prompt=num_samples,
            seed=int(row.evaluation_seed),
            height=image_size, width=image_size,
            scheduler="lms",
            mode="debias_vl", debias_projection=proj,
        )
        save_case_images(images, folder, row.case_number)
        n += 1
    return n


def generate_sld(
    pipe, prompts_path, save_path, sld_concept=None, sld_type="Medium",
    guidance_scale=7.5, image_size=512, ddim_steps=50, num_samples=1,
    from_case=0, till_case=1_000_000, cases=None,
) -> int:
    folder = os.path.join(save_path, f"SLD_{sld_type}_{sld_concept}")
    os.makedirs(folder, exist_ok=True)
    cfg = SLDConfig.preset(sld_type)
    n = 0
    for row in _iter_cases(prompts_path, from_case, till_case, cases):
        images = pipe(
            str(row.prompt), num_inference_steps=ddim_steps,
            guidance_scale=guidance_scale,
            num_images_per_prompt=num_samples,
            seed=int(row.evaluation_seed),
            height=image_size, width=image_size,
            mode="sld", safety_concept=sld_concept, sld_config=cfg,
        )
        save_case_images(images, folder, row.case_number)
        n += 1
    return n


# ---------------------------------------------------------------- CLI

def _common_flags(p, default_steps):
    p.add_argument("--model_name", type=str, required=True,
                   help="local HF snapshot directory")
    p.add_argument("--prompts_path", type=str, required=True)
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--device", type=str, default=None)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--ddim_steps", type=int, default=default_steps)
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--from_case", type=int, default=0)
    p.add_argument("--till_case", type=int, default=1_000_000)
    p.add_argument("--dtype", choices=["bfloat16", "float32"],
                   default="bfloat16")


def _make_pipe(args):
    from uce_tpu.cli.main import apply_device_flag

    apply_device_flag(args.device)
    import jax.numpy as jnp

    from uce_tpu.diffusion.pipeline import SDPipeline

    dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]
    return SDPipeline.from_pretrained(args.model_name, dtype=dt)


def register_cli(sub) -> None:
    p = sub.add_parser("concept-algebra",
                       help="score-space projection baseline generator")
    _common_flags(p, 100)
    p.add_argument("--concepts_to_project", type=str,
                   default="a man,a woman,a person")
    p.set_defaults(func=_cmd_ca)

    p = sub.add_parser("debias-vl",
                       help="prompt-embedding calibration baseline generator")
    _common_flags(p, 100)
    p.add_argument("--debias_concepts", type=str, default="")
    p.set_defaults(func=_cmd_dvl)

    p = sub.add_parser("sld-generate",
                       help="Safe Latent Diffusion baseline generator")
    _common_flags(p, 50)
    p.add_argument("--sld_concept", type=str, default=None)
    p.add_argument("--sld_type", choices=["Weak", "Medium", "Max"],
                   default="Medium")
    p.add_argument("--cases", type=int, nargs="*", default=None,
                   help="restrict to these case numbers (the reference "
                        "hard-codes [0, 38, 51])")
    p.set_defaults(func=_cmd_sld)


def _cmd_ca(args) -> int:
    concepts = [c.strip() for c in args.concepts_to_project.split(",")]
    if len(concepts) != 3:
        raise SystemExit("Error: Must provide 3 comma-separated concepts")
    pipe = _make_pipe(args)
    n = generate_concept_algebra(
        pipe, args.prompts_path, concepts, args.save_path,
        model_name=os.path.basename(args.model_name.rstrip("/")),
        guidance_scale=args.guidance_scale, image_size=args.image_size,
        ddim_steps=args.ddim_steps, num_samples=args.num_samples,
        from_case=args.from_case, till_case=args.till_case)
    print(f"generated {n} cases")
    return 0


def _cmd_dvl(args) -> int:
    concepts = [c.strip() for c in args.debias_concepts.split(",")]
    if concepts == [""]:
        print("Using default train list")
        concepts = DEBIAS_VL_DEFAULT_PROFESSIONS
    pipe = _make_pipe(args)
    n = generate_debias_vl(
        pipe, args.prompts_path, concepts, args.save_path,
        model_name=os.path.basename(args.model_name.rstrip("/")),
        guidance_scale=args.guidance_scale, image_size=args.image_size,
        ddim_steps=args.ddim_steps, num_samples=args.num_samples,
        from_case=args.from_case, till_case=args.till_case)
    print(f"generated {n} cases")
    return 0


def _cmd_sld(args) -> int:
    pipe = _make_pipe(args)
    n = generate_sld(
        pipe, args.prompts_path, args.save_path,
        sld_concept=args.sld_concept, sld_type=args.sld_type,
        guidance_scale=args.guidance_scale, image_size=args.image_size,
        ddim_steps=args.ddim_steps, num_samples=args.num_samples,
        from_case=args.from_case, till_case=args.till_case,
        cases=args.cases)
    print(f"generated {n} cases")
    return 0
