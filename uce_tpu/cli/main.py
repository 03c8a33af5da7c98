"""Unified CLI: one entry point with subcommands mirroring the reference
scripts' argparse surfaces (flag names, defaults, ';'-separated lists,
'true'/'false' booleans — see SURVEY.md §5 "Config / flag system").

  uce edit-sd       <- trainscripts/uce_sd_erase.py
  uce debias-sd     <- trainscripts/uce_sd_debias.py
  uce edit-flux     <- trainscripts/uce_flux_edit.py
  uce edit-hidream  <- trainscripts/uce_hidream_edit.py
  uce generate      <- evalscripts/generate-images-sd.py
  uce eval-*        <- evalscripts/*

``--model_id`` must be a local HF snapshot directory (this environment has
no network egress; point it at a downloaded model).
"""

from __future__ import annotations

import argparse
import sys

from uce_tpu.utils.prompts import resolve_edit_request


def _add_common_edit_flags(p: argparse.ArgumentParser, default_model: str):
    p.add_argument("--edit_concepts", type=str, required=True,
                   help="concepts to erase, separated by ;")
    p.add_argument("--guide_concepts", type=str, default=None,
                   help="concepts to guide the erased concepts towards, ;-separated")
    p.add_argument("--preserve_concepts", type=str, default=None,
                   help="concepts to preserve, ;-separated")
    p.add_argument("--concept_type", choices=["art", "object"], required=True)
    p.add_argument("--model_id", type=str, default=default_model,
                   help="local HF snapshot directory of the model")
    p.add_argument("--device", type=str, default=None,
                   help="'cpu' or 'tpu' to pin the JAX platform; CUDA-style "
                        "strings (reference-CLI compatibility) are ignored "
                        "with a note")
    p.add_argument("--erase_scale", type=float, default=1.0)
    p.add_argument("--preserve_scale", type=float, default=1.0)
    p.add_argument("--lamb", type=float, default=0.5)
    p.add_argument("--expand_prompts", choices=["true", "false"], default="false")
    p.add_argument("--save_dir", type=str, default="../uce_models")
    p.add_argument("--exp_name", type=str, default="uce_test")
    p.add_argument("--method", choices=["collapsed", "general", "pallas"],
                   default="collapsed",
                   help="collapsed: single edit-matrix via XLA Cholesky; "
                        "general: per-layer batched solve; pallas: fused "
                        "Newton-Schulz kernel + XLA refinement")
    p.add_argument("--apply_on", choices=["device", "host"],
                   default="device",
                   help="where the stacked W@E multiply runs; 'host' avoids "
                        "weight round-trips on slow host<->device links")


def apply_device_flag(device: str | None) -> None:
    """Pin the JAX platform before any backend initialization.

    Falls back to the ``UCE_DEVICE`` env var when no ``--device`` flag is
    given, so whole-script drives (tools/real_smoke.sh and its CI
    plumbing test) can pin every CLI subprocess without threading the
    flag through each invocation. The axon plugin ignores
    ``JAX_PLATFORMS``, hence the config-API route."""
    if device is None:
        import os

        device = os.environ.get("UCE_DEVICE") or None
    if device is None:
        return
    if device in ("cpu", "tpu"):
        import jax

        jax.config.update("jax_platforms", device)
    else:
        print(f"note: --device '{device}' has no meaning on this backend; "
              "JAX manages device placement (use 'cpu' or 'tpu' to pin).")


def cmd_edit_sd(args) -> int:
    apply_device_flag(args.device)
    from uce_tpu.edit import sd as edit_sd

    edits, guides, preserves = resolve_edit_request(
        args.edit_concepts, args.guide_concepts, args.preserve_concepts,
        args.concept_type, args.expand_prompts == "true",
    )
    print(f"\n\nErasing: {edits}\n")
    print(f"Guiding: {guides}\n")
    print(f"Preserving: {preserves}\n")
    res = edit_sd.load_resources(args.model_id, family=args.family)
    edit_sd.run_erase(
        res, edits, guides, preserves,
        erase_scale=args.erase_scale, preserve_scale=args.preserve_scale,
        lamb=args.lamb, save_dir=args.save_dir, exp_name=args.exp_name,
        method=args.method, apply_on=args.apply_on,
    )
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="uce",
        description="TPU-native Unified Concept Editing (JAX/XLA/Pallas)",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("edit-sd", help="closed-form erase for SD v1.x/v2.x")
    _add_common_edit_flags(p, "CompVis/stable-diffusion-v1-4")
    p.set_defaults(func=cmd_edit_sd, family="sd")

    p = sub.add_parser("edit-sdxl", help="closed-form erase for SDXL")
    _add_common_edit_flags(p, "stabilityai/stable-diffusion-xl-base-1.0")
    p.set_defaults(func=cmd_edit_sd, family="sdxl")

    # Further subcommands (debias-sd, edit-flux, edit-hidream, generate,
    # eval-*) are registered by their modules as they land.
    from uce_tpu.cli import extra  # noqa: F401

    extra.register(sub)
    return parser


def main(argv=None) -> int:
    from uce_tpu.utils import compile_cache

    compile_cache.enable()  # repeat invocations skip the remote recompile
    parser = build_parser()
    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
