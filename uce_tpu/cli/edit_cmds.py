"""edit-flux / edit-hidream subcommands (reference trainscript CLIs)."""

from __future__ import annotations

from uce_tpu.utils.prompts import resolve_edit_request


def register_cli(sub) -> None:
    from uce_tpu.cli.main import _add_common_edit_flags

    p = sub.add_parser("edit-flux",
                       help="closed-form edit for FLUX.1 (dev/schnell)")
    _add_common_edit_flags(p, "black-forest-labs/FLUX.1-schnell")
    p.add_argument("--max_sequence_length", type=int, default=None,
                   help="default: 256 for schnell, 512 otherwise")
    p.set_defaults(func=_cmd_flux)

    p = sub.add_parser("edit-hidream",
                       help="closed-form edit for HiDream-I1")
    _add_common_edit_flags(p, "HiDream-ai/HiDream-I1-Full")
    p.add_argument("--llama_dir", type=str, default=None,
                   help="local snapshot of Meta-Llama-3.1-8B-Instruct")
    p.add_argument("--max_sequence_length", type=int, default=128)
    p.set_defaults(func=_cmd_hidream)


def _reject_sd_only_flags(args, family: str) -> None:
    """--method/--apply_on come from the shared flag set but only the
    SD/SDXL path implements them; an explicitly requested non-default must
    error, not be silently dropped."""
    if args.method != "collapsed":
        raise SystemExit(
            f"--method {args.method} is not supported for {family} edits "
            "(the per-stream solve always uses the collapsed XLA path)")
    if args.apply_on != "device":
        raise SystemExit(
            f"--apply_on {args.apply_on} is not supported for {family} "
            "edits")


def _resolve(args):
    edits, guides, preserves = resolve_edit_request(
        args.edit_concepts, args.guide_concepts, args.preserve_concepts,
        args.concept_type, args.expand_prompts == "true",
    )
    print(f"\n\nErasing: {edits}\n")
    print(f"Guiding: {guides}\n")
    print(f"Preserving: {preserves}\n")
    return edits, guides, preserves


def _cmd_flux(args) -> int:
    from uce_tpu.cli.main import apply_device_flag

    apply_device_flag(args.device)
    from uce_tpu.edit import flux as edit_flux

    _reject_sd_only_flags(args, "FLUX")
    edits, guides, preserves = _resolve(args)
    res = edit_flux.load_resources(args.model_id, args.max_sequence_length)
    edit_flux.run_erase(
        res, edits, guides, preserves,
        erase_scale=args.erase_scale, preserve_scale=args.preserve_scale,
        lamb=args.lamb, save_dir=args.save_dir, exp_name=args.exp_name)
    return 0


def _cmd_hidream(args) -> int:
    from uce_tpu.cli.main import apply_device_flag

    apply_device_flag(args.device)
    from uce_tpu.edit import hidream as edit_hd

    _reject_sd_only_flags(args, "HiDream")
    edits, guides, preserves = _resolve(args)
    res = edit_hd.load_resources(args.model_id, args.llama_dir,
                                 args.max_sequence_length)
    edit_hd.run_erase(
        res, edits, guides, preserves,
        erase_scale=args.erase_scale, preserve_scale=args.preserve_scale,
        lamb=args.lamb, save_dir=args.save_dir, exp_name=args.exp_name)
    return 0
