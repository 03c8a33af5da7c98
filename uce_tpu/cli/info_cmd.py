"""`uce info`: environment diagnostics (devices, versions, native tier)."""

from __future__ import annotations


def register_cli(sub) -> None:
    p = sub.add_parser("info", help="environment and capability diagnostics")
    p.add_argument("--device", type=str, default=None)
    p.set_defaults(func=_cmd)


def _cmd(args) -> int:
    from uce_tpu.cli.main import apply_device_flag

    apply_device_flag(args.device)
    import jax

    import uce_tpu
    from uce_tpu.utils.native_png import native_available

    print(f"uce-tpu {uce_tpu.__version__}")
    print(f"jax {jax.__version__}  backend={jax.default_backend()}  "
          f"devices={len(jax.devices())}")
    for d in jax.devices()[:8]:
        print(f"  {d}")
    try:
        import transformers

        print(f"transformers {transformers.__version__} (tokenizers + "
              f"parity oracles)")
    except ImportError:
        print("transformers: absent (tokenizer loading unavailable)")
    try:
        import torch

        print(f"torch {torch.__version__} (fixed-seed RNG parity shim)")
    except ImportError:
        print("torch: absent (jax.random latent fallback, no torch parity)")
    print(f"native PNG writer: "
          f"{'available' if native_available() else 'unavailable (PIL path)'}")
    for pkg, converter in (("nudenet", "tools/convert_nudenet.py"),
                           ("dreamsim", "tools/convert_dreamsim.py")):
        try:
            __import__(pkg)
            print(f"{pkg}: available")
        except ImportError:
            # not gating: the JAX backbone runs without the torch pkg
            print(f"{pkg}: torch pkg absent — eval-{pkg} runs via "
                  f"--jax_weights (one-time convert: {converter})")
    return 0
