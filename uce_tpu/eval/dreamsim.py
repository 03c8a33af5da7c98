"""DreamSim perceptual distance — evalscripts/dreamsim_eval.py.

Same pairing protocol as LPIPS (shared via ``lpips.eval_folders``), writing
``{folder}_dreamloss.csv``. The DreamSim model itself (a LoRA-tuned ViT
ensemble) is loaded through the ``dreamsim`` package when available; any
callable ``distance_fn(a, b) -> [B]`` can be injected for testing or for a
JAX re-implementation.
"""

from __future__ import annotations


def load_dreamsim_distance(cache_dir: str | None = None, device: str = "cpu"):
    """Returns distance_fn(a, b) over [-1,1] NHWC numpy batches."""
    try:
        from dreamsim import dreamsim as load_dreamsim
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "the 'dreamsim' package is not installed in this environment; "
            "pass an injectable distance_fn or install dreamsim locally"
        ) from e
    import numpy as np
    import torch

    model, _ = load_dreamsim(pretrained=True, device=device,
                             cache_dir=cache_dir)

    def distance_fn(a, b):
        ta = torch.tensor(np.transpose((a + 1) / 2, (0, 3, 1, 2)))
        tb = torch.tensor(np.transpose((b + 1) / 2, (0, 3, 1, 2)))
        with torch.no_grad():
            return model(ta, tb).cpu().numpy()

    return distance_fn


def eval_folders(distance_fn, original_path, edited_path,
                 prompts_path=None, save_path=None, image_size=224):
    from uce_tpu.eval.lpips import eval_folders as shared

    return shared(None, original_path, edited_path,
                  prompts_path=prompts_path, save_path=save_path,
                  image_size=image_size, distance_fn=distance_fn,
                  loss_column="dream_loss")


def register_cli(sub) -> None:
    p = sub.add_parser("eval-dreamsim",
                       help="DreamSim distance between original/edited folders")
    p.add_argument("--original_path", type=str, required=True)
    p.add_argument("--edited_path", type=str, required=True)
    p.add_argument("--prompts_path", type=str, default=None)
    p.add_argument("--save_path", type=str, default=None)
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--image_size", type=int, default=224)
    p.set_defaults(func=_cmd)


def _cmd(args) -> int:
    distance_fn = load_dreamsim_distance(args.cache_dir)
    save_path = args.save_path or (
        args.edited_path.rstrip("/") + "_dreamloss.csv")
    df = eval_folders(distance_fn, args.original_path, args.edited_path,
                      prompts_path=args.prompts_path, save_path=save_path,
                      image_size=args.image_size)
    print(f"wrote {save_path} ({len(df)} cases)")
    return 0
