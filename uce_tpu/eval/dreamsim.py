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


def load_dreamsim_jax(weights_path: str):
    """JAX DreamSim distance from a converted local checkpoint.

    ``weights_path`` is a safetensors file produced by
    ``tools/convert_dreamsim.py`` (run once in an environment that has the
    ``dreamsim`` package): per-backbone timm-format ViT tensors under
    ``<model>/<key>`` with header metadata ``models`` (comma list) and
    per-model ``<model>.num_heads`` / ``<model>.mean`` / ``<model>.std``.

    Protocol (dreamsim PerceptualModel, feat_type=cls — the ensemble the
    reference's ``dreamsim_eval.py:36`` loads): per-backbone CLS embedding
    on its own normalization, L2-normalized, concatenated; distance =
    1 - cosine similarity.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from safetensors import safe_open

    from uce_tpu.models.vision_backbones import (
        convert_vit_timm,
        vit_cls_embed,
    )

    tensors: dict = {}
    with safe_open(weights_path, framework="np") as f:
        meta = f.metadata() or {}
        for k in f.keys():
            tensors[k] = f.get_tensor(k)
    models = [m for m in meta.get("models", "").split(",") if m]
    if not models:
        raise ValueError(
            f"{weights_path} has no 'models' metadata — produce it with "
            "tools/convert_dreamsim.py")
    backbones = []
    for m in models:
        sd = {k[len(m) + 1:]: v for k, v in tensors.items()
              if k.startswith(m + "/")}
        params = convert_vit_timm(sd)
        heads = int(meta[f"{m}.num_heads"])
        mean = np.asarray([float(v) for v in meta[f"{m}.mean"].split(",")],
                          np.float32)
        std = np.asarray([float(v) for v in meta[f"{m}.std"].split(",")],
                         np.float32)
        backbones.append((params, heads, mean, std))

    # jit one embed per backbone (distinct head counts/param trees).
    # params are ARGUMENTS, not closure constants: baking an 86M-param
    # ViT into the HLO makes the remote compile request ~350 MB, which
    # the axon compile service rejects outright (HTTP 413 — r5 find)
    embed_fns = []
    for (params, heads, mean, std) in backbones:
        def make(heads=heads, mean=mean, std=std):
            @jax.jit
            def f(p, pixel01):
                x = (pixel01 - mean) / std
                e = vit_cls_embed(p, x, heads)
                return e / jnp.linalg.norm(e, axis=-1, keepdims=True)
            return f
        embed_fns.append((make(), params))

    def embed(img01):
        return jnp.concatenate([f(p, img01) for f, p in embed_fns],
                               axis=-1)

    def distance_fn(a, b):
        """a, b: [-1, 1] NHWC numpy batches (the eval_folders contract)."""
        ea = embed(jnp.asarray((a + 1) / 2, jnp.float32))
        eb = embed(jnp.asarray((b + 1) / 2, jnp.float32))
        ea = ea / jnp.linalg.norm(ea, axis=-1, keepdims=True)
        eb = eb / jnp.linalg.norm(eb, axis=-1, keepdims=True)
        return np.asarray(1.0 - (ea * eb).sum(-1))

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
    p.add_argument("--jax_weights", type=str, default=None,
                   help="converted DreamSim ensemble safetensors "
                        "(tools/convert_dreamsim.py) — runs the JAX ViT "
                        "backbones instead of the torch 'dreamsim' pkg")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--device", type=str, default=None)
    p.set_defaults(func=_cmd)


def _cmd(args) -> int:
    from uce_tpu.cli.main import apply_device_flag

    apply_device_flag(getattr(args, "device", None))
    if args.jax_weights:
        distance_fn = load_dreamsim_jax(args.jax_weights)
    else:
        distance_fn = load_dreamsim_distance(args.cache_dir)
    save_path = args.save_path or (
        args.edited_path.rstrip("/") + "_dreamloss.csv")
    df = eval_folders(distance_fn, args.original_path, args.edited_path,
                      prompts_path=args.prompts_path, save_path=save_path,
                      image_size=args.image_size)
    print(f"wrote {save_path} ({len(df)} cases)")
    return 0
