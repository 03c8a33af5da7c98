"""Gatys VGG-19 Gram-matrix style/content loss — evalscripts/styleloss.py.

Sequential-conv naming matches the reference's model assembly
(``styleloss.py:113-170``): conv_1..conv_5 are the first five Conv2d layers
(with loss taps directly on conv outputs); content layer conv_4, style
layers conv_1..conv_5; weights style 1e6, content 1 (``:174``).
Per-case means -> ``{folder}_styleloss.csv``.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from uce_tpu.models.vision_backbones import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    vgg19_features,
)

STYLE_LAYERS = (0, 1, 2, 3, 4)  # conv_1..conv_5 (sequential numbering)
CONTENT_LAYER = 3  # conv_4
STYLE_WEIGHT = 1e6
CONTENT_WEIGHT = 1.0


def gram_matrix(feat: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] -> normalized Gram [B,C,C] (styleloss.py:49-60).

    The reference normalizes by a*b*c*d with a (batch) == 1 per image, i.e.
    by C*H*W per element — the batch axis here is vectorization over
    independent images and must NOT enter the normalizer, or batched eval
    would deflate every gram by the batch size.
    """
    b, h, w, c = feat.shape
    f = feat.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", f, f) / (h * w * c)


def style_content_loss(params: dict, image: jnp.ndarray,
                       style_ref: jnp.ndarray,
                       content_ref: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (style_loss, content_loss) per batch element."""
    taps_img = vgg19_features(params, image, num_convs=5)
    taps_style = vgg19_features(params, style_ref, num_convs=5)
    # The interference protocol passes the same original image as both
    # references — reuse the taps instead of a third VGG-19 forward.
    taps_content = (taps_style if content_ref is style_ref
                    else vgg19_features(params, content_ref, num_convs=5))

    style = 0.0
    for i in STYLE_LAYERS:
        g_img = gram_matrix(taps_img[i])
        g_ref = gram_matrix(taps_style[i])
        style = style + ((g_img - g_ref) ** 2).mean(axis=(1, 2))
    content = ((taps_img[CONTENT_LAYER] - taps_content[CONTENT_LAYER]) ** 2
               ).mean(axis=(1, 2, 3))
    return STYLE_WEIGHT * style, CONTENT_WEIGHT * content


def _batch_prep(size: int):
    """One jitted uint8->imagenet-normalized resize program per BATCH
    (same rationale as lpips._batch_prep: per-image dispatches + host
    round-trips dominate folder evals on slow links)."""

    @jax.jit
    def prep(raw):  # uint8 [N, H, W, 3]
        img = raw.astype(jnp.float32) / 255.0
        img = jax.vmap(lambda im: jax.image.resize(
            im, (size, size, 3), method="bilinear"))(img)
        return (img - IMAGENET_MEAN) / IMAGENET_STD

    return prep


def eval_folders(
    params: dict,
    original_path: str,
    edited_path: str,
    prompts_path: str | None = None,
    save_path: str | None = None,
    image_size: int = 512,
) -> pd.DataFrame:
    """Style/content loss of edited images against the originals (the
    original image serves as both style and content reference, matching
    the interference-measurement protocol). Rides lpips.eval_folders'
    shared pair-folder protocol (pair scan, per-case means, prompts-CSV
    merge) with an imagenet prep and a two-column metric; total_loss is
    exact as a post-sum since mean(s+c) == mean(s)+mean(c)."""
    from uce_tpu.eval.lpips import eval_folders as shared_eval

    # jitted with params as an ARG; the inner lambda passes ``ref`` once
    # so the style/content tap reuse (`content_ref is style_ref`) still
    # holds under tracing (r5: eager metric chains crawl on the tunnel)
    jit_sc = jax.jit(
        lambda p, img, ref: style_content_loss(p, img, ref, ref))
    df = shared_eval(
        None, original_path, edited_path, prompts_path=prompts_path,
        save_path=None, image_size=image_size,
        distance_fn=lambda ref, img: jit_sc(params, img, ref),
        loss_column=("style_loss", "content_loss"),
        prep_fn=_batch_prep(image_size), batch=8)
    df["total_loss"] = df["style_loss"] + df["content_loss"]
    if save_path:
        df.to_csv(save_path, index=False)
    return df


def load_vgg_weights(path: str) -> dict:
    from uce_tpu.models.vision_backbones import convert_vgg19

    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return convert_vgg19(load_file(path))
    import torch

    return convert_vgg19(torch.load(path, map_location="cpu",
                                    weights_only=True))


def register_cli(sub) -> None:
    p = sub.add_parser("eval-styleloss",
                       help="VGG19 Gram style/content loss between folders")
    p.add_argument("--original_path", type=str, required=True)
    p.add_argument("--edited_path", type=str, required=True)
    p.add_argument("--weights", type=str, required=True,
                   help="local VGG19 state dict (.pt/.safetensors)")
    p.add_argument("--prompts_path", type=str, default=None)
    p.add_argument("--save_path", type=str, default=None)
    p.add_argument("--image_size", type=int, default=512,
                   help="reference: 512 on GPU, 128 on CPU")
    p.add_argument("--device", type=str, default=None)
    p.set_defaults(func=_cmd)


def _cmd(args) -> int:
    from uce_tpu.cli.main import apply_device_flag

    apply_device_flag(args.device)
    params = load_vgg_weights(args.weights)
    save_path = args.save_path or (
        args.edited_path.rstrip("/") + "_styleloss.csv")
    df = eval_folders(params, args.original_path, args.edited_path,
                      prompts_path=args.prompts_path, save_path=save_path,
                      image_size=args.image_size)
    print(f"wrote {save_path} ({len(df)} cases)")
    return 0
