"""Param-tree quantization pass: bf16/fp32 weights -> W8A8 int8 dicts.

Walks a nested param pytree (diffusers-keyed, as produced by
``unet.nest_state_dict``) and replaces eligible ``weight`` leaves with
``{"qint8": ..., "scale": ...}`` dicts that ``layers.conv2d``/``linear``
dispatch on.  Eligible = any >=2-D weight whose module path does not
contain a skip token.

Default skips keep quality-critical ends of the network in bf16:
  * ``conv_in`` / ``conv_out``   (first/last convs; tiny FLOP share)
  * ``time_emb`` / ``time_embedding`` / ``add_embedding`` (conditioning)
  * ``norm``                     (1-D scales anyway)
The reference has no quantization (bf16 torch end-to-end,
``evalscripts/generate-images-sd.py:76``); this is a TPU deployment
feature, exercised by ``bench.py --quantize`` and
``tools/trace_prof.py --quantize``. It is NOT the serving default: measured int8
throughput on this part loses to bf16 at SD shapes (docs/PERF.md).
"""

from __future__ import annotations

from typing import Iterable

import jax.numpy as jnp

from uce_tpu.ops import quant

UNET_SKIP = ("conv_in", "conv_out", "time_emb", "add_embedding", "norm")
VAE_SKIP = ("conv_in", "conv_out", "norm", "quant_conv")
# FLUX DiT weight-only skips: the tiny entry/exit/conditioning projections
# (x_embedder, final proj_out + its adaLN, time/text MLPs), and the
# context_embedder — a UCE edit target (uce_flux_edit.py:25-28), kept
# float so edit overlays apply exactly (time_text_embed covers the other
# target, text_embedder.linear_1). AdaLN modulation linears ARE
# quantized: they are ~27% of the 12 B params, and per-output-channel
# weight-only error (~0.4% relative) is below bf16 activation noise.
# A tuple entry is a root-anchored path prefix (distinguishes the final
# ("proj_out",) from the single-block proj_out projections).
FLUX_SKIP = ("x_embedder", "context_embedder", "time_text_embed",
             "norm_out", ("proj_out",))
# HiDream-I1 MoE DiT skips: entry/exit/conditioning, the MoE router gate
# (tiny, routing-critical), and caption_projection — the UCE edit
# targets (uce_hidream_edit.py:32-35), kept float for exact overlays.
HIDREAM_SKIP = ("x_embedder", "t_embedder", "p_embedder",
                "caption_projection", "final_layer", "gate")
# Leaves under these keys are depth-STACKED [L, ...] (FLUX/HiDream DiTs);
# quantize with per-layer scales so one outlier layer cannot coarsen
# every other layer's scale. The SD UNet nests the SAME key name with a
# numeric per-layer index ("transformer_blocks"/"0"/...), so a key only
# counts as stacked when NOT followed by an index component.
STACKED_KEYS = ("transformer_blocks", "single_transformer_blocks",
                "double_stream_blocks", "single_stream_blocks")


def _is_stacked(path) -> bool:
    for i, k in enumerate(path):
        if k in STACKED_KEYS:
            nxt = path[i + 1] if i + 1 < len(path) else ""
            if not str(nxt).isdigit():
                return True
    return False


def _skipped(path, skip) -> bool:
    for tok in skip:
        if isinstance(tok, tuple):
            if path[: len(tok)] == tok:
                return True
        elif any(tok in p for p in path):
            return True
    return False


def quantize_params(params, skip: Iterable = UNET_SKIP,
                    mode: str = "int8"):
    """Return a copy of ``params`` with eligible weights int8-quantized.

    mode: ``"int8"`` = W8A8 (int8 MXU ops); ``"w8"`` = weight-only int8
    (bf16 arithmetic, int8 storage — the memory-capacity mode).
    skip: substrings matched against any path component, or tuples
    matched as root-anchored path prefixes.
    """
    if mode not in ("int8", "w8"):
        raise ValueError(f"unknown quantization mode {mode!r}")
    skip = tuple(skip)
    weight_only = mode == "w8"

    def quantize(leaf, path):
        if _is_stacked(path):
            # depth-stacked [L, ...] leaves: per-layer scales (and
            # per-expert for MoE [L, E, in, out] leaves); a stacked leaf
            # below 3-D is a per-layer 1-D scale (RMSNorm), not a matmul
            # weight — leave it float
            if leaf.ndim < 3:
                return leaf
            import jax

            fn = lambda w: quant.quantize_weight(w,  # noqa: E731
                                                 weight_only=weight_only)
            for _ in range(leaf.ndim - 2):
                fn = jax.vmap(fn)
            return fn(leaf)
        return quant.quantize_weight(leaf, weight_only=weight_only)

    def walk(node, path):
        if isinstance(node, dict):
            if quant.is_quantized(node) or quant.is_weight_only(node):
                return node
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if (
            path
            and path[-1] == "weight"
            and hasattr(node, "ndim")
            and node.ndim >= 2
            and not _skipped(path, skip)
            and jnp.issubdtype(node.dtype, jnp.floating)
        ):
            return quantize(node, path)
        return node

    return walk(params, ())


def count_quantized(params) -> tuple[int, int]:
    """(quantized leaves, total weight leaves) — for logging/tests."""
    nq = nw = 0

    def walk(node, path):
        nonlocal nq, nw
        if quant.is_quantized(node) or quant.is_weight_only(node):
            nq += 1
            nw += 1
            return
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
            return
        if path and path[-1] == "weight" and getattr(node, "ndim", 0) >= 2:
            nw += 1

    walk(params, ())
    return nq, nw
