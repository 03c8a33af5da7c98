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


def quantize_params(params, skip: Iterable[str] = UNET_SKIP):
    """Return a copy of ``params`` with eligible weights int8-quantized."""
    skip = tuple(skip)

    def walk(node, path):
        if isinstance(node, dict):
            if quant.is_quantized(node):
                return node
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if (
            path
            and path[-1] == "weight"
            and hasattr(node, "ndim")
            and node.ndim >= 2
            and not any(tok in p for tok in skip for p in path)
            and jnp.issubdtype(node.dtype, jnp.floating)
        ):
            return quant.quantize_weight(node)
        return node

    return walk(params, ())


def count_quantized(params) -> tuple[int, int]:
    """(quantized leaves, total weight leaves) — for logging/tests."""
    nq = nw = 0

    def walk(node, path):
        nonlocal nq, nw
        if quant.is_quantized(node):
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
