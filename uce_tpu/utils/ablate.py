"""Ablation switch shared by the ops and models layers.

Lives in utils so ``ops/attention.py`` does not need an upward import of
``models/layers.py`` for a one-line env lookup.
"""

from __future__ import annotations

import os


def ablated(name: str) -> bool:
    """True when UCE_ABLATE (comma list: gn, ln, attn) disables this op.

    Read at trace time only — zero runtime cost. Used by ``bench.py
    --breakdown`` to attribute per-step cost to op families by measured
    ablation deltas (XLA fusion effects included), never in production.
    """
    return name in os.environ.get("UCE_ABLATE", "").split(",")
