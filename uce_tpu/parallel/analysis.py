"""Quantify multi-chip layouts: per-device bytes, collective traffic, and
an analytic TP speedup model.

The reference is single-device (SURVEY.md §2.4), so there is nothing to
match here — this module exists so the repo's TP claims are *measured or
modeled*, not asserted: ``shard_*_params`` layouts are checked for actual
per-device memory reduction, compiled programs are parsed for the
collective bytes XLA inserted, and the expected speedup of scaling a step
over the 'model' axis is computed from first principles (compute shrinks
by n, one all-reduce per row-parallel matmul rides ICI).
"""

from __future__ import annotations

import dataclasses
import math
import re

import jax
import numpy as np

# bytes per element for HLO dtype literals
_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16, "f8e4m3fn": 1, "f8e5m2": 1,
}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")

# one shape literal, e.g. bf16[2,256,3072]
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def leaf_device_bytes(leaf) -> int:
    """Bytes ONE device holds for this (possibly sharded) array."""
    shape = tuple(leaf.shape)
    itemsize = np.dtype(leaf.dtype).itemsize
    sharding = getattr(leaf, "sharding", None)
    if sharding is not None:
        shape = sharding.shard_shape(shape)
    return math.prod(shape) * itemsize if shape else itemsize


def tree_device_bytes(tree) -> int:
    """Per-device bytes of a parameter tree under its current shardings."""
    return sum(leaf_device_bytes(l) for l in jax.tree_util.tree_leaves(tree))


def tree_total_bytes(tree) -> int:
    """Logical (unsharded) bytes of a parameter tree."""
    return sum(
        math.prod(l.shape) * np.dtype(l.dtype).itemsize if l.shape
        else np.dtype(l.dtype).itemsize
        for l in jax.tree_util.tree_leaves(tree))


def _shape_bytes(dtype: str, dims: str) -> int:
    n = math.prod(int(d) for d in dims.split(",") if d) if dims else 1
    return n * _DTYPE_BYTES.get(dtype, 4)


def collective_stats(hlo_text: str) -> dict:
    """Parse optimized HLO for collective ops and their payload bytes.

    Returns ``{kind: {"count": int, "bytes": int}}`` where bytes are the
    LOGICAL output bytes of each collective instruction (the result every
    participant ends up holding). ``lax.scan`` bodies appear once in the
    HLO but execute trip-count times; use ``scan_multiplier`` on the
    caller side for totals (see ``scaled``)."""
    stats: dict[str, dict] = {}
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.search(
            r"=\s*(\([^)]*\)|\w+\[[\d,]*\]\S*)\s+(%?)(" +
            "|".join(_COLLECTIVES) + r")(-start|-done)?\b", line)
        if not m:
            continue
        if m.group(4) == "-start":
            # async pairs are counted at -done: the -start op's output
            # tuple carries the operand alias NEXT TO the result, so
            # summing its elements would overcount; the -done output is
            # exactly the result every participant holds
            continue
        out = m.group(1)
        nbytes = sum(_shape_bytes(d, dims)
                     for d, dims in _SHAPE_RE.findall(out))
        kind = m.group(3)
        s = stats.setdefault(kind, {"count": 0, "bytes": 0})
        s["count"] += 1
        s["bytes"] += nbytes
    return stats


def compiled_collective_stats(fn, *args, **kwargs) -> dict:
    """Lower+compile ``fn(*args)`` and return its collective_stats."""
    compiled = jax.jit(fn, **kwargs).lower(*args).compile()
    return collective_stats(compiled.as_text())


@dataclasses.dataclass(frozen=True)
class TPModel:
    """Analytic model-parallel (TP) step-time model.

    Assumptions (documented, overridable):
      * compute scales 1/n over the 'model' ring (column/row-parallel
        matmuls keep per-device tiles large enough to hold the realized
        matmul rate — true for FLUX's 3072-wide layers down to n=8);
      * each row-parallel matmul ends in one bf16 all-reduce of its
        activation; ring all-reduce moves ``2 (n-1)/n x bytes`` over the
        slowest link, both directions of the ring usable;
      * compute and ICI are NOT overlapped (worst case — XLA does overlap
        async collectives when it can, so real steps land at or below
        this bound... as long as per-op sizes stay above the dispatch
        floor).

    v5e defaults: 45 GB/s one-way per ICI link (2D torus, 2 usable ring
    directions per axis -> 90 GB/s ring bandwidth), 157 TFLOP/s realized
    bf16 matmul rate (docs/PERF.md chip characteristics).
    """

    flops_per_step: float
    allreduce_bytes_per_step: float
    compute_rate: float = 157e12
    ring_bw: float = 2 * 45e9
    dispatch_floor_s: float = 0.0015  # ~1.5 ms per-op floor (PERF.md)

    def step_time(self, n_model: int) -> float:
        compute = self.flops_per_step / (n_model * self.compute_rate)
        if n_model == 1:
            return compute
        comm = (self.allreduce_bytes_per_step * 2 * (n_model - 1)
                / n_model / self.ring_bw)
        return compute + comm

    def speedup(self, n_model: int) -> float:
        return self.step_time(1) / self.step_time(n_model)

    def comm_fraction(self, n_model: int) -> float:
        t = self.step_time(n_model)
        return 1.0 - (self.flops_per_step
                      / (n_model * self.compute_rate)) / t


def flux_full_tp_model(height: int = 1024, width: int = 1024,
                       text_seq: int = 512) -> TPModel:
    """The 'multi-chip territory' claim, quantified: full 12B FLUX.1-dev.

    Token count: latents are H/8 x W/8, patchified 2x2 -> (H/16)(W/16)
    image tokens + T5 text tokens. Matmul FLOPs ~= 2 x params_active x
    tokens (attention einsums add ~6% at these seq lengths; absorbed into
    the params term's conservatism). All-reduce bytes per step: one bf16
    activation all-reduce per row-parallel matmul (shard_flux_params
    layout) — per double block, attention-out + FFN-down on EACH stream
    covers every token twice; per single block, one fused proj_out covers
    every token once.
    """
    img_tokens = (height // 16) * (width // 16)
    tokens = img_tokens + text_seq
    params = 11.9e9  # transformer only (guidance/dev variant)
    flops = 2.0 * params * tokens
    hidden = 3072
    token_ar_units = 19 * 2 + 38 * 1  # [tokens, hidden] all-reduces
    ar_bytes = token_ar_units * tokens * hidden * 2  # bf16
    return TPModel(flops_per_step=flops,
                   allreduce_bytes_per_step=float(ar_bytes))
