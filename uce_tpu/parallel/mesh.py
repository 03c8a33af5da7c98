"""Device mesh + sharding rules.

The reference is strictly single-device (``--device cuda:0`` everywhere,
SURVEY.md §2.4); the natural TPU scaling axes for UCE workloads are

  * ``data``  — prompts / images / debias samples (embarrassingly parallel:
    the generation fan-out of ``generate-images`` and the 10-image batches
    of the debias loop),
  * ``model`` — tensor parallelism over attention heads / hidden channels
    of the UNet/DiT for latency scaling.

Shardings are expressed with NamedSharding; XLA inserts the collectives
(all-gathers/psums ride ICI). No explicit NCCL-style code — pjit semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    if n_data * n_model != n:
        raise ValueError(f"{n_data}x{n_model} mesh != {n} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def mesh_from_spec(spec: str, devices=None) -> Mesh:
    """Parse the CLI mesh spec ``data=N[,model=M]`` into a Mesh.

    ``data=0`` (or omitting data) means "all remaining devices": e.g. on
    an 8-device host ``model=2`` gives a 4x2 mesh. The user surface for
    SURVEY §2.4's data-parallel generation fan-out.
    """
    n_data: int | None = None
    n_model = 1
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        key, _, val = part.partition("=")
        key, val = key.strip(), val.strip()
        if key == "data":
            if int(val) < 0:
                raise ValueError("--mesh data=N must be >= 0 "
                                 "(0 = all remaining devices)")
            n_data = int(val) or None
        elif key == "model":
            n_model = int(val)
            if n_model < 1:
                raise ValueError("--mesh model=M must be >= 1 "
                                 "(1 = no tensor parallelism)")
        else:
            raise ValueError(
                f"unknown --mesh key {key!r} (expected data=N, model=M)")
    return make_mesh(n_data=n_data, n_model=n_model, devices=devices)


def batch_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Shard one (batch) axis over 'data' (leading by default)."""
    return NamedSharding(mesh, P(*([None] * axis + ["data"])))


def pad_batch(x, n_data: int, axis: int = 0):
    """Pad ``axis`` to a multiple of ``n_data`` by repeating the last
    slice (padding rows are computed and discarded by the caller)."""
    size = x.shape[axis]
    pad = (-size) % n_data
    if not pad:
        return x
    last = jax.lax.slice_in_dim(x, size - 1, size, axis=axis)
    reps = jnp.concatenate([last] * pad, axis=axis)
    return jnp.concatenate([x, reps], axis=axis)


def pad_batch_branched(x, n_data: int, n_branches: int, axis: int = 0):
    """Branch-aware ``pad_batch``: ``x`` stacks ``n_branches`` guidance
    branches along ``axis`` ([uncond; cond; ...]); each branch's batch
    pads independently so the padding lands INSIDE every branch and the
    stacking contract survives the shard. The single pad implementation
    for all three pipeline families."""
    if n_branches == 1:
        return pad_batch(x, n_data, axis=axis)
    parts = jnp.split(x, n_branches, axis=axis)
    return jnp.concatenate([pad_batch(p, n_data, axis=axis) for p in parts],
                           axis=axis)


def require_data_axis(mesh: Mesh) -> None:
    """Generation shards the batch over a 'data' axis; a hand-built mesh
    without one would otherwise KeyError deep in the jit wrapper AFTER
    the params were already laid out."""
    if "data" not in mesh.shape:
        raise ValueError(
            "mesh needs a 'data' axis (make_mesh/mesh_from_spec create "
            "one; for pure tensor parallelism use data=1)")


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _path_keys(path: tuple) -> list:
    return [getattr(p, "key", None) for p in path]


def _is_attention_qkv(path: tuple) -> bool:
    return any(k in ("to_q", "to_k", "to_v") for k in _path_keys(path))


def _is_attention_out(path: tuple) -> bool:
    return any(k == "to_out" for k in _path_keys(path))


def shard_unet_params(params, mesh: Mesh):
    """Tensor-parallel layout for the UNet.

    * attention to_q/to_k/to_v weights [in, out]: shard ``out`` (head axis)
      over 'model'; to_out.0 weights [in, out]: shard ``in`` over 'model'
      (head-local attention, one psum at the output projection).
    * GEGLU FFN: ff.net.0.proj out-sharded, ff.net.2 in-sharded (column/
      row-parallel MLP; the GEGLU half-split costs one resharding — an
      interleaved column layout is a later optimization).
    Convs, norms, and time embeddings stay replicated. With n_model == 1
    this is a no-op layout.
    """

    def spec_for(path, leaf):
        keys = _path_keys(path)
        if "scale" in keys:
            # int8 per-out-channel scales are [1, out]: tiny, and their
            # size-1 leading axis cannot take the row-parallel spec —
            # replicate (always correct under jit SPMD; the qint8 payload
            # still shards via the weight rules below).
            return P()
        if leaf.ndim == 2 and _is_attention_qkv(path):
            return P(None, "model")
        if leaf.ndim == 2 and _is_attention_out(path):
            return P("model", None)
        if leaf.ndim == 2 and "ff" in keys:
            return P(None, "model") if "proj" in keys else P("model", None)
        return P()

    def place(path, leaf):
        leaf = jnp.asarray(leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec_for(path, leaf)))

    return jax.tree_util.tree_map_with_path(place, params)


# FLUX DiT tensor-parallel rules. Leaves are layer-STACKED ([L, ...]); the
# leading axis is depth, so 2D specs gain a leading None.
_FLUX_COL = ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
             "add_v_proj", "proj_mlp")  # output (head/hidden) axis sharded
_FLUX_ROW = ("to_out", "to_add_out", "proj_out")  # input axis sharded


def shard_flux_params(params, mesh: Mesh):
    """Tensor-parallel layout for the FLUX joint transformer.

    Head-sharded joint attention (q/k/v + context add_*_proj out-sharded;
    to_out/to_add_out/single-block proj_out in-sharded so XLA inserts one
    psum per attention) and column/row-parallel MLPs (ff/ff_context
    net.0.proj out-sharded, net.2 in-sharded; single-block proj_mlp
    out-sharded fuses into the row-parallel proj_out). AdaLN modulation,
    norms, embedders replicated. Requires num_attention_heads divisible by
    the 'model' axis.
    """

    def spec_for(path, leaf):
        keys = _path_keys(path)
        if "scale" in keys:  # int8 per-channel scales: replicate
            return P()
        stacked = any(k in ("transformer_blocks", "single_transformer_blocks")
                      for k in keys)
        if not stacked or "norm" in keys or any(
                k and str(k).startswith("norm") for k in keys):
            return P()
        lead = (None,) if stacked else ()
        w = leaf.ndim == len(lead) + 2
        if any(k in _FLUX_COL for k in keys) or (
                "ff" in keys or "ff_context" in keys) and "proj" in keys:
            return P(*lead, None, "model") if w else P(*lead, "model")
        if any(k in _FLUX_ROW for k in keys) or (
                ("ff" in keys or "ff_context" in keys) and "2" in keys):
            return P(*lead, "model", None) if w else P(*lead)
        return P()

    def place(path, leaf):
        leaf = jnp.asarray(leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec_for(path, leaf)))

    return jax.tree_util.tree_map_with_path(place, params)


# HiDream MoE DiT rules: same head-sharded attention as FLUX (image and
# text projections), expert-parallel routed FFNs (experts axis over
# 'model'), column/row-parallel shared/text SwiGLU.
_HIDREAM_COL = ("to_q", "to_k", "to_v", "to_q_t", "to_k_t", "to_v_t")
_HIDREAM_ROW = ("to_out", "to_out_t")


def shard_hidream_params(params, mesh: Mesh):
    """Tensor-parallel layout for the HiDream-I1 MoE DiT.

    Attention q/k/v (both streams) column-sharded over heads, output
    projections row-sharded; SwiGLU w1/w3 column-sharded, w2 row-sharded
    (shared experts, text FFN); routed experts shard their leading expert
    axis over 'model' — expert parallelism, the natural MoE axis. The
    full-dim q/k RMSNorm scales stay replicated (they multiply the sharded
    projection output elementwise; XLA reshards as needed).
    """

    def spec_for(path, leaf):
        keys = _path_keys(path)
        if "scale" in keys:  # int8 per-channel scales: replicate
            return P()
        stacked = any(k in ("double_stream_blocks", "single_stream_blocks")
                      for k in keys)
        if not stacked or any(
                k and str(k).startswith(("q_rms", "k_rms", "adaLN"))
                for k in keys):
            return P()
        w = leaf.ndim == 3  # [L, in, out] stacked linear weight
        if "experts" in keys:  # [L, E, in, out]: expert parallelism
            return P(None, "model") if leaf.ndim >= 2 else P()
        if any(k in _HIDREAM_COL for k in keys) or any(
                k in ("w1", "w3") for k in keys):
            return P(None, None, "model") if w else P(None, "model")
        if any(k in _HIDREAM_ROW for k in keys) or "w2" in keys:
            return P(None, "model", None) if w else P()
        return P()

    def place(path, leaf):
        leaf = jnp.asarray(leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec_for(path, leaf)))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(tree, mesh: Mesh):
    """Place batch-leading arrays with the data-parallel sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(jnp.asarray(x), sh),
                                  tree)
