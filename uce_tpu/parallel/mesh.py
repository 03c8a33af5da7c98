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


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _is_attention_qkv(path: tuple) -> bool:
    keys = [getattr(p, "key", None) for p in path]
    return any(k in ("to_q", "to_k", "to_v") for k in keys)


def _is_attention_out(path: tuple) -> bool:
    keys = [getattr(p, "key", None) for p in path]
    return any(k == "to_out" for k in keys)


def shard_unet_params(params, mesh: Mesh):
    """Tensor-parallel layout for UNet attention projections.

    to_q/to_k/to_v weights [in, out]: shard ``out`` (head dim) over 'model';
    to_out.0 weights [in, out]: shard ``in`` over 'model' (so the attention
    block computes head-local results and XLA inserts one psum at to_out).
    Everything else replicated. With n_model == 1 this is a no-op layout.
    """

    def spec_for(path, leaf):
        if leaf.ndim == 2 and _is_attention_qkv(path):
            return P(None, "model")
        if leaf.ndim == 2 and _is_attention_out(path):
            return P("model", None)
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
