"""Loading HF-format weights (safetensors / torch state dicts) into pytrees.

The reference relies on ``diffusers.DiffusionPipeline.from_pretrained``;
here we read HF snapshot directories directly: ``config.json`` for configs
and ``*.safetensors`` shards for weights, with zero torch dependency in the
load path (torch state dicts are accepted for test parity only).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Iterable, Mapping

import numpy as np


def load_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def host_device_scope():
    """Context manager pinning array creation to the host CPU backend.

    Used by the staged DiT loaders so a full-size fp32 state dict never
    lands on the accelerator (pipeline_flux._load_flux_transformer).
    When the process is pinned to a single platform (``--device tpu``
    sets ``jax_platforms=tpu``, unregistering the CPU backend) there is
    nothing to pin to — fall back to the default device rather than
    crash; staging is then the caller's memory trade-off to make.
    """
    import contextlib

    import jax

    try:
        cpus = jax.devices("cpu")
    except RuntimeError:
        return contextlib.nullcontext()
    return jax.default_device(cpus[0])


def iter_safetensors(model_dir: str, subfolder: str | None = None) -> Iterable[str]:
    """Yield all .safetensors shard paths under a snapshot (sub)directory."""
    root = os.path.join(model_dir, subfolder) if subfolder else model_dir
    if not os.path.isdir(root):
        raise FileNotFoundError(f"model directory not found: {root}")
    names = sorted(n for n in os.listdir(root) if n.endswith(".safetensors"))
    if not names:
        raise FileNotFoundError(f"no .safetensors files in {root}")
    return [os.path.join(root, n) for n in names]


def load_state_dict(
    model_dir: str,
    subfolder: str | None = None,
    *,
    keys: Callable[[str], bool] | None = None,
    dtype=None,
) -> dict[str, np.ndarray]:
    """Read all tensors (optionally filtered by key predicate) as numpy."""
    from safetensors import safe_open

    out: dict[str, np.ndarray] = {}
    for path in iter_safetensors(model_dir, subfolder):
        with safe_open(path, framework="np") as f:
            for key in f.keys():
                if keys is not None and not keys(key):
                    continue
                t = f.get_tensor(key)
                if dtype is not None:
                    t = t.astype(dtype)
                out[key] = t
    return out


def save_safetensors(tensors: Mapping[str, Any], path: str) -> None:
    """Write a flat name->array dict as safetensors (fp32 numpy)."""
    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {k: np.asarray(v) for k, v in tensors.items()}
    save_file(arrays, path)


def to_numpy_state_dict(state_dict: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Accept torch or numpy state dicts (torch used in tests only)."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):  # torch tensor
            v = v.detach().cpu().float().numpy()
        out[k] = np.asarray(v)
    return out


def stack_layers(
    sd: Mapping[str, np.ndarray], template: str, num_layers: int
) -> np.ndarray:
    """Stack per-layer params ``template.format(i)`` into one [L, ...] array.

    Layer-stacked parameters let the transformer run as a single
    ``lax.scan`` over layers — one compiled block regardless of depth.
    """
    return np.stack([sd[template.format(i)] for i in range(num_layers)])
