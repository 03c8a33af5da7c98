"""SD / SDXL closed-form concept erasure (reference: trainscripts/uce_sd_erase.py).

End-to-end flow:
  1. select UNet cross-attn to_k/to_v weights straight from the safetensors
     state dict (no model instantiation needed for editing),
  2. encode every unique concept in one batched CLIP forward,
  3. collapse the multi-layer Eq.-7 solve into a single d x d edit matrix
     and apply it to all layers with one stacked matmul
     (or per-layer batched solves with ``method='general'`` — results are
     algebraically identical; both paths are tested against each other),
  4. export safetensors with byte-identical '<module>.weight' keys so the
     artifact loads into diffusers via load_state_dict(strict=False).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Mapping, Sequence

import numpy as np

from uce_tpu.edit import embeddings as emb
from uce_tpu.models import clip_text, sd_targets
from uce_tpu.models.hf_loader import load_json, load_state_dict, save_safetensors
from uce_tpu.ops.solver import (
    apply_edit_matrix,
    uce_edit_matrix,
    uce_solve_stacked,
)

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class SDEditResources:
    """Everything needed to run a text-space edit for SD/SDXL."""

    targets: dict[str, np.ndarray]  # {module.weight: [out, d]}
    text_params: dict
    text_config: clip_text.CLIPTextConfig
    tokenizer: object
    # SDXL second encoder (None for SD v1/v2)
    text_params_2: dict | None = None
    text_config_2: clip_text.CLIPTextConfig | None = None
    tokenizer_2: object | None = None
    family: str = "sd"

    def encode_concepts(self, concepts: Sequence[str]) -> dict[str, np.ndarray]:
        if self.family == "sdxl":
            return emb.encode_concepts_sdxl(
                self.text_params, self.text_config, self.tokenizer,
                self.text_params_2, self.text_config_2, self.tokenizer_2,
                concepts,
            )
        return emb.encode_concepts_sd(
            self.text_params, self.text_config, self.tokenizer, concepts
        )


def load_tokenizer(model_dir: str, subfolder: str = "tokenizer"):
    """Load a CLIP tokenizer from a local HF snapshot directory."""
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(os.path.join(model_dir, subfolder))


def load_text_encoder(model_dir: str, subfolder: str = "text_encoder"):
    cfg = load_json(os.path.join(model_dir, subfolder, "config.json"))
    config = clip_text.CLIPTextConfig.from_hf(cfg)
    sd = load_state_dict(model_dir, subfolder, dtype=np.float32)
    params = clip_text.convert_hf_state_dict(sd, config)
    return params, config


def load_resources(model_dir: str, family: str = "sd") -> SDEditResources:
    """Load edit targets + text encoder(s) from an HF snapshot directory."""
    unet_sd = load_state_dict(
        model_dir, "unet", keys=sd_targets.is_sd_cross_attn_kv, dtype=np.float32
    )
    targets = sd_targets.select_targets(unet_sd, family)
    params, config = load_text_encoder(model_dir)
    tokenizer = load_tokenizer(model_dir)
    res = SDEditResources(
        targets=targets, text_params=params, text_config=config,
        tokenizer=tokenizer, family=family,
    )
    if family == "sdxl":
        res.text_params_2, res.text_config_2 = load_text_encoder(
            model_dir, "text_encoder_2"
        )
        res.tokenizer_2 = load_tokenizer(model_dir, "tokenizer_2")
    return res


def erase_from_embeddings(
    targets: Mapping[str, np.ndarray],
    concept_embeds: Mapping[str, np.ndarray],
    edit_concepts: Sequence[str],
    guide_concepts: Sequence[str],
    preserve_concepts: Sequence[str],
    erase_scale: float = 1.0,
    preserve_scale: float = 1.0,
    lamb: float = 0.5,
    method: str = "collapsed",
    apply_on: str = "device",
    pallas_interpret: bool = False,
) -> dict[str, np.ndarray]:
    """Solve the edit given precomputed concept embeddings.

    Preserve guide-outputs are the original module outputs (W_old @ c_p) and
    erase guide-outputs are W_old @ c_guide — the reference's construction
    (uce_sd_erase.py:44-53) — which is what makes the collapsed single
    edit-matrix path exact.

    apply_on: where the collapsed W @ E multiply runs. 'device' (default,
    right for real accelerators with PCIe-class links) ships the stacked
    weights to the chip; 'host' computes E on-device (a few MB) and does
    the stacked matmul in NumPy — the fast path on environments where the
    host<->device link is the bottleneck (docs/PERF.md).
    """
    c_edit = emb.stack_embeds(concept_embeds, edit_concepts)
    c_guide = emb.stack_embeds(concept_embeds, guide_concepts)
    c_pres = emb.stack_embeds(concept_embeds, preserve_concepts)
    if c_pres.shape[0] == 0:
        c_pres = np.zeros((0, c_edit.shape[1]), np.float32)

    if method in ("collapsed", "pallas"):
        if method == "pallas":
            from uce_tpu.ops.pallas.uce_solve import (
                MAX_PALLAS_DIM, uce_edit_matrix_pallas)

            import jax

            # pallas_interpret: caller runs under
            # pltpu.force_tpu_interpret_mode() (tests), which makes the
            # Mosaic kernel runnable off-TPU — an explicit flag, not a
            # sniff of jax-private config state.
            if c_edit.shape[1] > MAX_PALLAS_DIM or (
                    jax.default_backend() != "tpu"
                    and not pallas_interpret):
                # The kernel's documented fallback (uce_solve.py docstring):
                # SDXL's d=2048 exceeds the scoped-VMEM budget, and the
                # Mosaic kernel only compiles for TPU — use the XLA
                # Cholesky path instead of erroring out of the CLI.
                logger.warning(
                    "pallas edit kernel needs a TPU backend and d <= %d "
                    "(got backend=%s, d=%d); using the XLA path",
                    MAX_PALLAS_DIM, jax.default_backend(), c_edit.shape[1])
                e_mat = uce_edit_matrix(
                    c_edit, c_guide, c_pres, erase_scale, preserve_scale,
                    lamb)
            else:
                e_mat = uce_edit_matrix_pallas(
                    c_edit, c_guide, c_pres, erase_scale, preserve_scale,
                    lamb)
        else:
            e_mat = uce_edit_matrix(
                c_edit, c_guide, c_pres, erase_scale, preserve_scale, lamb
            )
        # One stacked matmul for the whole model: concat rows, multiply, split.
        names = list(targets)
        w_cat = np.concatenate([np.asarray(targets[n], np.float32) for n in names])
        if apply_on == "host":
            new_cat = w_cat @ np.asarray(e_mat)
        else:
            new_cat = np.asarray(apply_edit_matrix(w_cat, e_mat))
        out, off = {}, 0
        for n in names:
            rows = targets[n].shape[0]
            out[n] = new_cat[off : off + rows]
            off += rows
        return out

    if method == "general":
        out = {}
        for dim_group in _group_by_shape(targets).values():
            names = list(dim_group)
            w_stack = np.stack([np.asarray(dim_group[n], np.float32) for n in names])
            v_guide = np.einsum("kd,lod->lko", c_guide, w_stack)
            new = np.asarray(
                uce_solve_stacked(
                    w_stack, c_edit, v_guide, c_pres,
                    erase_scale=erase_scale, preserve_scale=preserve_scale,
                    lamb=lamb,
                )
            )
            out.update(dict(zip(names, new)))
        return {n: out[n] for n in targets}  # preserve original key order

    raise ValueError(f"unknown method: {method}")


def _group_by_shape(targets: Mapping[str, np.ndarray]):
    groups: dict[tuple, dict] = {}
    for k, v in targets.items():
        groups.setdefault(tuple(v.shape), {})[k] = v
    return groups


def run_erase(
    resources: SDEditResources,
    edit_concepts: Sequence[str],
    guide_concepts: Sequence[str],
    preserve_concepts: Sequence[str],
    erase_scale: float = 1.0,
    preserve_scale: float = 1.0,
    lamb: float = 0.5,
    save_dir: str | None = None,
    exp_name: str = "uce_test",
    method: str = "collapsed",
    apply_on: str = "device",
) -> dict[str, np.ndarray]:
    """Full erase: encode -> solve -> (optionally) export safetensors."""
    start = time.time()
    concepts = list(edit_concepts) + list(guide_concepts) + list(preserve_concepts)
    concept_embeds = resources.encode_concepts(concepts)
    edited = erase_from_embeddings(
        resources.targets, concept_embeds,
        edit_concepts, guide_concepts, preserve_concepts,
        erase_scale, preserve_scale, lamb, method, apply_on,
    )
    if save_dir is not None:
        save_safetensors(edited, os.path.join(save_dir, exp_name + ".safetensors"))
    elapsed = time.time() - start
    print(f"\n\nErased concepts using UCE\nModel edited in {elapsed} seconds\n")
    return edited
