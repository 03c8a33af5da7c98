"""HiDream-I1 closed-form edit (reference: trainscripts/uce_hidream_edit.py).

Edits the DiT's ``caption_projection.<i>.linear`` matrices. Each projection
is conditioned on a different text stream: projection i < L sees
Llama-3.1-8B hidden states at layer index ``llama_layers[i]``
(``uce_hidream_edit.py:39,72-91``), and the final projection sees the T5
embedding (``:109-123``).

The reference's solve loop re-processes the last module twice with clamped
indexing (``:144-146``); per SURVEY.md §2.1 we implement the *intent*
explicitly — every projection is solved exactly once with its own stream's
embeddings — rather than replicating the shaky double-edit. Because the
embeddings differ per module, this uses the batched per-module edit-matrix
path (one vmapped Cholesky for all projections).

Export keys are byte-identical '<module>.weight' safetensors entries.
"""

from __future__ import annotations

import dataclasses
import os
import re
import time
from typing import Mapping, Sequence

import jax.numpy as jnp
import numpy as np

from uce_tpu.edit import embeddings as emb
from uce_tpu.models import llama as llama_mod, sd_targets, t5 as t5_mod
from uce_tpu.models.hf_loader import load_json, load_state_dict, save_safetensors
from uce_tpu.ops.solver import uce_edit_matrix_batch

DEFAULT_LLAMA_ID = "meta-llama/Meta-Llama-3.1-8B-Instruct"


def _module_index(key: str) -> int:
    m = re.search(r"caption_projection\.(\d+)\.", key)
    if m is None:
        raise ValueError(f"cannot parse caption_projection index from {key}")
    return int(m.group(1))


@dataclasses.dataclass
class HiDreamEditResources:
    targets: dict[str, np.ndarray]  # ordered by caption_projection index
    llama_layers: Sequence[int]
    llama_params: dict
    llama_config: llama_mod.LlamaConfig
    llama_tokenizer: object
    t5_params: dict
    t5_config: t5_mod.T5Config
    t5_tokenizer: object
    max_sequence_length: int = 128


def load_resources(model_dir: str, llama_dir: str | None = None,
                   max_sequence_length: int = 128) -> HiDreamEditResources:
    from transformers import AutoTokenizer

    if llama_dir is None:
        # same fallback as pipeline_hidream.from_pretrained: an
        # in-snapshot text_encoder_4 serves as the Llama encoder
        cand = os.path.join(model_dir, "text_encoder_4")
        if os.path.isdir(cand):
            llama_dir = cand
        else:
            raise ValueError(
                "HiDream edits need the Llama-3.1 encoder: pass "
                f"llama_dir (a LOCAL snapshot of {DEFAULT_LLAMA_ID} — "
                "the reference downloads it from the hub, "
                "uce_hidream_edit.py:44-50; this environment is "
                "zero-egress)")
    targets = load_state_dict(
        model_dir, "transformer",
        keys=sd_targets.is_hidream_caption_projection, dtype=np.float32)
    targets = dict(sorted(targets.items(), key=lambda kv: _module_index(kv[0])))
    tr_cfg = load_json(os.path.join(model_dir, "transformer", "config.json"))
    llama_layers = tr_cfg["llama_layers"]

    llama_cfg = llama_mod.LlamaConfig.from_hf(
        load_json(os.path.join(llama_dir, "config.json")))
    llama_params = llama_mod.convert_hf_state_dict(
        load_state_dict(llama_dir, None,
                        keys=lambda k: not k.startswith("lm_head"),
                        dtype=np.float32),
        llama_cfg)
    llama_tok = AutoTokenizer.from_pretrained(llama_dir)
    if llama_tok.pad_token is None:
        # stock Llama-3.1 ships without a pad token; padding='max_length'
        # would raise. diffusers' HiDreamImagePipeline does the same
        # eos-as-pad substitution before batching.
        llama_tok.pad_token = llama_tok.eos_token

    t5_cfg = t5_mod.T5Config.from_hf(
        load_json(os.path.join(model_dir, "text_encoder_3", "config.json")))
    t5_params = t5_mod.convert_hf_state_dict(
        load_state_dict(model_dir, "text_encoder_3", dtype=np.float32), t5_cfg)
    t5_tok = AutoTokenizer.from_pretrained(os.path.join(model_dir, "tokenizer_3"))

    return HiDreamEditResources(
        targets=targets, llama_layers=llama_layers,
        llama_params=llama_params, llama_config=llama_cfg,
        llama_tokenizer=llama_tok,
        t5_params=t5_params, t5_config=t5_cfg, t5_tokenizer=t5_tok,
        max_sequence_length=max_sequence_length,
    )


def encode_concepts(res: HiDreamEditResources,
                    concepts: Sequence[str]) -> dict[str, list[np.ndarray]]:
    """{concept: [llama_layer_0, ..., llama_layer_{L-1}, t5]} last-token
    embeddings (attention_mask.sum() - 2 rule, uce_hidream_edit.py:78-88,
    114-122)."""
    unique = list(dict.fromkeys(concepts))

    ids, mask = emb.tokenize_batch(res.llama_tokenizer, unique,
                                   res.max_sequence_length)
    hidden = llama_mod.encode_tokens(
        res.llama_params, jnp.asarray(ids), jnp.asarray(mask),
        res.llama_config)
    # HiDream uses hidden_states[1:] stacked (layer outputs), indexed by
    # the transformer config's llama_layers. Gather on device (the full
    # [L, N, T, D] stack is hundreds of MB for a real Llama).
    idx = jnp.asarray(emb.last_token_indices(mask))
    layer_stack = hidden[1:]
    llama_embeds = np.asarray(
        layer_stack[:, jnp.arange(len(unique)), idx])  # [L_all, N, d]

    ids_t, mask_t = emb.tokenize_batch(res.t5_tokenizer, unique,
                                       res.max_sequence_length)
    t5_hidden = t5_mod.encode_tokens(
        res.t5_params, jnp.asarray(ids_t), jnp.asarray(mask_t), res.t5_config)
    t5_embeds = emb.gather_last_tokens(t5_hidden,
                                       emb.last_token_indices(mask_t))

    out = {}
    for i, c in enumerate(unique):
        streams = [llama_embeds[li, i] for li in res.llama_layers]
        streams.append(t5_embeds[i])
        out[c] = streams
    return out


def erase_from_embeddings(
    targets: Mapping[str, np.ndarray],
    concept_embeds: Mapping[str, Sequence[np.ndarray]],
    edit_concepts: Sequence[str],
    guide_concepts: Sequence[str],
    preserve_concepts: Sequence[str],
    erase_scale: float = 1.0,
    preserve_scale: float = 1.0,
    lamb: float = 0.5,
) -> dict[str, np.ndarray]:
    """One vmapped solve over modules; module i uses stream i."""
    names = list(targets)
    n_modules = len(names)
    n_streams = len(next(iter(concept_embeds.values())))
    if n_modules != n_streams:
        raise ValueError(
            f"{n_modules} caption projections but {n_streams} embedding "
            f"streams (llama_layers + t5) — snapshot/config mismatch")

    def stack(cs):
        # [M, K, d]
        if not cs:
            d = len(concept_embeds[next(iter(concept_embeds))][0])
            return np.zeros((n_modules, 0, d), np.float32)
        return np.stack([
            np.stack([np.asarray(concept_embeds[c][m], np.float32)
                      for c in cs])
            for m in range(n_modules)
        ])

    e_mats = np.asarray(uce_edit_matrix_batch(
        stack(edit_concepts), stack(guide_concepts), stack(preserve_concepts),
        erase_scale, preserve_scale, lamb))
    w_stack = np.stack([np.asarray(targets[n], np.float32) for n in names])
    new = np.einsum("mod,mde->moe", w_stack, e_mats)
    return dict(zip(names, new.astype(np.float32)))


def run_erase(
    resources: HiDreamEditResources,
    edit_concepts: Sequence[str],
    guide_concepts: Sequence[str],
    preserve_concepts: Sequence[str],
    erase_scale: float = 1.0,
    preserve_scale: float = 1.0,
    lamb: float = 0.5,
    save_dir: str | None = None,
    exp_name: str = "uce_test",
) -> dict[str, np.ndarray]:
    start = time.time()
    concepts = list(edit_concepts) + list(guide_concepts) + list(preserve_concepts)
    concept_embeds = encode_concepts(resources, concepts)
    edited = erase_from_embeddings(
        resources.targets, concept_embeds, edit_concepts, guide_concepts,
        preserve_concepts, erase_scale, preserve_scale, lamb)
    if save_dir is not None:
        save_safetensors(edited, os.path.join(save_dir, exp_name + ".safetensors"))
    print(f"\n\nErased concepts using UCE\n"
          f"Model edited in {time.time() - start} seconds\n")
    return edited
