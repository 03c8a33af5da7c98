"""FLUX.1 (dev/schnell) closed-form edit (reference: trainscripts/uce_flux_edit.py).

FLUX's text-entry projections are edited instead of cross-attention:
  * ``context_embedder``                     (T5-XXL stream, in=4096)
  * ``time_text_embed.text_embedder.linear_1`` (pooled CLIP stream, in=768)

Each concept carries a pair of embeddings [T5 last-token, pooled CLIP]
(``uce_flux_edit.py:44-65``); the solver picks the stream by the weight's
input dimension (``:93-95`` — re-expressed here as a per-input-dim group
solve on the collapsed fast path). The reference's three-stage load/free
memory dance (``:15-41``) is unnecessary: we stream only the two target
tensors out of the transformer shards and never instantiate the DiT.

Export keys are byte-identical '<module>.weight' safetensors entries.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Mapping, Sequence

import jax.numpy as jnp
import numpy as np

from uce_tpu.edit import embeddings as emb
from uce_tpu.models import clip_text, sd_targets, t5 as t5_mod
from uce_tpu.models.hf_loader import load_json, load_state_dict, save_safetensors
from uce_tpu.ops.solver import apply_edit_matrix, uce_edit_matrix


@dataclasses.dataclass
class FluxEditResources:
    targets: dict[str, np.ndarray]
    t5_params: dict
    t5_config: t5_mod.T5Config
    t5_tokenizer: object
    clip_params: dict
    clip_config: clip_text.CLIPTextConfig
    clip_tokenizer: object
    max_sequence_length: int = 512


def default_max_sequence_length(model_id: str) -> int:
    """Reference rule (uce_flux_edit.py:163-165): 256 for schnell, 512 else.

    When ``model_id`` is a local snapshot directory, schnell is detected
    from the transformer config (``guidance_embeds`` is False for schnell,
    True for dev) so a directory whose name lacks the 'schnell' substring
    still gets the right truncation; the name rule is the fallback.
    """
    cfg_path = os.path.join(model_id, "transformer", "config.json")
    if os.path.exists(cfg_path):
        try:
            guidance = load_json(cfg_path).get("guidance_embeds")
        except (OSError, ValueError):
            guidance = None
        if guidance is not None:
            return 256 if guidance is False else 512
    return 256 if "schnell" in model_id else 512


def load_resources(model_dir: str,
                   max_sequence_length: int | None = None) -> FluxEditResources:
    from transformers import AutoTokenizer

    targets = load_state_dict(
        model_dir, "transformer", keys=sd_targets.is_flux_text_entry,
        dtype=np.float32)
    targets = sd_targets.select_targets(targets, "flux")

    t5_cfg = t5_mod.T5Config.from_hf(
        load_json(os.path.join(model_dir, "text_encoder_2", "config.json")))
    t5_params = t5_mod.convert_hf_state_dict(
        load_state_dict(model_dir, "text_encoder_2", dtype=np.float32), t5_cfg)
    t5_tok = AutoTokenizer.from_pretrained(
        os.path.join(model_dir, "tokenizer_2"))

    clip_cfg = clip_text.CLIPTextConfig.from_hf(
        load_json(os.path.join(model_dir, "text_encoder", "config.json")))
    clip_params = clip_text.convert_hf_state_dict(
        load_state_dict(model_dir, "text_encoder", dtype=np.float32), clip_cfg)
    clip_tok = AutoTokenizer.from_pretrained(
        os.path.join(model_dir, "tokenizer"))

    if max_sequence_length is None:
        max_sequence_length = default_max_sequence_length(model_dir)
    return FluxEditResources(
        targets=targets, t5_params=t5_params, t5_config=t5_cfg,
        t5_tokenizer=t5_tok, clip_params=clip_params, clip_config=clip_cfg,
        clip_tokenizer=clip_tok, max_sequence_length=max_sequence_length,
    )


def encode_concepts(res: FluxEditResources,
                    concepts: Sequence[str]) -> dict[str, dict[int, np.ndarray]]:
    """{concept: {input_dim: embedding}} for both text streams.

    T5: last-real-token hidden state (tokenizer_2 mask sum - 2,
    uce_flux_edit.py:55-62). CLIP: pooled output (FLUX encode_prompt uses
    the pooler, not hidden states).
    """
    unique = list(dict.fromkeys(concepts))

    ids, mask = emb.tokenize_batch(res.t5_tokenizer, unique,
                                   res.max_sequence_length)
    # Reference parity: diffusers FluxPipeline._get_t5_prompt_embeds calls
    # the T5 encoder with NO attention mask (uce_flux_edit.py:48-53), so pad
    # tokens fully attend. The real mask is still used for last-token
    # indexing below.
    t5_hidden = t5_mod.encode_tokens(
        res.t5_params, jnp.asarray(ids), jnp.ones_like(jnp.asarray(mask)),
        res.t5_config)
    t5_embeds = emb.gather_last_tokens(t5_hidden, emb.last_token_indices(mask))

    ids_c, _ = emb.tokenize_batch(res.clip_tokenizer, unique,
                                  res.clip_config.max_position_embeddings)
    _, pooled, _ = clip_text.encode_tokens(
        res.clip_params, jnp.asarray(ids_c), res.clip_config)
    pooled = np.asarray(pooled)

    d_t5 = t5_embeds.shape[-1]
    d_clip = pooled.shape[-1]
    if d_t5 == d_clip:
        raise ValueError(
            "T5 and CLIP embedding dims are equal; the input-dim stream "
            "dispatch (uce_flux_edit.py:93-95) is ambiguous for this model")
    return {
        c: {d_t5: t5_embeds[i], d_clip: pooled[i]}
        for i, c in enumerate(unique)
    }


def erase_from_embeddings(
    targets: Mapping[str, np.ndarray],
    concept_embeds: Mapping[str, Mapping[int, np.ndarray]],
    edit_concepts: Sequence[str],
    guide_concepts: Sequence[str],
    preserve_concepts: Sequence[str],
    erase_scale: float = 1.0,
    preserve_scale: float = 1.0,
    lamb: float = 0.5,
) -> dict[str, np.ndarray]:
    """Per-input-dim group solve; the stream is chosen by W.shape[-1]."""
    out: dict[str, np.ndarray] = {}
    for dim, group in sd_targets.group_by_input_dim(targets).items():
        def stack(cs):
            if not cs:
                return np.zeros((0, dim), np.float32)
            return np.stack([np.asarray(concept_embeds[c][dim], np.float32)
                             for c in cs])

        e_mat = uce_edit_matrix(
            stack(edit_concepts), stack(guide_concepts),
            stack(preserve_concepts), erase_scale, preserve_scale, lamb)
        for name, w in group.items():
            out[name] = np.asarray(
                apply_edit_matrix(np.asarray(w, np.float32), e_mat))
    return {n: out[n] for n in targets}


def run_erase(
    resources: FluxEditResources,
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
