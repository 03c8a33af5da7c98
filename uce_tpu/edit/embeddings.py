"""Concept-embedding extraction: one batched encoder forward for all concepts.

The reference runs one CLIP forward per concept in a Python loop
(``uce_sd_erase.py:26-42``); here every unique concept is tokenized into a
single fixed-shape [N, 77] batch and encoded in one jitted forward — the
per-concept "last real token" rule (attention_mask.sum() - 2) becomes a
vectorized gather.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax.numpy as jnp
import numpy as np

from uce_tpu.models import clip_text


def tokenize_batch(tokenizer, prompts: Sequence[str], max_length: int):
    """Tokenize to fixed-shape numpy (input_ids, attention_mask).

    ``tokenizer`` is any callable with the HF signature (padding to
    max_length, truncation) returning input_ids / attention_mask.
    """
    enc = tokenizer(
        list(prompts),
        padding="max_length",
        max_length=max_length,
        truncation=True,
        return_tensors="np",
    )
    ids = np.asarray(enc["input_ids"], dtype=np.int32)
    mask = np.asarray(enc["attention_mask"], dtype=np.int32)
    return ids, mask


def last_token_indices(attention_mask: np.ndarray) -> np.ndarray:
    """Reference rule (uce_sd_erase.py:34-39): index of the last real
    (non-eos, non-pad) token = attention_mask.sum() - 2."""
    return attention_mask.sum(axis=-1) - 2


def gather_last_tokens(hidden, idx) -> np.ndarray:
    """Device-side [B, T, D] -> [B, D] gather at per-row indices, then one
    small host transfer (materializing full hidden states first costs
    seconds over this environment's ~30 MB/s device->host path)."""
    out = hidden[jnp.arange(hidden.shape[0]), jnp.asarray(idx)]
    return np.asarray(out)


def encode_concepts_sd(
    params: dict,
    config: clip_text.CLIPTextConfig,
    tokenizer,
    concepts: Sequence[str],
) -> dict[str, np.ndarray]:
    """SD v1.x/v2.x: {concept: [d] last-real-token hidden state}."""
    unique = list(dict.fromkeys(concepts))
    ids, mask = tokenize_batch(tokenizer, unique, config.max_position_embeddings)
    last_hidden, _, _ = clip_text.encode_tokens(params, jnp.asarray(ids), config)
    embeds = gather_last_tokens(last_hidden, last_token_indices(mask))
    return dict(zip(unique, embeds))


def encode_concepts_sdxl(
    params_1: dict,
    config_1: clip_text.CLIPTextConfig,
    tokenizer_1,
    params_2: dict,
    config_2: clip_text.CLIPTextConfig,
    tokenizer_2,
    concepts: Sequence[str],
) -> dict[str, np.ndarray]:
    """SDXL: concat of both encoders' penultimate hidden states (diffusers
    encode_prompt convention, clip_skip=None -> hidden_states[-2]), last
    token taken per tokenizer_1's mask; embedding dim 768 + 1280 = 2048."""
    unique = list(dict.fromkeys(concepts))
    parts = []
    mask_1 = None
    for params, config, tokenizer in (
        (params_1, config_1, tokenizer_1),
        (params_2, config_2, tokenizer_2),
    ):
        ids, mask = tokenize_batch(tokenizer, unique, config.max_position_embeddings)
        if mask_1 is None:
            mask_1 = mask  # last-token indexing uses tokenizer_1's mask
        _, _, hiddens = clip_text.encode_tokens(
            params, jnp.asarray(ids), config, output_hidden_states=True
        )
        # hiddens: [L, B, T, D] layer outputs; HF hidden_states[-2] is the
        # output of layer L-1 (no final LN).
        parts.append(hiddens[-2])
    if parts[0].shape[1] != parts[1].shape[1]:
        raise ValueError("SDXL encoders must share sequence length")
    joint = jnp.concatenate(parts, axis=-1)  # [B, T, 2048], on device
    embeds = gather_last_tokens(joint, last_token_indices(mask_1))
    return dict(zip(unique, embeds))


def stack_embeds(
    embeds: Mapping[str, np.ndarray], concepts: Sequence[str]
) -> np.ndarray:
    """[K, d] stack in concept order (with repeats as listed)."""
    if not concepts:
        d = len(next(iter(embeds.values()))) if embeds else 0
        return np.zeros((0, d), np.float32)
    return np.stack([np.asarray(embeds[c], np.float32) for c in concepts])
