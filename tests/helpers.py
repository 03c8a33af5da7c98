"""Shared test fixtures: toy tokenizer, tiny text encoder, fake UNet targets."""

import numpy as np

from uce_tpu.models import clip_text

VOCAB = 99
BOS, EOS, PAD = 97, 98, 0

TINY_TEXT_CONFIG = clip_text.CLIPTextConfig(
    vocab_size=VOCAB,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=16,
    eos_token_id=EOS,
)


class ToyTokenizer:
    """Deterministic word-hash tokenizer with the HF call signature.

    Uses crc32 (NOT builtin hash(), which is salted per process) so
    tokenization — and everything downstream of it — is reproducible
    across test processes.
    """

    model_max_length = 16

    def __call__(self, prompts, padding=None, max_length=16, truncation=True,
                 return_tensors=None, **kw):
        import zlib

        if isinstance(prompts, str):
            prompts = [prompts]
        ids = np.full((len(prompts), max_length), PAD, np.int32)
        mask = np.zeros((len(prompts), max_length), np.int32)
        for i, p in enumerate(prompts):
            words = p.lower().split()
            toks = [BOS] + [3 + (zlib.crc32(w.encode()) % 90)
                            for w in words][: max_length - 2] + [EOS]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def tiny_text_encoder(seed=0):
    params = clip_text.init_params(np.random.default_rng(seed), TINY_TEXT_CONFIG)
    return params, TINY_TEXT_CONFIG


def fake_unet_targets(seed=0, d=32):
    """SD-like attn2 to_k/to_v keys with mixed output dims."""
    rng = np.random.default_rng(seed)
    names = []
    for block in ["down_blocks.0.attentions.0", "mid_block.attentions.0",
                  "up_blocks.1.attentions.2"]:
        for proj in ["to_k", "to_v"]:
            names.append(f"{block}.transformer_blocks.0.attn2.{proj}.weight")
    dims = [24, 24, 48, 48, 24, 24]
    return {
        n: rng.standard_normal((o, d)).astype(np.float32) * 0.1
        for n, o in zip(names, dims)
    }
