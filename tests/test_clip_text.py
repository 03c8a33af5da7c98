"""CLIP text encoder parity vs torch transformers (tiny random config)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from uce_tpu.models import clip_text  # noqa: E402

TINY = dict(
    vocab_size=99,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=16,
    bos_token_id=97,
    eos_token_id=98,
)


def _tiny_torch_model(hidden_act="quick_gelu", projection=False):
    cfg = transformers.CLIPTextConfig(hidden_act=hidden_act, **TINY)
    torch.manual_seed(0)
    cls = (
        transformers.CLIPTextModelWithProjection
        if projection
        else transformers.CLIPTextModel
    )
    model = cls(cfg).eval()
    return model, cfg


@pytest.mark.parametrize("hidden_act", ["quick_gelu", "gelu"])
def test_parity_with_hf(hidden_act):
    model, cfg = _tiny_torch_model(hidden_act)
    our_cfg = clip_text.CLIPTextConfig.from_hf(cfg.to_dict())
    params = clip_text.convert_hf_state_dict(model.state_dict(), our_cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, TINY["vocab_size"] - 1, size=(2, 16))
    ids[:, -1] = cfg.eos_token_id  # HF pools at first eos occurrence

    with torch.no_grad():
        out = model(torch.tensor(ids))
    ours_last, ours_pooled, _ = clip_text.encode_tokens(
        params, jnp.asarray(ids), our_cfg
    )
    np.testing.assert_allclose(
        np.asarray(ours_last), out.last_hidden_state.numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours_pooled), out.pooler_output.numpy(), rtol=2e-4, atol=2e-5
    )


def test_parity_with_legacy_eos_sentinel():
    """Real SD/SDXL/OpenAI-CLIP text configs carry the legacy
    eos_token_id=2 while the tokenizer's actual eos is the max vocab id;
    HF special-cases ==2 to argmax-of-ids pooling. Matching the literal id
    would pool the BOS state (prompt-independent) — regression for that."""
    tiny = dict(TINY, eos_token_id=2)
    cfg = transformers.CLIPTextConfig(**tiny)
    torch.manual_seed(0)
    model = transformers.CLIPTextModel(cfg).eval()
    our_cfg = clip_text.CLIPTextConfig.from_hf(cfg.to_dict())
    params = clip_text.convert_hf_state_dict(model.state_dict(), our_cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(3, TINY["vocab_size"] - 2, size=(2, 16))
    # the real tokenizer's eos: the max vocab id, NOT the config's 2
    ids[0, 9] = TINY["vocab_size"] - 1
    ids[1, 13] = TINY["vocab_size"] - 1

    with torch.no_grad():
        out = model(torch.tensor(ids))
    _, ours_pooled, _ = clip_text.encode_tokens(params, jnp.asarray(ids),
                                                our_cfg)
    np.testing.assert_allclose(
        np.asarray(ours_pooled), out.pooler_output.numpy(),
        rtol=2e-4, atol=2e-5)
    # and the pooled outputs must differ across the batch (not BOS-pooled)
    assert not np.allclose(np.asarray(ours_pooled[0]),
                           np.asarray(ours_pooled[1]))


def test_parity_with_projection():
    model, cfg = _tiny_torch_model(projection=True)
    d = cfg.to_dict()
    d["projection_dim"] = cfg.projection_dim
    our_cfg = clip_text.CLIPTextConfig.from_hf(d)
    params = clip_text.convert_hf_state_dict(model.state_dict(), our_cfg)
    assert "text_projection" in params

    ids = np.random.default_rng(1).integers(3, 98, size=(1, 16))
    ids[:, -1] = cfg.eos_token_id
    with torch.no_grad():
        out = model(torch.tensor(ids))
    _, ours_pooled, _ = clip_text.encode_tokens(params, jnp.asarray(ids), our_cfg)
    np.testing.assert_allclose(
        np.asarray(ours_pooled), out.text_embeds.numpy(), rtol=2e-4, atol=2e-5
    )


def test_from_hf_sparse_composite_config():
    """Composite CLIP checkpoints (openai/clip-vit-base-patch32) nest
    text_config as a diff-from-default dict; with diff_defaults=True
    absent keys must fall back to the transformers CLIPTextConfig
    defaults, not KeyError. WITHOUT the flag (standalone snapshot
    configs, fully serialized) a truncated config must raise instead of
    silently building a wrong-shaped model."""
    sparse = {"bos_token_id": 0, "eos_token_id": 2, "dropout": 0.0,
              "model_type": "clip_text_model"}
    import pytest

    with pytest.raises(KeyError):
        clip_text.CLIPTextConfig.from_hf(sparse)
    cfg = clip_text.CLIPTextConfig.from_hf(sparse, diff_defaults=True)
    hf = transformers.CLIPTextConfig()  # the defaults the diff is against
    assert cfg.vocab_size == hf.vocab_size
    assert cfg.hidden_size == hf.hidden_size
    assert cfg.num_hidden_layers == hf.num_hidden_layers
    assert cfg.num_attention_heads == hf.num_attention_heads
    assert cfg.intermediate_size == hf.intermediate_size
    assert cfg.eos_token_id == 2

    from uce_tpu.models.clip import CLIPVisionConfig

    vcfg = CLIPVisionConfig.from_hf({"dropout": 0.0,
                                     "model_type": "clip_vision_model"})
    vhf = transformers.CLIPVisionConfig()
    assert vcfg.hidden_size == vhf.hidden_size
    assert vcfg.num_hidden_layers == vhf.num_hidden_layers
    assert vcfg.intermediate_size == vhf.intermediate_size


def test_random_init_runs():
    kwargs = {k: v for k, v in TINY.items() if k != "bos_token_id"}
    cfg = clip_text.CLIPTextConfig(**kwargs)
    params = clip_text.init_params(np.random.default_rng(0), cfg)
    ids = jnp.zeros((2, 16), jnp.int32)
    last, pooled, _ = clip_text.encode_tokens(params, ids, cfg)
    assert last.shape == (2, 16, 32) and pooled.shape == (2, 32)
