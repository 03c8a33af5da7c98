"""Llama hidden-states parity vs torch transformers (tiny config, GQA)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from uce_tpu.models import llama  # noqa: E402


def _tiny(rope_scaling=None):
    cfg = transformers.LlamaConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, rope_scaling=rope_scaling,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    return transformers.LlamaModel(cfg).eval(), cfg


@pytest.mark.parametrize("rope_scaling", [
    None,
    {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
     "high_freq_factor": 4.0, "original_max_position_embeddings": 16},
])
def test_hidden_states_parity(rope_scaling):
    model, cfg = _tiny(rope_scaling)
    our_cfg = llama.LlamaConfig.from_hf(cfg.to_dict())
    params = llama.convert_hf_state_dict(model.state_dict(), our_cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 99, size=(2, 12))
    mask = np.ones((2, 12), np.int64)

    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask),
                    output_hidden_states=True)
    ours = llama.encode_tokens(params, jnp.asarray(ids), jnp.asarray(mask),
                               our_cfg)
    assert ours.shape[0] == len(ref.hidden_states)
    for i, h in enumerate(ref.hidden_states):
        np.testing.assert_allclose(
            np.asarray(ours[i]), h.numpy(), rtol=3e-4, atol=3e-4,
            err_msg=f"hidden_states[{i}]")


def test_padding_mask_affects_output():
    model, cfg = _tiny()
    our_cfg = llama.LlamaConfig.from_hf(cfg.to_dict())
    params = llama.convert_hf_state_dict(model.state_dict(), our_cfg)
    ids = np.ones((1, 8), np.int64) * 5
    m1 = np.ones((1, 8), np.int64)
    m2 = m1.copy()
    m2[0, :4] = 0  # left padding: later positions lose those keys
    h1 = llama.encode_tokens(params, jnp.asarray(ids), jnp.asarray(m1), our_cfg)
    h2 = llama.encode_tokens(params, jnp.asarray(ids), jnp.asarray(m2), our_cfg)
    assert np.abs(np.asarray(h1[-1][:, 4:]) - np.asarray(h2[-1][:, 4:])).max() > 0
