"""T5 encoder parity vs torch transformers (tiny random config)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from uce_tpu.models import t5  # noqa: E402


def _tiny(gated=True):
    cfg = transformers.T5Config(
        vocab_size=99, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return transformers.T5EncoderModel(cfg).eval(), cfg


@pytest.mark.parametrize("gated", [True, False])
def test_parity(gated):
    model, cfg = _tiny(gated)
    our_cfg = t5.T5Config.from_hf(cfg.to_dict())
    assert our_cfg.is_gated_act == gated
    params = t5.convert_hf_state_dict(model.state_dict(), our_cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(2, 99, size=(2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[1, 8:] = 0
    ids[1, 8:] = 0

    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)).last_hidden_state
    ours = t5.encode_tokens(params, jnp.asarray(ids), jnp.asarray(mask),
                            our_cfg)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_bucketing_matches_hf():
    from transformers.models.t5.modeling_t5 import T5Attention

    got = t5.relative_position_buckets(9, 9, 8, 16)
    rel = torch.arange(9)[None, :] - torch.arange(9)[:, None]
    ref = T5Attention._relative_position_bucket(
        rel, bidirectional=True, num_buckets=8, max_distance=16).numpy()
    np.testing.assert_array_equal(got, ref)


def test_random_init_runs():
    cfg = t5.T5Config(vocab_size=50, d_model=16, d_kv=4, d_ff=32,
                      num_layers=2, num_heads=4,
                      relative_attention_num_buckets=8,
                      relative_attention_max_distance=16)
    params = t5.init_params(np.random.default_rng(0), cfg)
    out = t5.encode_tokens(params, jnp.zeros((1, 8), jnp.int32), None, cfg)
    assert out.shape == (1, 8, 16)
