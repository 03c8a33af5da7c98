"""HiDream edit path: per-module stream pairing against an oracle."""

import numpy as np
import pytest

from tests.helpers import ToyTokenizer
from uce_tpu.edit import hidream as edit_hd
from uce_tpu.models import llama as llama_mod, t5 as t5_mod

D = 16  # shared stream dim (llama hidden == t5 d_model in HiDream)


def _resources(llama_layers=(0, 1)):
    llama_cfg = llama_mod.LlamaConfig(
        vocab_size=99, hidden_size=D, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0)
    t5_cfg = t5_mod.T5Config(
        vocab_size=99, d_model=D, d_kv=4, d_ff=32, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16)
    rng = np.random.default_rng(0)
    n_modules = len(llama_layers) + 1
    targets = {
        f"caption_projection.{i}.linear.weight":
            rng.standard_normal((12, D)).astype(np.float32)
        for i in range(n_modules)
    }
    return edit_hd.HiDreamEditResources(
        targets=targets, llama_layers=list(llama_layers),
        llama_params=llama_mod.init_params(np.random.default_rng(1), llama_cfg),
        llama_config=llama_cfg, llama_tokenizer=ToyTokenizer(),
        t5_params=t5_mod.init_params(np.random.default_rng(2), t5_cfg),
        t5_config=t5_cfg, t5_tokenizer=ToyTokenizer(),
        max_sequence_length=16,
    )


def test_encode_concepts_streams():
    res = _resources()
    embeds = edit_hd.encode_concepts(res, ["van gogh", "art"])
    assert len(embeds["van gogh"]) == 3  # 2 llama layers + t5
    for s in embeds["van gogh"]:
        assert s.shape == (D,)
    # llama streams must differ across layers, and differ from t5
    s = embeds["van gogh"]
    assert np.abs(s[0] - s[1]).max() > 1e-6
    assert np.abs(s[0] - s[2]).max() > 1e-6


def test_erase_per_module_oracle():
    res = _resources()
    edits, guides, preserves = ["van gogh"], ["art"], ["nature"]
    embeds = edit_hd.encode_concepts(res, edits + guides + preserves)
    got = edit_hd.erase_from_embeddings(res.targets, embeds, edits, guides,
                                        preserves)
    for m, (name, w) in enumerate(res.targets.items()):
        w64 = w.astype(np.float64)
        mat1 = 0.5 * w64
        mat2 = 0.5 * np.eye(D)
        c = embeds["van gogh"][m].astype(np.float64)[:, None]
        v = (w64 @ embeds["art"][m].astype(np.float64))[:, None]
        mat1 += v @ c.T
        mat2 += c @ c.T
        c = embeds["nature"][m].astype(np.float64)[:, None]
        v = (w64 @ embeds["nature"][m].astype(np.float64))[:, None]
        mat1 += v @ c.T
        mat2 += c @ c.T
        expected = mat1 @ np.linalg.inv(mat2)
        np.testing.assert_allclose(got[name], expected, rtol=5e-4, atol=5e-4,
                                   err_msg=name)


def test_stream_count_mismatch_raises():
    res = _resources()
    bad_embeds = {"x": [np.zeros(D, np.float32)] * 2}  # 2 streams, 3 modules
    with pytest.raises(ValueError, match="embedding"):
        edit_hd.erase_from_embeddings(res.targets, bad_embeds, ["x"], ["x"], [])


def test_module_ordering():
    keys = [f"caption_projection.{i}.linear.weight" for i in (10, 2, 0, 1)]
    assert sorted(keys, key=edit_hd._module_index) == [
        "caption_projection.0.linear.weight",
        "caption_projection.1.linear.weight",
        "caption_projection.2.linear.weight",
        "caption_projection.10.linear.weight",
    ]


def test_run_erase_exports(tmp_path):
    res = _resources()
    edit_hd.run_erase(res, ["van gogh"], ["art"], [],
                      save_dir=str(tmp_path), exp_name="hd")
    from safetensors.numpy import load_file

    loaded = load_file(tmp_path / "hd.safetensors")
    assert set(loaded) == set(res.targets)


def test_load_resources_requires_local_llama_dir():
    """llama_dir=None must give the clear 'pass llama_dir' error, not a
    FileNotFoundError on the hub repo id used as a path."""
    import pytest

    from uce_tpu.edit.hidream import load_resources

    with pytest.raises(ValueError, match="llama_dir"):
        load_resources("/nonexistent/model", llama_dir=None)
