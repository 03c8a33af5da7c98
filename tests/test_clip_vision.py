"""CLIP vision tower + dual-tower similarity parity vs torch transformers."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from uce_tpu.models import clip as clip_mod  # noqa: E402
from uce_tpu.models import clip_text  # noqa: E402

VCFG = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, image_size=32, patch_size=8)
TCFG = dict(vocab_size=99, hidden_size=24, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=48,
            max_position_embeddings=16, bos_token_id=97, eos_token_id=98)


def _tiny_clip():
    cfg = transformers.CLIPConfig(
        text_config=TCFG, vision_config=VCFG, projection_dim=16)
    torch.manual_seed(0)
    return transformers.CLIPModel(cfg).eval(), cfg


def test_vision_tower_parity():
    model, cfg = _tiny_clip()
    vcfg = clip_mod.CLIPVisionConfig.from_hf(
        dict(cfg.vision_config.to_dict(), projection_dim=16))
    sd = model.state_dict()
    vis_sd = {k: v for k, v in sd.items()
              if k.startswith("vision_model.") or k == "visual_projection.weight"}
    params = clip_mod.convert_hf_vision_state_dict(vis_sd, vcfg)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model.get_image_features(
            torch.tensor(pixels.transpose(0, 3, 1, 2)))
    ours = clip_mod.encode_image(params, jnp.asarray(pixels), vcfg)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=5e-4, atol=5e-5)


def test_logits_per_image_parity():
    model, cfg = _tiny_clip()
    vcfg = clip_mod.CLIPVisionConfig.from_hf(
        dict(cfg.vision_config.to_dict(), projection_dim=16))
    tcfg = clip_text.CLIPTextConfig.from_hf(
        dict(cfg.text_config.to_dict(), projection_dim=16))
    sd = model.state_dict()
    ours = clip_mod.CLIPModel(
        vision_params=clip_mod.convert_hf_vision_state_dict(sd, vcfg),
        vision_config=vcfg,
        text_params=clip_text.convert_hf_state_dict(
            {k: v for k, v in sd.items()
             if k.startswith("text_model.") or k == "text_projection.weight"},
            tcfg),
        text_config=tcfg,
        tokenizer=None,
        logit_scale=float(np.exp(sd["logit_scale"].numpy())),
    )

    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(3, 97, size=(3, 16))
    ids[:, -1] = 98

    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2)))

    img = clip_mod.encode_image(ours.vision_params, jnp.asarray(pixels), vcfg)
    _, txt, _ = clip_text.encode_tokens(ours.text_params, jnp.asarray(ids), tcfg)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    logits = np.asarray(ours.logit_scale * img @ txt.T)
    np.testing.assert_allclose(logits, ref.logits_per_image.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_preprocess_shapes():
    imgs = np.zeros((2, 64, 48, 3), np.uint8)
    out = clip_mod.preprocess_images(imgs, 32)
    assert out.shape == (2, 32, 32, 3)
    sq = np.full((1, 32, 32, 3), 128, np.uint8)
    out = np.asarray(clip_mod.preprocess_images(sq, 32))
    expected = (128 / 255.0 - clip_mod.CLIP_IMAGE_MEAN) / clip_mod.CLIP_IMAGE_STD
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def test_embed_texts_memoized(monkeypatch):
    """Zero-shot eval calls classify() with the same label list per image
    batch; the text tower must encode each label set once per process."""
    model, cfg = _tiny_clip()
    tcfg = clip_text.CLIPTextConfig.from_hf(
        dict(cfg.text_config.to_dict(), projection_dim=16))
    sd = model.state_dict()

    class TinyTok:
        model_max_length = 16

        def __call__(self, texts, **kw):
            ids = [[3 + (hash(t) + i) % 90 for i in range(4)] + [98]
                   for t in texts]
            return {"input_ids": [r + [98] * (16 - len(r)) for r in ids],
                    "attention_mask": [[1] * 5 + [0] * 11 for _ in ids]}

    ours = clip_mod.CLIPModel(
        vision_params={}, vision_config=None,
        text_params=clip_text.convert_hf_state_dict(
            {k: v for k, v in sd.items()
             if k.startswith("text_model.") or k == "text_projection.weight"},
            tcfg),
        text_config=tcfg, tokenizer=TinyTok(), logit_scale=100.0)

    calls = {"n": 0}
    real = clip_text.encode_tokens

    def counted(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(clip_text, "encode_tokens", counted)
    a = ours.embed_texts(["a man", "a woman"])
    b = ours.embed_texts(["a man", "a woman"])
    assert calls["n"] == 1
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ours.embed_texts(["other"])
    assert calls["n"] == 2
