"""JAX DreamSim backbone + distance protocol (VERDICT r3 ask #5).

The DreamSim metric (reference: ``evalscripts/dreamsim_eval.py:36``) is a
LoRA-tuned ViT ensemble. This suite proves the JAX side end-to-end on
random weights: the timm-layout ViT agrees with an independent torch
transcription, and ``load_dreamsim_jax`` reads the converted-checkpoint
format (tools/convert_dreamsim.py) and implements the documented distance
protocol. Real-weights first contact is covered by the skipif-gated
integration tests in test_eval_integration.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from uce_tpu.models import vision_backbones as vb


@pytest.mark.parametrize("depth,dim,heads,patch,image", [
    (2, 32, 2, 8, 32),
    (3, 48, 4, 16, 48),   # ViT-B/16-like geometry, tiny dims
])
def test_vit_cls_embed_matches_torch_mirror(depth, dim, heads, patch, image):
    from tests.torch_vision_mirror import vit_cls_embed_torch

    rng = np.random.default_rng(7)
    sd = vb.init_vit_timm(rng, depth=depth, dim=dim, heads=heads,
                          patch=patch, image=image)
    params = vb.convert_vit_timm(sd)
    x = rng.standard_normal((2, image, image, 3)).astype(np.float32)
    ours = np.asarray(vb.vit_cls_embed(params, jnp.asarray(x), heads))
    theirs = vit_cls_embed_torch(
        sd, torch.tensor(np.transpose(x, (0, 3, 1, 2))), heads).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-5)


def _fake_ensemble(tmp_path, models=("dino_tiny", "clip_tiny")):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(3)
    tensors, meta = {}, {"models": ",".join(models)}
    for i, m in enumerate(models):
        sd = vb.init_vit_timm(rng, depth=2, dim=32, heads=2, patch=8,
                              image=224)
        # 224-image pos_embed: (224/8)^2 + 1 positions
        sd["pos_embed"] = (rng.standard_normal(
            (1, (224 // 8) ** 2 + 1, 32)) * 0.05).astype(np.float32)
        for k, v in sd.items():
            tensors[f"{m}/{k}"] = v
        meta[f"{m}.num_heads"] = "2"
        mean = (0.485, 0.456, 0.406) if i == 0 else \
            (0.48145466, 0.4578275, 0.40821073)
        std = (0.229, 0.224, 0.225) if i == 0 else \
            (0.26862954, 0.26130258, 0.27577711)
        meta[f"{m}.mean"] = ",".join(str(v) for v in mean)
        meta[f"{m}.std"] = ",".join(str(v) for v in std)
    path = str(tmp_path / "ensemble.safetensors")
    save_file(tensors, path, metadata=meta)
    return path


def test_load_dreamsim_jax_distance_protocol(tmp_path):
    from uce_tpu.eval.dreamsim import load_dreamsim_jax

    path = _fake_ensemble(tmp_path)
    dist = load_dreamsim_jax(path)
    rng = np.random.default_rng(11)
    a = rng.uniform(-1, 1, (2, 224, 224, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 224, 224, 3)).astype(np.float32)

    d_aa = dist(a, a)
    assert d_aa.shape == (2,)
    np.testing.assert_allclose(d_aa, 0.0, atol=1e-5)   # identity
    d_ab, d_ba = dist(a, b), dist(b, a)
    np.testing.assert_allclose(d_ab, d_ba, atol=1e-6)  # symmetry
    assert (d_ab > 1e-4).all()                         # discrimination
    assert (d_ab >= 0).all() and (d_ab <= 2.0).all()   # cosine range


def test_load_dreamsim_jax_requires_metadata(tmp_path):
    from safetensors.numpy import save_file

    from uce_tpu.eval.dreamsim import load_dreamsim_jax

    path = str(tmp_path / "bare.safetensors")
    save_file({"x": np.zeros(1, np.float32)}, path)
    with pytest.raises(ValueError, match="models"):
        load_dreamsim_jax(path)


def test_eval_dreamsim_cli_with_jax_weights(tmp_path, capsys):
    """'uce eval-dreamsim --jax_weights ...' end-to-end: folder pairing,
    JAX ensemble distance, reference CSV schema."""
    import pandas as pd
    from PIL import Image

    from uce_tpu.cli.main import main as cli_main

    path = _fake_ensemble(tmp_path)
    rng = np.random.default_rng(5)
    orig, edit = tmp_path / "orig", tmp_path / "edit"
    orig.mkdir(), edit.mkdir()
    for case in (0, 1):
        for d in (orig, edit):
            arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{case}_0.png")
    out_csv = tmp_path / "dream.csv"
    rc = cli_main([
        "eval-dreamsim", "--original_path", str(orig),
        "--edited_path", str(edit), "--jax_weights", path,
        "--save_path", str(out_csv), "--image_size", "224",
    ])
    assert rc == 0
    df = pd.read_csv(out_csv)
    assert "dream_loss" in df.columns and len(df) == 2
    assert (df["dream_loss"] > 0).all()
