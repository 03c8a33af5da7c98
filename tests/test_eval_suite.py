"""Eval suite tests: metric properties, CSV protocols, backbone shapes."""

import numpy as np
import pandas as pd
import pytest

from uce_tpu.eval import clip_classify, compare_grids, imageclassify
from uce_tpu.eval import lpips as lpips_mod
from uce_tpu.eval import nudenet as nudenet_mod
from uce_tpu.eval import styleloss as style_mod
from uce_tpu.models import vision_backbones as vb
from uce_tpu.utils.imaging import save_png


def _write_case_images(folder, cases=(0, 1), nums=(0, 1), seed=0):
    rng = np.random.default_rng(seed)
    folder.mkdir(parents=True, exist_ok=True)
    for c in cases:
        for n in nums:
            img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            save_png(img, str(folder / f"{c}_{n}.png"))


def test_sorted_nicely():
    names = ["10_0.png", "2_0.png", "1_1.png", "1_0.png"]
    assert clip_classify.sorted_nicely(names) == [
        "1_0.png", "1_1.png", "2_0.png", "10_0.png"]


def test_clip_classify_folder(tmp_path):
    _write_case_images(tmp_path / "imgs")

    class StubClip:
        def classify(self, images, labels):
            return np.arange(images.shape[0]) % len(labels)

    prompts = pd.DataFrame({
        "case_number": [0, 1],
        "prompt": ["a", "b"],
        "evaluation_seed": [1, 2],
    })
    prompts.to_csv(tmp_path / "p.csv", index=False)
    df = clip_classify.classify_folder(
        StubClip(), str(tmp_path / "imgs"), ["a man", "a woman"],
        prompts_path=str(tmp_path / "p.csv"),
        save_path=str(tmp_path / "out.csv"))
    assert set(df.columns) >= {"case_number", "prompt", "a_man_bias",
                               "a_woman_bias"}
    assert len(df) == 2
    assert np.allclose(df["a_man_bias"] + df["a_woman_bias"], 1.0)
    assert (tmp_path / "out.csv").exists()


def test_lpips_identity_and_separation(rng):
    params = {
        "alex": vb.init_alexnet(rng),
        "lins": [np.abs(rng.standard_normal(c)).astype(np.float32)
                 for c in vb.ALEXNET_CHANNELS],
    }
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32) * 0.5
    y = rng.standard_normal((1, 64, 64, 3)).astype(np.float32) * 0.5
    d_same = np.asarray(lpips_mod.lpips_distance(params, x, x))
    d_diff = np.asarray(lpips_mod.lpips_distance(params, x, y))
    assert abs(d_same[0]) < 1e-6
    assert d_diff[0] > 1e-4


def test_lpips_folder_protocol(tmp_path, rng):
    _write_case_images(tmp_path / "orig", seed=0)
    _write_case_images(tmp_path / "edit", seed=1)
    params = {
        "alex": vb.init_alexnet(rng),
        "lins": [np.abs(rng.standard_normal(c)).astype(np.float32)
                 for c in vb.ALEXNET_CHANNELS],
    }
    df = lpips_mod.eval_folders(
        params, str(tmp_path / "orig"), str(tmp_path / "edit"),
        save_path=str(tmp_path / "out.csv"))
    assert len(df) == 2 and (df["lpips_loss"] > 0).all()
    # identical folders -> zero loss
    df0 = lpips_mod.eval_folders(
        params, str(tmp_path / "orig"), str(tmp_path / "orig"))
    assert np.allclose(df0["lpips_loss"], 0.0, atol=1e-6)


def test_styleloss_identity(tmp_path, rng):
    params = vb.init_vgg19(rng)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    s, c = style_mod.style_content_loss(params, x, x, x)
    assert abs(float(np.asarray(s)[0])) < 1e-3  # gram of identical images
    assert abs(float(np.asarray(c)[0])) < 1e-6
    y = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    s2, c2 = style_mod.style_content_loss(params, y, x, x)
    assert float(np.asarray(s2)[0]) > float(np.asarray(s)[0])
    assert float(np.asarray(c2)[0]) > 0


def test_gram_matrix_shape(rng):
    f = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    g = np.asarray(style_mod.gram_matrix(f))
    assert g.shape == (2, 4, 4)
    np.testing.assert_allclose(g[0], g[0].T, rtol=1e-5)


def test_resnet50_shapes(rng):
    # structural check with a torchvision-format random state dict
    sd = {}

    def conv(name, cout, cin, k):
        sd[name + ".weight"] = (rng.standard_normal((cout, cin, k, k)) * 0.05
                                ).astype(np.float32)

    def bn(name, c):
        sd[name + ".weight"] = np.ones(c, np.float32)
        sd[name + ".bias"] = np.zeros(c, np.float32)
        sd[name + ".running_mean"] = np.zeros(c, np.float32)
        sd[name + ".running_var"] = np.ones(c, np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    widths = (64, 128, 256, 512)
    for li, (blocks, w) in enumerate(zip(vb.RESNET50_BLOCKS, widths), 1):
        for bi in range(blocks):
            base = f"layer{li}.{bi}"
            conv(base + ".conv1", w, cin if bi == 0 else w * 4, 1)
            bn(base + ".bn1", w)
            conv(base + ".conv2", w, w, 3)
            bn(base + ".bn2", w)
            conv(base + ".conv3", w * 4, w, 1)
            bn(base + ".bn3", w * 4)
            if bi == 0:
                conv(base + ".downsample.0", w * 4, cin, 1)
                bn(base + ".downsample.1", w * 4)
        cin = w * 4
    sd["fc.weight"] = (rng.standard_normal((1000, 2048)) * 0.01
                       ).astype(np.float32)
    sd["fc.bias"] = np.zeros(1000, np.float32)

    params = vb.convert_resnet50(sd)
    x = vb.preprocess_imagenet(
        np.zeros((1, 224, 224, 3), np.uint8))
    logits = vb.resnet50_logits(params, x)
    assert logits.shape == (1, 1000)
    assert np.isfinite(np.asarray(logits)).all()


def test_nudenet_protocol(tmp_path):
    _write_case_images(tmp_path / "imgs", cases=(0, 1), nums=(0,))
    prompts = pd.DataFrame({"case_number": [0, 1], "prompt": ["x", "y"]})
    prompts.to_csv(tmp_path / "p.csv", index=False)

    def fake_detect(path):
        if "0_0" in path:
            return [{"class": "EXPOSED", "score": 0.9},
                    {"class": "COVERED", "score": 0.1}]
        return []

    df = nudenet_mod.label_folder(
        fake_detect, str(tmp_path / "imgs"), str(tmp_path / "p.csv"),
        save_path=str(tmp_path / "out.csv"), threshold=0.5)
    assert df["NudeNet_label"].tolist() == ["EXPOSED", ""]


def test_compare_grids(tmp_path):
    _write_case_images(tmp_path / "a", cases=(0,), nums=(0,))
    _write_case_images(tmp_path / "b", cases=(0,), nums=(0,))
    n = compare_grids.make_grids(
        [str(tmp_path / "a"), str(tmp_path / "b")], ["A", "B"],
        str(tmp_path / "grids"))
    assert n == 1 and (tmp_path / "grids" / "0.png").exists()


def test_imageclassify_fixed_bug(tmp_path, rng):
    # reference crashes on missing --save_path (imageclassify.py:27-28);
    # here a default path is derived and the CSV written.
    _write_case_images(tmp_path / "imgs", cases=(0,), nums=(0,))
    # minimal 1-block "resnet" is not possible; use the structural random
    # state dict from test_resnet50_shapes via the same builder is heavy —
    # instead just verify classify_folder handles prompts merge + topk with
    # a tiny stub of resnet50_logits.
    import uce_tpu.eval.imageclassify as ic

    orig = ic.resnet50_logits
    ic.resnet50_logits = lambda params, x: np.tile(
        np.arange(1000, dtype=np.float32), (x.shape[0], 1))
    try:
        prompts = pd.DataFrame({"case_number": [0], "prompt": ["x"],
                                "label_idx": [999]})
        prompts.to_csv(tmp_path / "p.csv", index=False)
        df = ic.classify_folder(
            {}, str(tmp_path / "imgs"), prompts_path=str(tmp_path / "p.csv"),
            save_path=str(tmp_path / "out.csv"), topk=3)
        assert df["index_top1"].iloc[0] == 999
        assert bool(df["correct"].iloc[0])
    finally:
        ic.resnet50_logits = orig


def test_stack_uniform_mixed_resolutions():
    """An eval folder with mixed image sizes (re-runs with a different
    --image_size) must not crash the batch stack; stragglers resize to
    the leading shape, and a homogeneous batch is a plain np.stack."""
    from uce_tpu.utils.imaging import stack_uniform

    a = np.full((32, 32, 3), 10, np.uint8)
    b = np.full((64, 64, 3), 20, np.uint8)
    out = stack_uniform([a, b])
    assert out.shape == (2, 32, 32, 3)
    assert (out[1] == 20).all()  # constant image survives the resize
    same = stack_uniform([a, a.copy()])
    np.testing.assert_array_equal(same, np.stack([a, a]))
