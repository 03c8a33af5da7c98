"""Recorded-fixture tests for the two wrappers whose backing packages are
absent from this image (VERDICT r2 item 7): the fixtures in
``tests/fixtures/`` pin the REAL output schemas of the reference's pinned
versions (``nudenet==3.4.2``, ``dreamsim==0.2.1`` — requirements.txt:2,6),
so a schema drift in the adapters can't silently blank the metrics.

Each test installs a fake package module in ``sys.modules`` that REPLAYS
the recorded outputs (and asserts the recorded input conventions), then
drives the wrapper through its real ``load_*`` import path — the same code
a user with the real package installed would execute.
"""

import json
import os
import sys
import types

import numpy as np
import pandas as pd
import pytest

from uce_tpu.eval import dreamsim as dreamsim_mod
from uce_tpu.eval import nudenet as nudenet_mod
from uce_tpu.utils.imaging import save_png

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _fixture(name):
    with open(os.path.join(FIXTURES, name)) as f:
        return json.load(f)


def _write_images(folder, names, seed=0):
    rng = np.random.default_rng(seed)
    folder.mkdir(parents=True, exist_ok=True)
    for n in names:
        save_png(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8),
                 str(folder / n))


def _install_fake_nudenet(monkeypatch, detect_by_name):
    mod = types.ModuleType("nudenet")

    class NudeDetector:
        def detect(self, path):
            return detect_by_name[os.path.basename(path)]

    mod.NudeDetector = NudeDetector
    monkeypatch.setitem(sys.modules, "nudenet", mod)


@pytest.mark.parametrize("fixture_name,expected", [
    # v3.4.2 ('class' key): threshold 0.5 keeps 0.799+0.883, drops 0.487
    ("nudenet_v3_detect.json",
     ["FEMALE_BREAST_EXPOSED-FACE_FEMALE", "FACE_MALE", ""]),
    # 2.x ('label' key): 0.041 drops below 0.5
    ("nudenet_v2_detect.json",
     ["EXPOSED_BREAST_F-EXPOSED_BELLY", "", ""]),
])
def test_nudenet_pinned_schemas(tmp_path, monkeypatch, fixture_name,
                                expected):
    fx = _fixture(fixture_name)
    detect_by_name = {k: v for k, v in fx.items() if not k.startswith("_")}
    _install_fake_nudenet(monkeypatch, detect_by_name)

    _write_images(tmp_path / "imgs", detect_by_name)
    pd.DataFrame({"case_number": [0, 1, 2],
                  "prompt": ["a", "b", "c"]}).to_csv(
        tmp_path / "p.csv", index=False)

    detect = nudenet_mod.load_nudenet_detector()
    df = nudenet_mod.label_folder(
        detect, str(tmp_path / "imgs"), str(tmp_path / "p.csv"),
        save_path=str(tmp_path / "out.csv"), threshold=0.5)
    assert df["NudeNet_label"].tolist() == expected
    # the reference's '-' join and strict > must round-trip through the CSV
    back = pd.read_csv(tmp_path / "out.csv", keep_default_na=False)
    assert back["NudeNet_label"].tolist() == expected


def test_nudenet_strict_threshold_boundary(tmp_path, monkeypatch):
    """score == threshold is EXCLUDED (nudenet-classes.py:21 uses >)."""
    _install_fake_nudenet(monkeypatch, {
        "0_0.png": [{"class": "FACE_FEMALE", "score": 0.5, "box": [0, 0, 1, 1]}],
    })
    _write_images(tmp_path / "imgs", ["0_0.png"])
    pd.DataFrame({"case_number": [0], "prompt": ["a"]}).to_csv(
        tmp_path / "p.csv", index=False)
    detect = nudenet_mod.load_nudenet_detector()
    df = nudenet_mod.label_folder(detect, str(tmp_path / "imgs"),
                                  str(tmp_path / "p.csv"), threshold=0.5)
    assert df["NudeNet_label"].tolist() == [""]


def test_dreamsim_loader_tensor_conventions(tmp_path, monkeypatch):
    """load_dreamsim_distance must hand the model exactly what dreamsim
    0.2.1's preprocess produces: float32 NCHW in [0, 1] — and return the
    model's [B] tensor as numpy. The fake model asserts the recorded input
    spec and replays recorded distances keyed by batch position."""
    import torch

    fx = _fixture("dreamsim_io.json")
    spec = fx["input_spec"]
    names = sorted(fx["distances"])  # eval_folders sorts filenames
    dist_values = [fx["distances"][n] for n in names]
    calls = {}

    def fake_dreamsim(pretrained, device="cpu", cache_dir=None):
        assert pretrained is True
        calls["cache_dir"] = cache_dir

        def model(a, b):
            for t in (a, b):
                assert isinstance(t, torch.Tensor)
                assert t.ndim == spec["ndim"] and t.shape[1] == 3, t.shape
                assert str(t.dtype) == "torch." + spec["dtype"]
                lo, hi = spec["range"]
                assert float(t.min()) >= lo - 1e-6
                assert float(t.max()) <= hi + 1e-6
            return torch.tensor(dist_values[: a.shape[0]],
                                dtype=torch.float32)

        def preprocess(img):  # present in the real API; unused by wrapper
            raise AssertionError("wrapper must do its own preprocessing")

        return model, preprocess

    mod = types.ModuleType("dreamsim")
    mod.dreamsim = fake_dreamsim
    monkeypatch.setitem(sys.modules, "dreamsim", mod)

    _write_images(tmp_path / "orig", names, seed=0)
    _write_images(tmp_path / "edit", names, seed=1)
    pd.DataFrame({"case_number": [0, 1], "prompt": ["a", "b"]}).to_csv(
        tmp_path / "p.csv", index=False)

    distance_fn = dreamsim_mod.load_dreamsim_distance(cache_dir="/tmp/ds")
    assert calls["cache_dir"] == "/tmp/ds"
    df = dreamsim_mod.eval_folders(
        distance_fn, str(tmp_path / "orig"), str(tmp_path / "edit"),
        prompts_path=str(tmp_path / "p.csv"),
        save_path=str(tmp_path / "out.csv"), image_size=32)
    got = df.set_index("case_number")["dream_loss"]
    assert got[0] == pytest.approx(dist_values[0], rel=1e-6)
    assert got[1] == pytest.approx(dist_values[1], rel=1e-6)
    assert os.path.exists(tmp_path / "out.csv")
