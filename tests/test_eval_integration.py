"""Real-package integration tests for NudeNet and DreamSim.

These packages are absent from this image (and from the reference's own
requirements for dreamsim's deps), so the wrappers are fixture-tested in
test_eval_fixtures.py. The tests below pre-verify FIRST CONTACT with the
real packages: in any environment where they are installed (pip install
nudenet dreamsim), this file runs the genuine detectors end-to-end and
asserts real metric numbers — no skips. Documented command:

    pytest tests/test_eval_integration.py -v
"""

import importlib.util

import numpy as np
import pytest

has_nudenet = importlib.util.find_spec("nudenet") is not None
has_dreamsim = importlib.util.find_spec("dreamsim") is not None


def _write_images(tmp_path, cases=(0, 1), size=64, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    folder = tmp_path / "imgs"
    folder.mkdir(exist_ok=True)
    for case in cases:
        arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(folder / f"{case}_0.png")
    return folder


@pytest.mark.skipif(not has_nudenet, reason="nudenet package not installed")
def test_nudenet_real_detector_end_to_end(tmp_path):
    """Real NudeDetector through the full label_folder protocol: the CSV
    gains a NudeNet_label column and each detection row parses under the
    dual-schema handling (class/label, score/probability)."""
    import pandas as pd

    from uce_tpu.eval.nudenet import label_folder, load_nudenet_detector

    folder = _write_images(tmp_path)
    prompts = tmp_path / "p.csv"
    pd.DataFrame({"case_number": [0, 1],
                  "prompt": ["a", "b"],
                  "evaluation_seed": [1, 2]}).to_csv(prompts, index=False)
    detect = load_nudenet_detector()
    # raw-schema sanity on one image: every detection carries a score key
    dets = detect(str(folder / "0_0.png"))
    assert isinstance(dets, list)
    for d in dets:
        assert "score" in d or "probability" in d
        assert "class" in d or "label" in d
    out = tmp_path / "out.csv"
    df = label_folder(detect, str(folder), str(prompts),
                      save_path=str(out), threshold=0.0)
    assert "NudeNet_label" in df.columns and len(df) == 2
    assert out.exists()


@pytest.mark.skipif(not has_nudenet, reason="nudenet package not installed")
def test_nudenet_jax_port_matches_real_detector(tmp_path):
    """Convert the packaged 320n.onnx (tools/convert_nudenet.py) and assert
    the JAX YOLOv8 backbone reproduces the real NudeDetector's detections —
    the full first-contact gate for the JAX port (classes and scores agree;
    boxes within a couple of pixels of the cv2-preprocessed original)."""
    import subprocess
    import sys

    from uce_tpu.eval.nudenet import JaxNudeDetector, load_nudenet_detector

    out = tmp_path / "det.safetensors"
    res = subprocess.run(
        [sys.executable, "tools/convert_nudenet.py", "--out", str(out)],
        capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    folder = _write_images(tmp_path)
    real = load_nudenet_detector()
    ours = JaxNudeDetector(str(out))
    for name in ("0_0.png", "1_0.png"):
        path = str(folder / name)
        got = ours.detect(path)
        want = [{"class": d.get("class", d.get("label")),
                 "score": d.get("score", d.get("probability")),
                 "box": d.get("box")} for d in real(path)]
        # compare confident detections only: borderline scores can flap
        # across nudenet's 0.2 floor under PIL-vs-cv2 resize differences
        got_c = {d["class"] for d in got if d["score"] >= 0.3}
        want_c = {d["class"] for d in want if d["score"] >= 0.3}
        assert got_c == want_c
        for w in want:
            if w["score"] < 0.3 or not w["box"]:
                continue
            match = [g for g in got if g["class"] == w["class"]
                     and all(abs(a - b) <= 8
                             for a, b in zip(g["box"], w["box"]))]
            assert match, f"no JAX detection near {w}"
            assert any(abs(g["score"] - w["score"]) < 0.05 for g in match)


@pytest.mark.skipif(not has_dreamsim, reason="dreamsim package not installed")
def test_dreamsim_real_model_end_to_end(tmp_path):
    """Real DreamSim ensemble through the torch wrapper: identity distance
    ~0, symmetric, positive for distinct images."""
    from uce_tpu.eval.dreamsim import load_dreamsim_distance

    dist = load_dreamsim_distance()
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (1, 224, 224, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (1, 224, 224, 3)).astype(np.float32)
    assert abs(float(dist(a, a)[0])) < 1e-4
    np.testing.assert_allclose(dist(a, b), dist(b, a), atol=1e-5)
    assert float(dist(a, b)[0]) > 1e-4


@pytest.mark.skipif(not has_dreamsim, reason="dreamsim package not installed")
def test_dreamsim_jax_port_matches_real_model(tmp_path):
    """Convert the real checkpoint (tools/convert_dreamsim.py) and assert
    the JAX ensemble reproduces the torch model's distances — the full
    first-contact gate for the JAX port."""
    import subprocess
    import sys

    from uce_tpu.eval.dreamsim import (
        load_dreamsim_distance,
        load_dreamsim_jax,
    )

    out = tmp_path / "ensemble.safetensors"
    rc = subprocess.run(
        [sys.executable, "tools/convert_dreamsim.py", "--out", str(out)],
        capture_output=True, text=True).returncode
    assert rc == 0 and out.exists()
    torch_dist = load_dreamsim_distance()
    jax_dist = load_dreamsim_jax(str(out))
    rng = np.random.default_rng(2)
    a = rng.uniform(-1, 1, (2, 224, 224, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 224, 224, 3)).astype(np.float32)
    np.testing.assert_allclose(jax_dist(a, b), torch_dist(a, b),
                               rtol=5e-3, atol=5e-3)
