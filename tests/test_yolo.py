"""NudeNet JAX backbone (models/yolo.py): cross-impl parity vs the eager
torch mirror, decode/NMS/letterbox oracles, the onnx_lite wire parser, and
the full convert->load->detect loop on a synthetic ONNX file.

Reference anchor: evalscripts/nudenet-classes.py:11-25 (the detector the
wrapper drives); the backbone is nudenet 3.x's YOLOv8-n export.
"""

import struct
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from uce_tpu.models import yolo

SMALL = dict(widths=(8, 16, 24, 32, 48), depths=(1, 1, 1, 1), nc=5)


def _rand_image(rng, size):
    return rng.uniform(0, 1, (1, size, size, 3)).astype(np.float32)


# ---------------------------------------------------------------------------
# cross-implementation parity
# ---------------------------------------------------------------------------

def test_yolo_matches_torch_mirror_small():
    from tests import torch_yolo_mirror as mirror
    import torch

    sd = yolo.init_yolo_state(seed=3, **SMALL)
    params = yolo.params_from_state(sd)
    rng = np.random.default_rng(0)
    x = _rand_image(rng, 96)
    ours = np.asarray(yolo.yolo_detect(params, jnp.asarray(x)))
    theirs = mirror.yolo_forward(
        sd, torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-3)


def test_yolo_matches_torch_mirror_nano_320():
    """Full nudenet scale (-n widths/depths, 18 classes, 320 input)."""
    from tests import torch_yolo_mirror as mirror
    import torch

    sd = yolo.init_yolo_state(seed=7)
    params = yolo.params_from_state(sd)
    rng = np.random.default_rng(1)
    x = _rand_image(rng, 320)
    ours = np.asarray(yolo.yolo_detect(params, jnp.asarray(x)))
    theirs = mirror.yolo_forward(
        sd, torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    assert ours.shape == (1, 40 * 40 + 20 * 20 + 10 * 10, 4 + 18)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-3)


# ---------------------------------------------------------------------------
# decode oracle
# ---------------------------------------------------------------------------

def test_decode_matches_numpy_oracle():
    rng = np.random.default_rng(2)
    nc = 3
    outs = [rng.normal(size=(1, s, s, 64 + nc)).astype(np.float32)
            for s in (8, 4, 2)]
    got = np.asarray(yolo.decode([jnp.asarray(o) for o in outs]))

    rows = []
    for o, stride in zip(outs, yolo.STRIDES):
        _, h, w, _ = o.shape
        for yy in range(h):
            for xx in range(w):
                v = o[0, yy, xx]
                dist = v[:64].reshape(4, 16)
                e = np.exp(dist - dist.max(-1, keepdims=True))
                d = ((e / e.sum(-1, keepdims=True))
                     * np.arange(16)).sum(-1)
                ax, ay = xx + 0.5, yy + 0.5
                x1, y1 = ax - d[0], ay - d[1]
                x2, y2 = ax + d[2], ay + d[3]
                xywh = np.array([(x1 + x2) / 2, (y1 + y2) / 2,
                                 x2 - x1, y2 - y1]) * stride
                scores = 1 / (1 + np.exp(-v[64:]))
                rows.append(np.concatenate([xywh, scores]))
    np.testing.assert_allclose(got[0], np.stack(rows), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# host post-processing
# ---------------------------------------------------------------------------

def test_nms_suppresses_overlaps_keeps_distinct():
    boxes = np.array([[0, 0, 10, 10],
                      [1, 1, 10, 10],     # IoU ~0.68 with box 0
                      [50, 50, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    assert yolo.nms(boxes, scores, 0.45) == [0, 2]
    # raising the IoU threshold above the overlap keeps all three
    assert yolo.nms(boxes, scores, 0.7) == [0, 1, 2]
    assert yolo.nms(boxes[:0], scores[:0]) == []


def test_letterbox_roundtrip():
    img = np.zeros((100, 200, 3), np.uint8)
    canvas, scale, px, py = yolo.letterbox(img, 320)
    assert canvas.shape == (320, 320, 3)
    assert px == 0 and py == (320 - 160) // 2
    # a model-space point maps back to original pixels
    assert (320 - px * 2) * scale == pytest.approx(200, abs=1)
    assert canvas.min() >= 0 and canvas.max() <= 1


def test_postprocess_thresholds_nms_and_maps_back():
    nc = len(yolo.NUDENET_LABELS)
    a = np.zeros((4, 4 + nc), np.float32)
    # two near-identical strong boxes (class 2) + one distinct (class 5)
    a[0, :4] = [160, 160, 40, 40]
    a[0, 4 + 2] = 0.9
    a[1, :4] = [162, 160, 40, 40]
    a[1, 4 + 2] = 0.8
    a[2, :4] = [40, 40, 20, 20]
    a[2, 4 + 5] = 0.5
    a[3, 4 + 7] = 0.05  # below threshold
    dets = yolo.postprocess(a, scale=2.0, pad_x=0, pad_y=80)
    assert [d["class"] for d in dets] == [yolo.NUDENET_LABELS[2],
                                          yolo.NUDENET_LABELS[5]]
    # xywh 160,160,40,40 with pad_y=80, scale 2 -> x=(160-20)*2, y=(160-20-80)*2
    assert dets[0]["box"] == [280, 120, 80, 80]
    assert dets[0]["score"] == pytest.approx(0.9)


def test_validate_state_rejects_drift():
    sd = yolo.init_yolo_state(seed=0, **SMALL)
    yolo.validate_state(sd)
    bad = dict(sd)
    bad["model.23.cv4.conv.weight"] = np.zeros((1, 1, 1, 1), np.float32)
    with pytest.raises(ValueError, match="unrecognized"):
        yolo.validate_state(bad)
    missing = {k: v for k, v in sd.items() if "model.9" not in k}
    with pytest.raises(ValueError, match="missing"):
        yolo.validate_state(missing)
    # a non-arange DFL conv means the export's decode differs from ours
    warped = dict(sd)
    warped["model.22.dfl.conv.weight"] = (
        sd["model.22.dfl.conv.weight"] * 2.0)
    with pytest.raises(ValueError, match="DFL"):
        yolo.validate_state(warped)


# ---------------------------------------------------------------------------
# onnx_lite wire parser + the full converter loop
# ---------------------------------------------------------------------------

def _varint(v):
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num, wire, payload):
    tag = _varint((num << 3) | wire)
    if wire == 2:
        return tag + _varint(len(payload)) + payload
    return tag + payload


def _tensor_proto(name, arr, packed_dims=True, use_raw=True):
    msg = b""
    if packed_dims:
        dims = b"".join(_varint(d) for d in arr.shape)
        msg += _field(1, 2, dims)
    else:
        for d in arr.shape:
            msg += _field(1, 0, _varint(d))
    msg += _field(2, 0, _varint(1))  # float32
    msg += _field(8, 2, name.encode())
    a32 = arr.astype("<f4")
    if use_raw:
        msg += _field(9, 2, a32.tobytes())
    else:
        msg += _field(4, 2, a32.tobytes())  # packed float_data
    return msg


def _onnx_bytes(tensors, **tp_kw):
    graph = b"".join(_field(5, 2, _tensor_proto(k, v, **tp_kw))
                     for k, v in tensors.items())
    # a non-initializer field the parser must skip (graph name)
    graph += _field(2, 2, b"synthetic")
    model = _field(1, 0, _varint(8))  # ir_version, skipped
    model += _field(7, 2, graph)
    return model


@pytest.mark.parametrize("packed_dims,use_raw",
                         [(True, True), (False, True), (True, False)])
def test_onnx_lite_parses_hand_encoded_model(packed_dims, use_raw):
    from uce_tpu.utils.onnx_lite import read_initializers

    rng = np.random.default_rng(4)
    tensors = {"model.0.conv.weight":
               rng.normal(size=(4, 3, 3, 3)).astype(np.float32),
               "model.0.conv.bias":
               rng.normal(size=(4,)).astype(np.float32)}
    got = read_initializers(_onnx_bytes(
        tensors, packed_dims=packed_dims, use_raw=use_raw))
    assert set(got) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(got[k], tensors[k])


def test_convert_nudenet_then_detect(tmp_path):
    """Synthetic 320n.onnx -> tools/convert_nudenet.py -> JaxNudeDetector:
    the exact first-real-contact path, minus only the trained weights."""
    from PIL import Image

    from uce_tpu.eval.nudenet import JaxNudeDetector, label_folder

    sd = yolo.init_yolo_state(seed=5, **SMALL)
    onnx_path = tmp_path / "320n.onnx"
    onnx_path.write_bytes(_onnx_bytes(sd))
    out = tmp_path / "det.safetensors"
    res = subprocess.run(
        [sys.executable, "tools/convert_nudenet.py", "--onnx",
         str(onnx_path), "--out", str(out)],
        capture_output=True, text=True)
    # the synthetic head has 5 classes but the packaged label list has 18:
    # the converter must refuse to write a mislabeled checkpoint
    assert res.returncode == 1
    assert "does not match" in res.stderr

    sd = yolo.init_yolo_state(seed=5)  # real -n shape, 18 classes
    onnx_path.write_bytes(_onnx_bytes(sd))
    res = subprocess.run(
        [sys.executable, "tools/convert_nudenet.py", "--onnx",
         str(onnx_path), "--out", str(out)],
        capture_output=True, text=True)
    assert res.returncode == 0, res.stderr

    det = JaxNudeDetector(str(out), score_threshold=0.0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(6)
    Image.fromarray(rng.integers(0, 255, (64, 80, 3), np.uint8)).save(
        img_dir / "0_0.png")
    dets = det.detect(str(img_dir / "0_0.png"))
    assert dets, "score_threshold=0 must detect something"
    for d in dets:
        assert d["class"] in yolo.NUDENET_LABELS
        assert 0.0 <= d["score"] <= 1.0
        assert len(d["box"]) == 4

    # and the reference wrapper protocol consumes it unchanged
    prompts = tmp_path / "p.csv"
    prompts.write_text("case_number,prompt,evaluation_seed\n0,x,1\n")
    df = label_folder(det.detect, str(img_dir), str(prompts), threshold=1.1)
    assert df["NudeNet_label"].tolist() == [""]  # nothing above 1.1
    df = label_folder(det.detect, str(img_dir), str(prompts), threshold=-1.0)
    assert df["NudeNet_label"].tolist()[0] != ""


def test_detect_batch_matches_per_image(tmp_path):
    """JaxNudeDetector.detect_batch (chunked static-batch forwards with
    tail padding) must reproduce per-image detect() exactly, and
    label_folder must route a bound batched detector through it."""
    from PIL import Image

    from uce_tpu.eval.nudenet import JaxNudeDetector, label_folder

    sd = yolo.init_yolo_state(seed=5)
    onnx_path = tmp_path / "640m.onnx"
    onnx_path.write_bytes(_onnx_bytes(sd))
    out = tmp_path / "det.safetensors"
    res = subprocess.run(
        [sys.executable, "tools/convert_nudenet.py", "--onnx",
         str(onnx_path), "--out", str(out)],
        capture_output=True, text=True)
    assert res.returncode == 0, res.stderr

    det = JaxNudeDetector(str(out), score_threshold=0.0, batch=2)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(7)
    paths = []
    for case in range(3):  # 3 images: exercises the padded tail chunk
        p = img_dir / f"{case}_0.png"
        Image.fromarray(
            rng.integers(0, 255, (48 + 8 * case, 64, 3), np.uint8)).save(p)
        paths.append(str(p))

    batched = det.detect_batch(paths)
    single = [det.detect(p) for p in paths]
    assert len(batched) == len(single) == 3
    for b_dets, s_dets in zip(batched, single):
        assert len(b_dets) == len(s_dets)
        for b, s in zip(b_dets, s_dets):
            assert b["class"] == s["class"]
            np.testing.assert_allclose(b["score"], s["score"], rtol=1e-5)
            np.testing.assert_allclose(b["box"], s["box"], rtol=1e-4,
                                       atol=1e-2)

    prompts = tmp_path / "p.csv"
    prompts.write_text("case_number,prompt,evaluation_seed\n"
                       "0,x,1\n1,y,2\n2,z,3\n")
    df_b = label_folder(det.detect, str(img_dir), str(prompts),
                        threshold=-1.0)
    class NoBatch:
        def __init__(self, d):
            self._d = d
        def __call__(self, path):
            return self._d.detect(path)
    df_s = label_folder(NoBatch(det), str(img_dir), str(prompts),
                        threshold=-1.0)
    assert df_b["NudeNet_label"].tolist() == df_s["NudeNet_label"].tolist()
