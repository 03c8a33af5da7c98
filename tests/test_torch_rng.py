"""Fixed-seed latent parity with torch (the reference's RNG semantics)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from uce_tpu.utils import torch_rng


def test_randn_matches_torch_generator_nchw():
    # diffusers draws latents [B, C, H, W] with torch.Generator().manual_seed
    # (generate-images-sd.py:41); our NHWC pipeline must transpose the SAME
    # draw, bit-exactly.
    gen = torch.Generator("cpu").manual_seed(1234)
    ref = torch.randn((2, 4, 8, 8), generator=gen).numpy()
    ours = torch_rng.randn((2, 8, 8, 4), 1234)
    np.testing.assert_array_equal(ours, ref.transpose(0, 2, 3, 1))


def test_randn_non4d_direct_layout():
    gen = torch.Generator("cpu").manual_seed(7)
    ref = torch.randn((3, 5), generator=gen).numpy()
    np.testing.assert_array_equal(torch_rng.randn((3, 5), 7), ref)


def test_different_seeds_differ():
    a = torch_rng.randn((1, 4, 4, 4), 1)
    b = torch_rng.randn((1, 4, 4, 4), 2)
    assert (a != b).any()
