"""Native PNG writer: build, write, PIL round-trip parity, fallback."""

import numpy as np
import pytest

from uce_tpu.utils import native_png
from uce_tpu.utils.imaging import load_image, save_case_images


def test_native_build_and_roundtrip(tmp_path, rng):
    imgs = rng.integers(0, 255, (3, 40, 56, 3), dtype=np.uint8)
    paths = [str(tmp_path / f"{i}.png") for i in range(3)]
    n = native_png.write_png_batch(imgs, paths)
    assert n == 3
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(load_image(p), imgs[i])


def test_native_available_and_used(tmp_path, rng):
    if not native_png.native_available():
        pytest.skip("native toolchain unavailable")
    # big batch through the threaded path
    imgs = rng.integers(0, 255, (16, 32, 32, 3), dtype=np.uint8)
    paths = [str(tmp_path / f"b{i}.png") for i in range(16)]
    assert native_png.write_png_batch(imgs, paths, n_threads=4) == 16
    np.testing.assert_array_equal(load_image(paths[7]), imgs[7])


def test_save_case_images_naming(tmp_path, rng):
    imgs = rng.integers(0, 255, (2, 8, 8, 3), dtype=np.uint8)
    save_case_images(imgs, str(tmp_path), 17)
    assert (tmp_path / "17_0.png").exists()
    assert (tmp_path / "17_1.png").exists()
