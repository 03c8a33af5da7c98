"""ctypes binding for the native batch PNG writer (native/png_writer.cc).

Builds on demand with make; falls back to per-image PIL saves when the
toolchain or shared library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libuce_png.so"))
_lib = None
_lib_tried = False


def _load():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.write_png_batch.restype = ctypes.c_int
        lib.write_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def write_png_batch(images: np.ndarray, paths: list[str],
                    level: int = 6, n_threads: int | None = None) -> int:
    """Write uint8 [N, H, W, 3] images to the given paths. Returns the
    number written. Uses the native multithreaded encoder when available,
    PIL otherwise."""
    images = np.ascontiguousarray(images, np.uint8)
    n, h, w, c = images.shape
    assert c == 3 and len(paths) == n
    for p in paths:
        os.makedirs(os.path.dirname(os.path.abspath(p)), exist_ok=True)

    lib = _load()
    if lib is not None:
        if n_threads is None:
            n_threads = min(n, os.cpu_count() or 1)
        joined = b"\0".join(p.encode() for p in paths) + b"\0"
        return lib.write_png_batch(
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, h, w, joined, level, n_threads)

    from uce_tpu.utils.imaging import save_png

    for img, p in zip(images, paths):
        save_png(img, p)
    return n


def native_available() -> bool:
    return _load() is not None
