"""Image IO: uint8 arrays <-> PNG files (PIL when present, pure-Python
fallback), plus the {case}_{num}.png naming convention of the reference
eval scripts (``evalscripts/generate-images-sd.py:45-46``)."""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np


def save_png(array: np.ndarray, path: str) -> None:
    """Save uint8 [H, W, 3] as PNG."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    try:
        from PIL import Image

        Image.fromarray(array).save(path)
        return
    except ImportError:  # pragma: no cover
        _save_png_pure(array, path)


def _encode_png_pure(array: np.ndarray) -> bytes:
    h, w, _ = array.shape
    raw = b"".join(b"\x00" + array[i].tobytes() for i in range(h))

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def _save_png_pure(array: np.ndarray, path: str) -> None:  # pragma: no cover
    with open(path, "wb") as f:
        f.write(_encode_png_pure(array))


def png_bytes(array: np.ndarray) -> bytes:
    """Encode uint8 [H, W, 3] as PNG bytes (no file)."""
    try:
        from PIL import Image
        import io

        buf = io.BytesIO()
        Image.fromarray(array).save(buf, format="PNG")
        return buf.getvalue()
    except ImportError:  # pragma: no cover
        return _encode_png_pure(array)


def load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def stack_uniform(images: list[np.ndarray]) -> np.ndarray:
    """np.stack that tolerates mixed resolutions in an eval folder (e.g.
    re-runs with a different --image_size into the same directory):
    stragglers are PIL-bilinear-resized to the FIRST image's shape. The
    homogeneous path (the normal case) is a plain np.stack — numerics
    untouched."""
    h, w = images[0].shape[:2]
    if all(im.shape[:2] == (h, w) for im in images):
        return np.stack(images)
    from PIL import Image

    return np.stack([
        im if im.shape[:2] == (h, w)
        else np.asarray(Image.fromarray(im).resize((w, h),
                                                   Image.BILINEAR))
        for im in images])


def case_image_path(folder: str, case_number, num: int) -> str:
    return os.path.join(folder, f"{case_number}_{num}.png")


def uce_output_folder(save_path: str, uce_model_path: str | None = None,
                      exp_name: str | None = None) -> str:
    """The eval protocol's output-folder convention, shared by the SD /
    FLUX / HiDream generation surfaces (reference:
    evalscripts/generate-images-sd.py — edited models write under the
    safetensors stem, unedited under 'original'). Created on return."""
    folder = os.path.join(
        save_path,
        exp_name if exp_name else
        (os.path.basename(uce_model_path).replace(".safetensors", "")
         if uce_model_path else "original"))
    os.makedirs(folder, exist_ok=True)
    return folder


def case_window(df, from_case: int, till_case: int) -> list:
    """CSV rows within the inclusive [from_case, till_case] resume window
    (every generation/eval CLI's failure-recovery contract)."""
    return [row for _, row in df.iterrows()
            if from_case <= row.case_number <= till_case]


def save_case_images(images: np.ndarray, folder: str, case_number) -> None:
    """Batch save via the native multithreaded PNG writer (PIL fallback)."""
    from uce_tpu.utils.native_png import write_png_batch

    paths = [case_image_path(folder, case_number, num)
             for num in range(images.shape[0])]
    written = write_png_batch(np.asarray(images), paths)
    if written != len(paths):
        # the native writer skips files it cannot open/write (disk full,
        # permissions) and reports a short count — a silently missing
        # case image would skew every folder-based metric downstream
        missing = [p for p in paths if not os.path.exists(p)]
        raise OSError(
            f"wrote {written}/{len(paths)} case images; "
            f"missing: {missing[:4]}")
