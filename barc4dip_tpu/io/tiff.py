# SPDX-License-Identifier: CECILL-2.1
"""TIFF read/write (host-side codec; parity with reference io/tiff.py:19-133).

save_tiff for 3D stacks writes one frame per file — implementing the
documented intent rather than the reference's bug of re-writing the whole
converted array per slice (io/tiff.py:129-133, SURVEY §2.12.1).
"""
from __future__ import annotations

import os
from collections.abc import Sequence
from pathlib import Path

import numpy as np
from PIL import Image

from ..utils.dtype import to_uint16

__all__ = ["read_tiff", "save_tiff"]


def _read_one(path: str) -> np.ndarray:
    if os.environ.get("BARC4DIP_TPU_NATIVE_IO", "").strip().lower() in (
        "1", "true", "yes", "on",
    ):
        from .native import native_available, read_tiff_native

        if native_available():
            try:
                return read_tiff_native(path)
            except OSError:
                pass  # compressed/non-baseline layouts fall back to PIL
    with Image.open(path) as img:
        return np.array(img)


def read_tiff(image_path: str | Sequence[str]) -> np.ndarray:
    """Read one TIFF (2D) or a sequence of TIFFs stacked along axis 0.

    With ``BARC4DIP_TPU_NATIVE_IO=1`` baseline uncompressed grayscale files
    route through the C++ codec (native/dipio.cpp); anything else falls
    back to PIL transparently.
    """
    if isinstance(image_path, str):
        return _read_one(image_path)

    if isinstance(image_path, Sequence):
        if len(image_path) == 0:
            raise ValueError("got an empty image_path sequence")

        frames: list[np.ndarray] = []
        ref_shape: tuple[int, ...] | None = None
        for path in image_path:
            if not isinstance(path, str):
                raise TypeError("image_path entries must all be path strings")
            arr = _read_one(path)
            if ref_shape is None:
                ref_shape = arr.shape
            elif arr.shape != ref_shape:
                raise ValueError(
                    f"Inconsistent image shapes in stack: "
                    f"expected {ref_shape}, got {arr.shape} for '{path}'"
                )
            frames.append(arr)
        return np.stack(frames, axis=0)

    raise TypeError("image_path should be one path string or a sequence of them")


def save_tiff(data: np.ndarray, output_path: str | Path) -> None:
    """Save a 2D image as one TIFF, or a 3D stack as '<stem>_%04d.tif' files.

    Data is converted to uint16 via :func:`barc4dip_tpu.utils.to_uint16`.
    """
    if not isinstance(data, np.ndarray):
        raise TypeError("expected a numpy.ndarray to write")
    if data.ndim not in (2, 3):
        raise ValueError(f"data must be 2D or 3D, got ndim={data.ndim}")

    out = Path(output_path)
    if out.name == "":
        raise ValueError("output_path needs a file name component")
    if not out.parent.exists():
        raise OSError(f"cannot write here - parent directory does not exist: {out.parent}")
    if not out.parent.is_dir():
        raise OSError(f"cannot write here - parent path is not a directory: {out.parent}")

    suffix = out.suffix.lower()
    if suffix not in {".tif", ".tiff"}:
        suffix = ".tif"

    img_u16 = to_uint16(data)

    if data.ndim == 2:
        try:
            Image.fromarray(img_u16).save(out.with_suffix(suffix))
        except OSError as e:
            raise OSError(f"could not write TIFF file {out}") from e
        return

    base = out.with_suffix("")
    for i in range(data.shape[0]):
        frame_path = base.parent / f"{base.name}_{i:04d}{suffix}"
        try:
            Image.fromarray(img_u16[i]).save(frame_path)
        except OSError as e:
            raise OSError(f"could not write TIFF file {frame_path}") from e
