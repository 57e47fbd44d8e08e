# SPDX-License-Identifier: CECILL-2.1
"""Public image I/O dispatchers (parity with reference io/rw.py:66-189).

Extension-based routing: read .tif/.tiff/.edf/.h5/.hdf5 (plus .edf.gz/.bz2),
write .tif/.h5; EDF writing is blocked (legacy read-only format).
"""
from __future__ import annotations

from collections.abc import Sequence
from pathlib import Path

import numpy as np

from ..utils import elapsed_time, now
from .edf import read_edf
from .h5 import read_h5, save_h5
from .tiff import read_tiff, save_tiff

__all__ = ["read_image", "write_image"]

_READ_EXTS = {
    "tif": "tiff",
    "tiff": "tiff",
    "edf": "edf",
    "h5": "h5",
    "hdf5": "h5",
}

_WRITE_EXTS = {
    "tif": "tiff",
    "tiff": "tiff",
    "h5": "h5",
    "hdf5": "h5",
    "edf": "edf",  # explicitly blocked
}


def _normalize_extension(ext: str) -> str:
    return ext.lower().lstrip(".")


def _infer_extension_from_path(path: str) -> str:
    name = Path(path).name
    # tolerate compressed EDF (.edf.gz / .edf.bz2)
    low = name.lower()
    if low.endswith((".edf.gz", ".edf.bz2")):
        return "edf"
    suffix = Path(path).suffix
    if suffix == "":
        raise ValueError(
            "Cannot infer file extension from path (no suffix). "
            "Provide file_extension explicitly."
        )
    return _normalize_extension(suffix)


def _infer_extension_from_paths(paths: Sequence[str]) -> str:
    exts = [_infer_extension_from_path(p) for p in paths]
    first = exts[0]
    if any(e != first for e in exts):
        raise ValueError(f"image_path mixes file extensions: {sorted(set(exts))}")
    return first


def read_image(
    image_path: str | Sequence[str],
    *,
    file_extension: str | None = None,
    image_number: int | None = None,
    mean: bool = False,
    verbose: bool = False,
) -> np.ndarray:
    """Read one image or a stack from disk (TIFF / EDF / HDF5 by extension).

    ``image_number`` selects one frame of a 3D HDF5 dataset; ``mean=True``
    collapses a loaded 3D stack to its mean frame.
    """
    t0 = now()
    if isinstance(image_path, str):
        ext = (
            _normalize_extension(file_extension)
            if file_extension
            else _infer_extension_from_path(image_path)
        )
    elif isinstance(image_path, Sequence):
        if len(image_path) == 0:
            raise ValueError("got an empty image_path sequence")
        ext = (
            _normalize_extension(file_extension)
            if file_extension
            else _infer_extension_from_paths(image_path)
        )
    else:
        raise TypeError("image_path should be one path string or a sequence of them")

    if not isinstance(image_path, str) and image_number is not None:
        raise ValueError("image_number applies only to a single-file image_path")

    kind = _READ_EXTS.get(ext)
    if kind is None:
        raise ValueError(f"Unsupported input extension: '{ext}'")

    if kind == "tiff":
        if image_number is not None:
            raise ValueError("image_number applies only to single-file HDF5 stacks (.h5/.hdf5).")
        data = read_tiff(image_path)
    elif kind == "edf":
        if image_number is not None:
            raise ValueError("image_number applies only to single-file HDF5 stacks (.h5/.hdf5).")
        data = read_edf(image_path)
    elif kind == "h5":
        data = read_h5(image_path, image_number=image_number)
    else:  # pragma: no cover - dispatch table is closed
        raise RuntimeError(f"Unhandled reader kind: {kind}")

    if mean and data.ndim == 3:
        data = data.mean(axis=0)
        if verbose:
            print("Collapsed 3D stack to mean image along axis 0.")

    if verbose:
        if data.ndim == 2:
            n_img = 1
            h, w = data.shape
        else:
            n_img, h, w = data.shape
        mem_gb = data.nbytes / (1024**3)
        print(f"> {n_img} image(s) ({h} x {w}), {mem_gb:.2f} Gb in memory")
        elapsed_time(t0)

    return data


def write_image(
    data: np.ndarray,
    output_path: str | Path,
    *,
    file_extension: str | None = None,
    verbose: bool = False,
) -> None:
    """Write an image or stack to disk (TIFF / HDF5 by extension)."""
    if not isinstance(data, np.ndarray):
        raise TypeError("expected a numpy.ndarray to write")

    out = Path(output_path)
    ext = (
        _normalize_extension(file_extension)
        if file_extension
        else _infer_extension_from_path(str(out))
    )
    kind = _WRITE_EXTS.get(ext)

    if kind is None:
        raise ValueError(f"Unsupported output extension: '{ext}'")
    if kind == "edf":
        raise ValueError("Writing EDF is not supported (legacy read-only format).")

    if kind == "tiff":
        save_tiff(data, out)
    elif kind == "h5":
        save_h5(data, out)
    else:  # pragma: no cover - dispatch table is closed
        raise RuntimeError(f"Unhandled writer kind: {kind}")

    if verbose:
        print(f"Data written successfully to '{out}'")
