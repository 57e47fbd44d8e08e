# SPDX-License-Identifier: CECILL-2.1
"""ESRF-style HDF5 image I/O (parity with reference io/h5.py:17-212).

Dataset path convention: ``entry_0000/measurement/data``. Write refuses to
overwrite, uses NX attrs and gzip-4 chunked compression.
"""
from __future__ import annotations

from collections.abc import Sequence
from pathlib import Path

import h5py
import numpy as np

__all__ = ["read_h5", "save_h5", "DATASET_PATH"]

DATASET_PATH = "entry_0000/measurement/data"


def read_h5(image_path: str | Sequence[str], *, image_number: int | None = None) -> np.ndarray:
    """Read one or multiple HDF5 images.

    Single file: 2D dataset -> (H, W); 3D dataset -> (N, H, W), or one frame
    when ``image_number`` is given (negative indices allowed).
    Sequence: 2D datasets stacked, 3D datasets concatenated along axis 0.
    """

    def _read_one(p: str, *, image_number: int | None = None) -> np.ndarray:
        if not isinstance(p, str):
            raise TypeError("image_path entries must all be path strings")
        fp = Path(p)
        if not fp.exists():
            raise FileNotFoundError(f"no such HDF5 file: '{p}'")

        try:
            with h5py.File(fp, "r") as f:
                if DATASET_PATH not in f:
                    raise KeyError(f"missing dataset: '{DATASET_PATH}' in '{p}'")
                dset = f[DATASET_PATH]
                if image_number is None:
                    arr = dset[()]
                else:
                    if dset.ndim != 3:
                        raise ValueError(
                            f"image_number is only valid for 3D datasets (N, H, W); "
                            f"got shape {dset.shape} in '{p}'"
                        )
                    n_frames = int(dset.shape[0])
                    idx = int(image_number)
                    if idx < 0:
                        idx = n_frames + idx
                    if idx < 0 or idx >= n_frames:
                        raise ValueError(
                            f"image_number={image_number} out of bounds for dataset "
                            f"with {n_frames} frames in '{p}'"
                        )
                    arr = dset[idx, :, :]
        except OSError as e:
            raise OSError(f"could not read HDF5 file '{p}'") from e

        arr = np.asarray(arr)
        if arr.ndim not in (2, 3):
            raise ValueError(
                f"Expected 2D or 3D dataset at '{DATASET_PATH}', got shape {arr.shape} in '{p}'"
            )
        return arr

    if isinstance(image_path, str):
        return _read_one(image_path, image_number=image_number)

    if image_number is not None:
        raise ValueError("image_number applies only to a single-file image_path")

    if isinstance(image_path, Sequence):
        if len(image_path) == 0:
            raise ValueError("got an empty image_path sequence")

        arrays = [_read_one(p) for p in image_path]
        ndims = {a.ndim for a in arrays}

        if ndims == {2}:
            ref_shape = arrays[0].shape
            for p, a in zip(image_path, arrays):
                if a.shape != ref_shape:
                    raise ValueError(
                        f"Inconsistent image shapes in stack: expected {ref_shape}, "
                        f"got {a.shape} for '{p}'"
                    )
            return np.stack(arrays, axis=0)

        if ndims == {3}:
            ref_hw = arrays[0].shape[1:]
            for p, a in zip(image_path, arrays):
                if a.shape[1:] != ref_hw:
                    raise ValueError(
                        f"Inconsistent stack shapes: expected (*, {ref_hw}), "
                        f"got {a.shape} for '{p}'"
                    )
            return np.concatenate(arrays, axis=0)

        raise ValueError(f"files disagree on dataset dimensionality: ndims={sorted(ndims)}")

    raise TypeError("image_path should be one path string or a sequence of them")


def save_h5(data: np.ndarray, output_path: str | Path) -> None:
    """Save a 2D image or 3D stack to one HDF5 file (NX attrs, gzip-4,
    chunked). Refuses to overwrite an existing file."""
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

    if out.suffix.lower() not in {".h5", ".hdf5"}:
        out = out.with_suffix(".h5")
    if out.exists():
        raise OSError(f"refusing to overwrite - file already exists: {out}")

    try:
        with h5py.File(out, "x") as f:
            entry = f.require_group("entry_0000")
            meas = entry.require_group("measurement")
            entry.attrs.setdefault("NX_class", "NXentry")
            meas.attrs.setdefault("NX_class", "NXcollection")
            meas.create_dataset(
                "data",
                data=data,
                compression="gzip",
                compression_opts=4,
                chunks=True,
            )
    except OSError as e:
        raise OSError(f"could not write HDF5 file {out}") from e
