# SPDX-License-Identifier: CECILL-2.1
"""Synthetic speckle data with known ground truth (extension).

The reference has no data-generation utilities — its examples fetch a
Zenodo dataset — yet every validation task here needs fields whose grain
size, motion, or distortion is known analytically. These generators are
the single implementation used by the test suite, the benchmarks, and the
examples, and they are public because framework users need the same thing
to validate an installation or prototype a pipeline without detector data.

Physics: fully-developed speckle is |smooth complex Gaussian field|².
Low-pass filtering complex white noise with a Gaussian of FWHM
``grain_px`` (in the frequency domain) sets the autocorrelation width —
the ``grain`` metric's lx/ly/leq track ``grain_px`` — and Fourier-shift
theorems give exact subpixel motion for tracking ground truth.
"""
from __future__ import annotations

import os

import numpy as np

__all__ = ["speckle_field", "speckle_stack", "spiral_motion"]


def speckle_field(
    shape: tuple[int, int] = (512, 512),
    *,
    grain_px: float = 6.0,
    mean_counts: float = 1000.0,
    seed: int | np.random.Generator = 0,
    dtype=np.float32,
) -> np.ndarray:
    """One fully-developed speckle pattern with a known grain size [px]."""
    rng = seed if isinstance(seed, np.random.Generator) else np.random.default_rng(seed)
    ny, nx = (int(v) for v in shape)
    a = rng.normal(size=(ny, nx)) + 1j * rng.normal(size=(ny, nx))
    fy = np.fft.fftfreq(ny)[:, None]
    fx = np.fft.fftfreq(nx)[None, :]
    sigma_f = 1.0 / (2.0 * np.pi * (float(grain_px) / 2.355))
    H = np.exp(-(fx**2 + fy**2) / (2.0 * sigma_f**2))
    field = np.abs(np.fft.ifft2(np.fft.fft2(a) * H)) ** 2
    field = field / field.mean() * float(mean_counts)
    return field.astype(dtype)


def spiral_motion(T: int, *, amplitude: float = 0.35, omega: float = 0.7):
    """The ex_04-style spiral trajectory: (dys, dxs) arrays of length T [px]."""
    ts = np.arange(int(T))
    return (
        float(amplitude) * ts * np.cos(ts * float(omega)),
        float(amplitude) * ts * np.sin(ts * float(omega)),
    )


def speckle_stack(
    T: int,
    shape: tuple[int, int] = (512, 512),
    *,
    grain_px: float = 6.0,
    dys=None,
    dxs=None,
    mean_counts: float = 1000.0,
    seed: int | np.random.Generator = 0,
    dtype=np.float32,
) -> np.ndarray:
    """(T, H, W) stack of ONE speckle pattern under known subpixel motion.

    Frame t is the seed pattern Fourier-shifted by (dys[t], dxs[t]) —
    exact periodic translation, so tracking has analytic ground truth.
    Default motion is the ex_04 spiral. ``dtype=np.uint16`` produces
    detector-like integer counts (clipped at 65535).
    """
    rng = seed if isinstance(seed, np.random.Generator) else np.random.default_rng(seed)
    ny, nx = (int(v) for v in shape)
    if dys is None or dxs is None:
        dys, dxs = spiral_motion(T)
    dys = np.asarray(dys, dtype=float)
    dxs = np.asarray(dxs, dtype=float)
    if dys.shape != (int(T),) or dxs.shape != (int(T),):
        raise ValueError(f"dys/dxs must have shape ({T},); got {dys.shape}, {dxs.shape}")

    a = rng.normal(size=(ny, nx)) + 1j * rng.normal(size=(ny, nx))
    fy = np.fft.fftfreq(ny)[:, None]
    fx = np.fft.fftfreq(nx)[None, :]
    sigma_f = 1.0 / (2.0 * np.pi * (float(grain_px) / 2.355))
    H = np.exp(-(fx**2 + fy**2) / (2.0 * sigma_f**2))
    base_F = np.fft.fft2(a) * H

    out = np.empty((int(T), ny, nx), dtype)

    def _one(t: int) -> None:
        phase = np.exp(-2j * np.pi * (fy * dys[t] + fx * dxs[t]))
        field = np.abs(np.fft.ifft2(base_F * phase)) ** 2
        field = field / field.mean() * float(mean_counts)
        if np.issubdtype(np.dtype(dtype), np.integer):
            info = np.iinfo(dtype)
            field = np.clip(field, info.min, info.max)
        out[t] = field

    # Frames are independent (each derives from the shared base_F), and the
    # hot ops (pocketfft, exp) release the GIL — thread the loop for large
    # stacks. Deterministic: every thread writes only its own out[t].
    if int(T) >= 4 and ny * nx >= 512 * 512:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1)) as ex:
            list(ex.map(_one, range(int(T))))
    else:
        for t in range(int(T)):
            _one(t)
    return out
