# SPDX-License-Identifier: CECILL-2.1
"""FFT and power spectral density helpers (public API).

Conventions (parity with reference signal/fft.py:7-22):
- 2D arrays use NumPy shape (ny, nx), axes (y, x).
- FFT outputs are always shifted (DC centered) via fftshift.
- Frequency axes are shifted to match; cycles/pixel without calibration,
  cycles/unit with dx/dy or explicit x/y axes.

These are thin host wrappers over :mod:`barc4dip_tpu.ops.fftcore`; the actual
transforms run jitted on the accelerator and return JAX arrays (use
``np.asarray`` to materialise on the host).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fftcore
from ..ops.uploadcache import device_resident
from .common import resolve_step_1d, resolve_steps_2d

__all__ = [
    "freq_axis1d",
    "freq_axes2d",
    "fft1d",
    "ifft1d",
    "psd1d",
    "fft2d",
    "ifft2d",
    "psd2d",
]


def freq_axis1d(*, n: int, x: np.ndarray | None = None, dx: float = 1.0) -> np.ndarray:
    """Shifted 1D frequency axis (length n), cycles per unit."""
    if n < 1:
        raise ValueError("n must be >= 1.")
    step = resolve_step_1d(n=n, x=x, dx=dx, name="x")
    return np.fft.fftshift(np.fft.fftfreq(int(n), d=step))


def freq_axes2d(
    *,
    shape: tuple[int, int],
    x: np.ndarray | None = None,
    y: np.ndarray | None = None,
    dx: float = 1.0,
    dy: float = 1.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Shifted 2D frequency axes (fx of length nx, fy of length ny)."""
    ny, nx = shape
    if ny < 1 or nx < 1:
        raise ValueError("shape must contain positive integers.")
    step_x, step_y = resolve_steps_2d(shape=shape, x=x, y=y, dx=dx, dy=dy)
    fx = np.fft.fftshift(np.fft.fftfreq(int(nx), d=step_x))
    fy = np.fft.fftshift(np.fft.fftfreq(int(ny), d=step_y))
    return fx, fy


@jax.jit
def _fft1(s):
    return fftcore.fft1_shifted(s)


@jax.jit
def _ifft1(F):
    return fftcore.ifft1_shifted(F)


@jax.jit
def _fft2(img):
    return fftcore.fft2_shifted(img)


@jax.jit
def _ifft2(F):
    return fftcore.ifft2_shifted(F)


@partial(jax.jit, static_argnames=("step", "scale"))
def _psd1(s, *, step, scale):
    return fftcore.psd1d_core(s, step=step, scale=scale)


@partial(jax.jit, static_argnames=("step_x", "step_y", "scale"))
def _psd2(img, *, step_x, step_y, scale):
    return fftcore.psd2d_core(img, step_x=step_x, step_y=step_y, scale=scale)


def fft1d(signal, *, x: np.ndarray | None = None, dx: float = 1.0):
    """Shifted 1D FFT and its shifted frequency axis: (F, fx)."""
    s = jnp.asarray(signal)
    if s.ndim != 1:
        raise ValueError("signal must be a 1D array.")
    fx = freq_axis1d(n=int(s.size), x=x, dx=dx)
    return _fft1(s), fx


def ifft1d(F):
    """Inverse 1D FFT from a shifted spectrum."""
    F = jnp.asarray(F)
    if F.ndim != 1:
        raise ValueError("F must be a 1D array.")
    return _ifft1(F)


def psd1d(signal, *, x: np.ndarray | None = None, dx: float = 1.0, scale: bool = True):
    """Shifted 1D PSD: (P, fx). ``scale=True`` applies ``P *= dx/n``."""
    s = jnp.asarray(signal)
    if s.ndim != 1:
        raise ValueError("signal must be a 1D array.")
    n = int(s.size)
    step = resolve_step_1d(n=n, x=x, dx=dx, name="x")
    fx = freq_axis1d(n=n, x=x, dx=dx)
    return _psd1(s, step=float(step), scale=bool(scale)), fx


def fft2d(
    image,
    *,
    x: np.ndarray | None = None,
    y: np.ndarray | None = None,
    dx: float = 1.0,
    dy: float = 1.0,
):
    """Shifted 2D FFT and shifted frequency axes: (F, fx, fy)."""
    img = device_resident(image)
    if img.ndim != 2:
        raise ValueError("image must be a 2D array.")
    ny, nx = img.shape
    fx, fy = freq_axes2d(shape=(int(ny), int(nx)), x=x, y=y, dx=dx, dy=dy)
    return _fft2(img), fx, fy


def ifft2d(F):
    """Inverse 2D FFT from a shifted spectrum."""
    F = jnp.asarray(F)
    if F.ndim != 2:
        raise ValueError("F must be a 2D array.")
    return _ifft2(F)


def psd2d(
    image,
    *,
    x: np.ndarray | None = None,
    y: np.ndarray | None = None,
    dx: float = 1.0,
    dy: float = 1.0,
    scale: bool = True,
):
    """Shifted 2D PSD: (P, fx, fy). ``scale=True`` applies
    ``P *= (dx*dy)/(nx*ny)``.

    P is returned device-resident; for real input it is centro-symmetric,
    so materialise it with :func:`barc4dip_tpu.signal.pull_centrosymmetric`
    to halve the device->host transfer (``np.asarray`` pulls it whole)."""
    img = device_resident(image)
    if img.ndim != 2:
        raise ValueError("image must be a 2D array.")
    ny, nx = img.shape
    step_x, step_y = resolve_steps_2d(shape=(int(ny), int(nx)), x=x, y=y, dx=dx, dy=dy)
    fx, fy = freq_axes2d(shape=(int(ny), int(nx)), x=x, y=y, dx=dx, dy=dy)
    P = _psd2(img, step_x=float(step_x), step_y=float(step_y), scale=bool(scale))
    return P, fx, fy
