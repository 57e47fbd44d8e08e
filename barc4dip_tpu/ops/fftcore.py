# SPDX-License-Identifier: CECILL-2.1
"""Shifted FFT / PSD device primitives.

Conventions match the reference signal layer (reference signal/fft.py:7-22):
all spectra are fftshifted (DC centered) and frequency axes are shifted to
match. These are pure, jittable, vmap-friendly functions; the physical-units
wrappers live in :mod:`barc4dip_tpu.signal.fft`.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "shifted_freqs",
    "fft1_shifted",
    "ifft1_shifted",
    "fft2_shifted",
    "ifft2_shifted",
    "psd1d_core",
    "psd2d_core",
]


def shifted_freqs(n: int, step: float, dtype=None):
    """fftshift(fftfreq(n, d=step)) — the shifted frequency axis."""
    f = jnp.fft.fftshift(jnp.fft.fftfreq(int(n), d=step))
    if dtype is not None:
        f = f.astype(dtype)
    return f


def fft1_shifted(signal):
    """Shifted complex 1D FFT along the last axis."""
    return jnp.fft.fftshift(jnp.fft.fft(signal, axis=-1), axes=-1)


def ifft1_shifted(F):
    """Inverse of :func:`fft1_shifted` (takes a shifted spectrum)."""
    return jnp.fft.ifft(jnp.fft.ifftshift(F, axes=-1), axis=-1)


def fft2_shifted(image):
    """Shifted complex 2D FFT over the last two axes."""
    return jnp.fft.fftshift(jnp.fft.fft2(image, axes=(-2, -1)), axes=(-2, -1))


def ifft2_shifted(F):
    """Inverse of :func:`fft2_shifted` (takes a shifted spectrum)."""
    return jnp.fft.ifft2(jnp.fft.ifftshift(F, axes=(-2, -1)), axes=(-2, -1))


def psd1d_core(signal, *, step: float = 1.0, scale: bool = True):
    """|FFT|^2 of a 1D signal, shifted; optional physical scaling ``*step/n``.

    Real input takes the rfft fast path (half-spectrum compute, mirrored back)
    — the |F|^2 of a real signal is Hermitian-symmetric.
    """
    n = signal.shape[-1]
    if jnp.iscomplexobj(signal):
        F = jnp.fft.fft(signal, axis=-1)
        P = jnp.abs(F) ** 2
    else:
        Fh = jnp.fft.rfft(signal, axis=-1)
        Ph = jnp.real(Fh) ** 2 + jnp.imag(Fh) ** 2
        P = _mirror_half_spectrum_1d(Ph, n)
    P = jnp.fft.fftshift(P, axes=-1)
    if scale:
        P = P * (step / float(n))
    return P


def psd2d_core(image, *, step_x: float = 1.0, step_y: float = 1.0, scale: bool = True):
    """|FFT2|^2, shifted; optional scaling ``*(dx*dy)/(nx*ny)``.

    Real input uses rfft2 (half the FFT work + exactly real output).
    """
    ny, nx = image.shape[-2], image.shape[-1]
    if jnp.iscomplexobj(image):
        F = jnp.fft.fft2(image, axes=(-2, -1))
        P = jnp.abs(F) ** 2
    else:
        Fh = jnp.fft.rfft2(image, axes=(-2, -1))
        Ph = jnp.real(Fh) ** 2 + jnp.imag(Fh) ** 2
        P = _mirror_half_spectrum_2d(Ph, nx)
    P = jnp.fft.fftshift(P, axes=(-2, -1))
    if scale:
        P = P * ((step_x * step_y) / (float(nx) * float(ny)))
    return P


def _mirror_half_spectrum_1d(Ph, n: int):
    """Rebuild the full |F|^2 from the rfft half spectrum (length n//2+1)."""
    # Full spectrum index k in [0, n): P[k] = Ph[k] for k <= n//2,
    # P[k] = Ph[n - k] otherwise (Hermitian symmetry of real-input FFT).
    if n % 2 == 0:
        tail = Ph[..., 1:-1][..., ::-1]
    else:
        tail = Ph[..., 1:][..., ::-1]
    return jnp.concatenate([Ph, tail], axis=-1)


def _mirror_half_spectrum_2d(Ph, nx: int):
    """Rebuild full |F2|^2 from the rfft2 half spectrum (..., ny, nx//2+1).

    Hermitian symmetry: |F[ky, kx]| = |F[(-ky) % ny, (-kx) % nx]|.
    """
    if nx % 2 == 0:
        tail = Ph[..., :, 1:-1]
    else:
        tail = Ph[..., :, 1:]
    # Mirror kx -> nx - kx AND ky -> (-ky) % ny: flip x, then roll-flip y.
    tail = tail[..., :, ::-1]
    tail = jnp.roll(tail[..., ::-1, :], 1, axis=-2)
    return jnp.concatenate([Ph, tail], axis=-1)
