# SPDX-License-Identifier: CECILL-2.1
"""FFT-based circular correlation (public API).

Parity with reference signal/corr.py:45-321: circular correlation with
shifted output (zero lag centered), optional mean removal / standardisation,
``normalize in {"none", "peak"}``, and centered lag axes.

Real inputs take the rfft fast path in :mod:`barc4dip_tpu.ops.corrcore`,
making the result exactly real (the reference's imaginary-residual runtime
check is satisfied by construction).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import corrcore
from ..ops.uploadcache import device_resident
from .common import lag_axis_from_step, resolve_step_1d, resolve_steps_2d

__all__ = ["xcorr1d", "autocorr1d", "xcorr2d", "autocorr2d"]

_VALID_NORMALIZE = ("none", "peak")


def _check_normalize(normalize: str) -> str:
    if normalize not in _VALID_NORMALIZE:
        raise ValueError(f"Invalid normalize='{normalize}'. Use 'none' or 'peak'.")
    return normalize


@partial(jax.jit, static_argnames=("remove_mean", "standardize", "normalize"))
def _xc1(a, b, *, remove_mean, standardize, normalize):
    return corrcore.xcorr1d_core(
        a, b, remove_mean=remove_mean, standardize=standardize, normalize=normalize
    )


@partial(jax.jit, static_argnames=("remove_mean", "standardize", "normalize"))
def _xc2(a, b, *, remove_mean, standardize, normalize):
    return corrcore.xcorr2d_core(
        a, b, remove_mean=remove_mean, standardize=standardize, normalize=normalize
    )


@partial(jax.jit, static_argnames=("remove_mean", "standardize", "normalize"))
def _ac2(a, *, remove_mean, standardize, normalize):
    return corrcore.autocorr2d_core(
        a, remove_mean=remove_mean, standardize=standardize, normalize=normalize
    )


def _as_float(a):
    a = device_resident(a)
    if not jnp.issubdtype(a.dtype, jnp.floating) and not jnp.issubdtype(
        a.dtype, jnp.complexfloating
    ):
        from ..config import default_float

        a = a.astype(default_float())
    return a


def xcorr1d(
    a,
    b,
    *,
    x: np.ndarray | None = None,
    dx: float = 1.0,
    remove_mean: bool = True,
    standardize: bool = False,
    normalize: str = "peak",
):
    """Circular cross-correlation of two 1D signals: (corr, xlag)."""
    aa, bb = _as_float(a), _as_float(b)
    if aa.ndim != 1 or bb.ndim != 1:
        raise ValueError("a and b must be 1D arrays.")
    if aa.size != bb.size:
        raise ValueError("a and b must have the same length.")
    _check_normalize(normalize)

    n = int(aa.size)
    step = resolve_step_1d(n=n, x=x, dx=dx, name="x")
    xlag = lag_axis_from_step(n, step)
    corr = _xc1(
        aa, bb, remove_mean=bool(remove_mean), standardize=bool(standardize),
        normalize=str(normalize),
    )
    return corr, xlag


def autocorr1d(
    a,
    *,
    x: np.ndarray | None = None,
    dx: float = 1.0,
    remove_mean: bool = True,
    standardize: bool = False,
    normalize: str = "peak",
):
    """Circular auto-correlation of a 1D signal: (corr, xlag)."""
    return xcorr1d(
        a, a, x=x, dx=dx, remove_mean=remove_mean, standardize=standardize,
        normalize=normalize,
    )


def xcorr2d(
    a,
    b,
    *,
    x: np.ndarray | None = None,
    y: np.ndarray | None = None,
    dx: float = 1.0,
    dy: float = 1.0,
    remove_mean: bool = True,
    standardize: bool = False,
    normalize: str = "peak",
):
    """Circular cross-correlation of two 2D signals: (corr, xlag, ylag)."""
    aa, bb = _as_float(a), _as_float(b)
    if aa.ndim != 2 or bb.ndim != 2:
        raise ValueError("a and b must be 2D arrays.")
    if aa.shape != bb.shape:
        raise ValueError("a and b must have the same shape.")
    _check_normalize(normalize)

    ny, nx = (int(s) for s in aa.shape)
    step_x, step_y = resolve_steps_2d(shape=(ny, nx), x=x, y=y, dx=dx, dy=dy)
    xlag = lag_axis_from_step(nx, step_x)
    ylag = lag_axis_from_step(ny, step_y)
    corr = _xc2(
        aa, bb, remove_mean=bool(remove_mean), standardize=bool(standardize),
        normalize=str(normalize),
    )
    return corr, xlag, ylag


def autocorr2d(
    a,
    *,
    x: np.ndarray | None = None,
    y: np.ndarray | None = None,
    dx: float = 1.0,
    dy: float = 1.0,
    remove_mean: bool = True,
    standardize: bool = False,
    normalize: str = "peak",
):
    """Circular auto-correlation of a 2D signal: (corr, xlag, ylag).

    Exactly real for real input (rfft path). The map is centro-symmetric;
    materialise it with :func:`barc4dip_tpu.signal.pull_centrosymmetric`
    to halve the device->host transfer.
    """
    aa = _as_float(a)
    if aa.ndim != 2:
        raise ValueError("a must be a 2D array.")
    _check_normalize(normalize)

    ny, nx = (int(s) for s in aa.shape)
    step_x, step_y = resolve_steps_2d(shape=(ny, nx), x=x, y=y, dx=dx, dy=dy)
    xlag = lag_axis_from_step(nx, step_x)
    ylag = lag_axis_from_step(ny, step_y)

    if jnp.iscomplexobj(aa):
        corr = _xc2(
            aa, aa, remove_mean=bool(remove_mean), standardize=bool(standardize),
            normalize=str(normalize),
        )
        corr = jnp.real(corr)
    else:
        corr = _ac2(
            aa, remove_mean=bool(remove_mean), standardize=bool(standardize),
            normalize=str(normalize),
        )
    return corr, xlag, ylag
