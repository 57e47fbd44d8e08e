# SPDX-License-Identifier: CECILL-2.1
"""Radial reductions (public API).

Parity with reference maths/radial.py:38-169; device kernels in
:mod:`barc4dip_tpu.ops.radialcore` (compile-time radius plans + fused
gather/segment-sum). Origin: pixel-center coordinates
``x = arange(nx) - nx//2``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import radialcore

__all__ = ["radial_mean_binned", "radial_mean_interpolated"]


@partial(jax.jit, static_argnames=("r_max", "bin_size"))
def _binned(z, *, r_max, bin_size):
    return radialcore.radial_mean_binned_core(z, r_max=r_max, bin_size=bin_size)


@partial(jax.jit, static_argnames=("r_max", "nr", "ntheta", "fill_value"))
def _interp(z, *, r_max, nr, ntheta, fill_value):
    return radialcore.radial_mean_interpolated_core(
        z, r_max=r_max, nr=nr, ntheta=ntheta, fill_value=fill_value
    )


def _validate(z):
    is_host = isinstance(z, np.ndarray)
    arr = z
    z = jnp.asarray(z)
    if not jnp.issubdtype(z.dtype, jnp.floating):
        from ..config import default_float

        z = z.astype(default_float())
    if z.ndim != 2:
        raise ValueError("signal_2d must be a 2D array.")
    # host inputs: cheap local check; device inputs: scalar reduction on
    # device (a full-map download just to validate would dominate runtime)
    finite = np.all(np.isfinite(arr)) if is_host else jnp.isfinite(z).all()
    if not bool(finite):
        raise ValueError("signal_2d contains non-finite values.")
    return z


def radial_mean_binned(signal_2d, *, r_max: float | None = None, bin_size: float = 1.0):
    """Radial mean by annular binning: (radial[nbins], r_centers[nbins])."""
    z = _validate(signal_2d)
    return _binned(z, r_max=None if r_max is None else float(r_max), bin_size=float(bin_size))


def radial_mean_interpolated(
    signal_2d,
    *,
    r_max: float | None = None,
    nr: int | None = None,
    ntheta: int | None = None,
    fill_value: float = 0.0,
):
    """Radial mean via polar resampling + bilinear interpolation: (radial, r)."""
    z = _validate(signal_2d)
    return _interp(
        z,
        r_max=None if r_max is None else float(r_max),
        nr=None if nr is None else int(nr),
        ntheta=None if ntheta is None else int(ntheta),
        fill_value=float(fill_value),
    )
