# SPDX-License-Identifier: CECILL-2.1
"""Radial reductions on the pixel grid.

Parity with reference maths/radial.py:38-169. The pixel-center origin
convention is ``x = arange(nx) - nx//2`` (radial.py:31-35).

TPU-native design: because shapes are static under jit, the radius field,
bin ids and polar sample coordinates are *compile-time constants* (NumPy,
computed once per shape and cached). Binned means become a gather into
bin-sorted order + a sorted segment-sum; interpolated means become one
bilinear gather. Both are single-pass, fully fused device programs.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import ops as jops

__all__ = [
    "radial_mean_binned_core",
    "radial_mean_interpolated_core",
    "binned_plan",
    "interpolated_plan",
]


def _pixel_axes(shape: tuple[int, int]) -> tuple[np.ndarray, np.ndarray]:
    ny, nx = shape
    x = np.arange(nx, dtype=np.float64) - (nx // 2)
    y = np.arange(ny, dtype=np.float64) - (ny // 2)
    return x, y


def _inscribed_rmax(shape: tuple[int, int]) -> float:
    x, y = _pixel_axes(shape)
    return min(float(np.max(np.abs(x))), float(np.max(np.abs(y))))


@lru_cache(maxsize=64)
def binned_plan(shape: tuple[int, int], r_max: float | None, bin_size: float):
    """Compile-time plan for annular binning on a fixed shape.

    Returns (order, ids_sorted, counts, nbins, r_centers) as NumPy constants:
    ``order`` gathers the flattened image into bin-sorted order restricted to
    pixels with bin < nbins; ``counts`` are per-bin pixel counts.
    """
    ny, nx = shape
    x, y = _pixel_axes(shape)
    if r_max is None:
        r_max = _inscribed_rmax(shape)
    if r_max <= 0:
        raise ValueError("r_max must be > 0 (or leave it as None with valid shape).")
    if bin_size <= 0:
        raise ValueError("bin_size must be > 0.")

    Y, X = np.meshgrid(y, x, indexing="ij")
    R = np.sqrt(X * X + Y * Y)

    nbins = int(np.floor(r_max / bin_size)) + 1
    bin_idx = np.floor(R / bin_size).astype(np.int64).ravel()

    keep = np.nonzero(bin_idx < nbins)[0]
    ids = bin_idx[keep]
    order = keep[np.argsort(ids, kind="stable")]
    ids_sorted = bin_idx[order].astype(np.int32)
    counts = np.bincount(ids_sorted, minlength=nbins).astype(np.float64)

    r_centers = (np.arange(nbins, dtype=np.float64) + 0.5) * float(bin_size)
    return order.astype(np.int32), ids_sorted, counts, nbins, r_centers


def radial_mean_binned_core(
    signal_2d, *, r_max: float | None = None, bin_size: float = 1.0
):
    """Annular-bin radial mean. Returns (radial[nbins], r_centers[nbins]).

    Bins with zero pixels yield NaN (reference maths/radial.py:94-96).
    """
    shape = tuple(int(s) for s in signal_2d.shape[-2:])
    order, ids_sorted, counts, nbins, r_centers = binned_plan(
        shape, None if r_max is None else float(r_max), float(bin_size)
    )

    vals = signal_2d.reshape(signal_2d.shape[:-2] + (-1,))[..., order]
    sums = jops.segment_sum(
        vals.T if vals.ndim > 1 else vals,
        jnp.asarray(ids_sorted),
        num_segments=nbins,
        indices_are_sorted=True,
    )
    if vals.ndim > 1:
        sums = sums.T

    counts_j = jnp.asarray(counts, dtype=sums.dtype)
    radial = jnp.where(counts_j > 0, sums / jnp.where(counts_j > 0, counts_j, 1.0), jnp.nan)
    return radial, jnp.asarray(r_centers, dtype=radial.dtype)


@lru_cache(maxsize=64)
def interpolated_plan(
    shape: tuple[int, int],
    r_max: float | None,
    nr: int | None,
    ntheta: int | None,
):
    """Compile-time plan for polar resampling: integer corner gather indices,
    bilinear weights and the out-of-bounds mask (RegularGridInterpolator
    semantics: any point outside the grid extent takes ``fill_value``).
    """
    ny, nx = shape
    x, y = _pixel_axes(shape)
    if r_max is None:
        r_max = _inscribed_rmax(shape)
    if r_max <= 0:
        raise ValueError("r_max must be > 0 (or leave it as None with valid shape).")
    if nr is None:
        nr = int(np.floor(r_max)) + 1
    if ntheta is None:
        ntheta = int(2.0 * np.pi * 180.0)  # ~1 degree sampling
    if nr <= 1:
        raise ValueError("nr must be > 1.")
    if ntheta <= 3:
        raise ValueError("ntheta must be > 3.")

    r = np.linspace(0.0, r_max, nr)
    theta = np.linspace(0.0, 2.0 * np.pi, ntheta, endpoint=False)
    R_grid, T_grid = np.meshgrid(r, theta, indexing="ij")
    Xs = (R_grid * np.cos(T_grid)).ravel()
    Ys = (R_grid * np.sin(T_grid)).ravel()

    # Physical -> index coordinates (uniform pixel grid, unit spacing).
    xi = Xs - x[0]
    yi = Ys - y[0]

    oob = (Xs < x[0]) | (Xs > x[-1]) | (Ys < y[0]) | (Ys > y[-1])

    x0 = np.clip(np.floor(xi), 0, nx - 2).astype(np.int64)
    y0 = np.clip(np.floor(yi), 0, ny - 2).astype(np.int64)
    fx = np.clip(xi - x0, 0.0, 1.0)
    fy = np.clip(yi - y0, 0.0, 1.0)

    # Flat gather indices of the 4 corners.
    i00 = y0 * nx + x0
    i01 = i00 + 1
    i10 = i00 + nx
    i11 = i10 + 1

    w00 = (1 - fy) * (1 - fx)
    w01 = (1 - fy) * fx
    w10 = fy * (1 - fx)
    w11 = fy * fx

    idx = np.stack([i00, i01, i10, i11], axis=0).astype(np.int32)
    w = np.stack([w00, w01, w10, w11], axis=0)
    return idx, w, oob, (nr, ntheta), r


def radial_mean_interpolated_core(
    signal_2d,
    *,
    r_max: float | None = None,
    nr: int | None = None,
    ntheta: int | None = None,
    fill_value: float = 0.0,
):
    """Polar-resampled radial mean (bilinear, high-definition).

    Returns (radial[nr], r[nr]). Matches SciPy RegularGridInterpolator
    bilinear + out-of-bounds fill semantics (reference maths/radial.py:163-166).
    """
    shape = tuple(int(s) for s in signal_2d.shape[-2:])
    idx, w, oob, (nr_, ntheta_), r = interpolated_plan(
        shape,
        None if r_max is None else float(r_max),
        None if nr is None else int(nr),
        None if ntheta is None else int(ntheta),
    )

    flat = signal_2d.reshape(-1)
    corners = flat[jnp.asarray(idx)]  # (4, npts)
    vals = jnp.sum(corners * jnp.asarray(w, dtype=flat.dtype), axis=0)
    vals = jnp.where(jnp.asarray(oob), jnp.asarray(fill_value, dtype=flat.dtype), vals)
    radial = vals.reshape(nr_, ntheta_).mean(axis=1)
    return radial, jnp.asarray(r, dtype=radial.dtype)
