# SPDX-License-Identifier: CECILL-2.1
"""Optical distortion correction.

The reference declares this capability but ships an empty stub
(preprocessing/distortion.py, 0 LoC; SURVEY §2.8). This module implements it
natively: a Brown-Conrady radial/tangential model resampled through one
bilinear gather on-device — the standard detector-optics correction for
scintillator/lens systems.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["correct_distortion", "distortion_map"]


@lru_cache(maxsize=16)
def _warp_plan(
    shape: tuple[int, int],
    k1: float,
    k2: float,
    k3: float,
    p1: float,
    p2: float,
    center: tuple[float, float] | None,
):
    """Source sampling coordinates for undistorting an (H, W) image."""
    H, W = shape
    cy, cx = center if center is not None else ((H - 1) / 2.0, (W - 1) / 2.0)
    norm = max(cy, cx, 1.0)

    yy, xx = np.meshgrid(np.arange(H, dtype=np.float64), np.arange(W, dtype=np.float64), indexing="ij")
    y = (yy - cy) / norm
    x = (xx - cx) / norm
    r2 = x * x + y * y

    radial = 1.0 + k1 * r2 + k2 * r2**2 + k3 * r2**3
    x_d = x * radial + 2.0 * p2 * x * y + p1 * (r2 + 2.0 * x * x)
    y_d = y * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * y * y)

    src_y = y_d * norm + cy
    src_x = x_d * norm + cx

    y0 = np.clip(np.floor(src_y), 0, H - 2).astype(np.int32)
    x0 = np.clip(np.floor(src_x), 0, W - 2).astype(np.int32)
    fy = np.clip(src_y - y0, 0.0, 1.0)
    fx = np.clip(src_x - x0, 0.0, 1.0)
    oob = (src_y < 0) | (src_y > H - 1) | (src_x < 0) | (src_x > W - 1)

    flat00 = (y0 * W + x0).ravel()
    w00 = ((1 - fy) * (1 - fx)).ravel()
    w01 = ((1 - fy) * fx).ravel()
    w10 = (fy * (1 - fx)).ravel()
    w11 = (fy * fx).ravel()
    return flat00, np.stack([w00, w01, w10, w11]), oob.ravel(), (src_y, src_x)


def distortion_map(
    shape: tuple[int, int],
    *,
    k1: float = 0.0,
    k2: float = 0.0,
    k3: float = 0.0,
    p1: float = 0.0,
    p2: float = 0.0,
    center: tuple[float, float] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(src_y, src_x) sampling maps for the given distortion coefficients."""
    *_, (src_y, src_x) = _warp_plan(
        tuple(shape), float(k1), float(k2), float(k3), float(p1), float(p2),
        None if center is None else (float(center[0]), float(center[1])),
    )
    return src_y, src_x


def correct_distortion(
    image,
    *,
    k1: float = 0.0,
    k2: float = 0.0,
    k3: float = 0.0,
    p1: float = 0.0,
    p2: float = 0.0,
    center: tuple[float, float] | None = None,
    fill_value: float = 0.0,
):
    """Undistort a 2D image or (T, H, W) stack (Brown-Conrady model).

    Radii are normalised by max(cy, cx); positive k1 corrects barrel
    distortion. Out-of-bounds samples take ``fill_value``.
    """
    img = jnp.asarray(image)
    if img.ndim not in (2, 3):
        raise ValueError("image must be 2D or 3D (stack).")
    H, W = (int(s) for s in img.shape[-2:])

    warp = _warp_program(
        (H, W), float(k1), float(k2), float(k3), float(p1), float(p2),
        None if center is None else (float(center[0]), float(center[1])),
        float(fill_value),
    )
    return warp(img if jnp.issubdtype(img.dtype, jnp.floating) else img.astype(jnp.float32))


@lru_cache(maxsize=32)
def _warp_program(shape, k1, k2, k3, p1, p2, center, fill_value):
    """Cached jitted warp per (shape, coefficients): a fresh closure per
    call would retrace and recompile the gather program every frame."""
    H, W = shape
    flat00, w, oob, _ = _warp_plan(shape, k1, k2, k3, p1, p2, center)

    @jax.jit
    def warp(x):
        flat = x.reshape(x.shape[:-2] + (-1,))
        i00 = jnp.asarray(flat00)
        corners = jnp.stack(
            [flat[..., i00], flat[..., i00 + 1], flat[..., i00 + W], flat[..., i00 + W + 1]],
            axis=0,
        )
        wj = jnp.asarray(w, dtype=corners.dtype)
        if corners.ndim == 3:  # stack: (4, T, npix)
            wj = wj[:, None, :]
        vals = jnp.sum(corners * wj, axis=0)
        vals = jnp.where(jnp.asarray(oob), jnp.asarray(fill_value, vals.dtype), vals)
        return vals.reshape(x.shape)

    return warp
