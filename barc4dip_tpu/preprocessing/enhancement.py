# SPDX-License-Identifier: CECILL-2.1
"""Image enhancement: CLAHE.

Native on-device implementation (contrast-limited adaptive histogram
equalization): per-tile clipped histograms -> CDF lookup tables -> bilinear
blending of the 4 neighbouring tile mappings, all as one jitted program
(replaces the OpenCV C++ kernel behind reference
preprocessing/enhancement.py:14-27).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["clahe"]

_NBINS = 65536  # uint16 dynamic range


@lru_cache(maxsize=16)
def _clahe_program(shape: tuple[int, int], grid: tuple[int, int], nbins: int):
    H, W = shape
    gy, gx = grid
    th, tw = -(-H // gy), -(-W // gx)  # ceil tile sizes
    Hp, Wp = th * gy, tw * gx

    # interpolation geometry (constants)
    yy = np.arange(Hp)
    xx = np.arange(Wp)
    fy = (yy + 0.5) / th - 0.5
    fx = (xx + 0.5) / tw - 0.5
    y0 = np.clip(np.floor(fy).astype(int), 0, gy - 1)
    y1 = np.clip(y0 + 1, 0, gy - 1)
    x0 = np.clip(np.floor(fx).astype(int), 0, gx - 1)
    x1 = np.clip(x0 + 1, 0, gx - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)
    wx = np.clip(fx - x0, 0.0, 1.0)

    def fn(img, clip_limit):
        # pad to full tiles (edge padding, as OpenCV does)
        p = jnp.pad(img, ((0, Hp - H), (0, Wp - W)), mode="edge")
        tiles = p.reshape(gy, th, gx, tw).transpose(0, 2, 1, 3).reshape(gy * gx, th * tw)

        bins = jnp.clip(tiles.astype(jnp.int32), 0, nbins - 1)
        one = jnp.ones_like(bins, dtype=jnp.float32)
        hist = jax.vmap(
            lambda b, o: jnp.zeros(nbins, jnp.float32).at[b].add(o)
        )(bins, one)

        # contrast limiting: clip histogram, redistribute excess uniformly
        limit = jnp.maximum(clip_limit * (th * tw) / nbins, 1.0)
        excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=1, keepdims=True)
        hist = jnp.minimum(hist, limit) + excess / nbins

        cdf = jnp.cumsum(hist, axis=1)
        cdf = cdf / cdf[:, -1:]
        luts = cdf * (nbins - 1)  # (gy*gx, nbins)
        luts = luts.reshape(gy, gx, nbins)

        v = jnp.clip(p.astype(jnp.int32), 0, nbins - 1)

        def lookup(ty_grid, tx_grid):
            return luts[ty_grid[:, None], tx_grid[None, :], v]

        m00 = lookup(jnp.asarray(y0), jnp.asarray(x0))
        m01 = lookup(jnp.asarray(y0), jnp.asarray(x1))
        m10 = lookup(jnp.asarray(y1), jnp.asarray(x0))
        m11 = lookup(jnp.asarray(y1), jnp.asarray(x1))

        wyj = jnp.asarray(wy, jnp.float32)[:, None]
        wxj = jnp.asarray(wx, jnp.float32)[None, :]
        out = (
            (1 - wyj) * ((1 - wxj) * m00 + wxj * m01)
            + wyj * ((1 - wxj) * m10 + wxj * m11)
        )
        return out[:H, :W]

    return jax.jit(fn)


def clahe(
    image: np.ndarray, clip_limit: float = 2.0, tile_grid_size: tuple = (8, 8)
) -> np.ndarray:
    """Contrast Limited Adaptive Histogram Equalization.

    Accepts uint8/uint16 (or integer-valued float) images; returns the
    equalized image in the input dtype.
    """
    img = np.asarray(image)
    if img.ndim != 2:
        raise ValueError("clahe expects a 2D image.")

    if img.dtype == np.uint8:
        nbins = 256
    else:
        nbins = _NBINS

    program = _clahe_program(tuple(img.shape), tuple(int(g) for g in tile_grid_size), nbins)
    out = np.asarray(program(jnp.asarray(img), jnp.float32(clip_limit)))
    if np.issubdtype(img.dtype, np.integer):
        out = np.clip(np.rint(out), 0, nbins - 1).astype(img.dtype)
    return out
