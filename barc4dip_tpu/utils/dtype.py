# SPDX-License-Identifier: CECILL-2.1
"""dtype conversions (uint16 detector range).

Parity with reference utils/dtype.py:15-85: the counts-vs-normalized
heuristic (mean > counts_threshold => clip; else contrast-stretch to
``65535 * scaling`` using the median-filtered robust range widened by 5%).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .range import filtered_minmax_range

__all__ = ["to_uint16", "round_uint16_bounds"]


@jax.jit
def _clip_u16(x):
    return jnp.clip(x, 0, 65535).astype(jnp.uint16)


@jax.jit
def _stretch_u16(x, vmin, inv):
    y = (x.astype(jnp.float32) - vmin) * inv
    return jnp.clip(y, 0.0, 65535.0).astype(jnp.uint16)


def to_uint16(
    data,
    *,
    median_size: int = 3,
    counts_threshold: float = 10.0,
    scaling: float = 1 / np.sqrt(2),
):
    """Convert a 2D image or 3D stack to uint16 (device-accelerated).

    Count-valued data (mean > counts_threshold) is clipped; normalized data
    is contrast-stretched to ``65535 * scaling`` via the robust filtered
    range (vmin*0.95, vmax/0.95).
    """
    arr = jnp.asarray(data)
    if arr.dtype == jnp.uint16:
        return np.asarray(arr)
    if arr.ndim not in (2, 3):
        raise ValueError(f"Expected 2D or 3D array, got ndim={arr.ndim}")

    m = float(jnp.nanmean(arr.astype(jnp.float32)))

    if m > counts_threshold:
        return np.asarray(_clip_u16(arr))

    vmin, vmax = filtered_minmax_range(arr, size=median_size)
    vmin *= 0.95
    vmax /= 0.95
    inv = 65535 * scaling / (vmax - vmin)
    return np.asarray(_stretch_u16(arr, jnp.float32(vmin), jnp.float32(inv)))


def round_uint16_bounds(vmin: float, vmax: float, k: float = 1000) -> tuple[int, int]:
    """Round (vmin floored, vmax ceiled) to multiples of k, clipped to
    [0, 65535]."""
    vmin_r = int(np.floor(vmin / k) * k)
    vmax_r = int(np.ceil(vmax / k) * k)
    return max(0, vmin_r), min(65535, vmax_r)
