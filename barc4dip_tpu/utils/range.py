# SPDX-License-Identifier: CECILL-2.1
"""Robust (min, max) range estimation.

Parity with reference utils/range.py:14-78. The median prefilter runs as a
fused device kernel (ops/rank.py) instead of scipy.ndimage.median_filter.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rank import median_filter2d

__all__ = [
    "filtered_minmax_range",
    "percentile_minmax_range",
    "filtered_minmax_range_streaming",
]


@partial(jax.jit, static_argnames=("size",))
def _median_minmax(x, *, size: int):
    ref = median_filter2d(x.astype(jnp.float32), size=size)
    return jnp.nanmin(ref), jnp.nanmax(ref)


def filtered_minmax_range(image, size: int = 3) -> tuple[float, float]:
    """(vmin, vmax) of a median-filtered copy (salt & pepper suppression).

    For 3D stacks the filter is spatial-only (size applied in y/x).
    """
    img = jnp.asarray(image)
    if img.ndim not in (2, 3):
        raise ValueError(f"Expected 2D or 3D array, got ndim={img.ndim}")

    vmin, vmax = _median_minmax(img, size=int(size))
    vmin, vmax = float(vmin), float(vmax)
    if not np.isfinite(vmin) or not np.isfinite(vmax) or vmax <= vmin:
        raise ValueError(f"Invalid range after filtering: vmin={vmin}, vmax={vmax}")
    return vmin, vmax


@partial(jax.jit, static_argnames=("p_low", "p_high"))
def _nanpct(x, *, p_low, p_high):
    from ..ops.quantile import nanpercentiles_exact

    return nanpercentiles_exact(x, (p_low, p_high))


def percentile_minmax_range(
    image, p_low: float = 0.05, p_high: float = 99.95
) -> tuple[float, float]:
    """Global nan-aware percentile range across all pixels (sort-free)."""
    arr = jnp.asarray(image)
    if not jnp.issubdtype(arr.dtype, jnp.floating):
        from ..config import default_float

        arr = arr.astype(default_float())
    q = _nanpct(arr, p_low=float(p_low), p_high=float(p_high))
    return float(q[0]), float(q[1])


def filtered_minmax_range_streaming(image, size: int = 3) -> tuple[float, float]:
    """Per-frame median-filter robust bounds, streamed over frames.

    Same result as :func:`filtered_minmax_range` (the spatial-only filter
    makes frame-at-a-time equivalent); kept for API parity and for stacks too
    large to hold on-device at once.
    """
    img = jnp.asarray(image)
    if img.ndim == 2:
        return filtered_minmax_range(img, size=size)
    if img.ndim != 3:
        raise ValueError(f"Expected 2D or 3D array, got ndim={img.ndim}")

    vmin, vmax = np.inf, -np.inf
    for i in range(img.shape[0]):
        lo, hi = _median_minmax(img[i], size=int(size))
        vmin = min(vmin, float(lo))
        vmax = max(vmax, float(hi))
    if not np.isfinite(vmin) or not np.isfinite(vmax) or vmax <= vmin:
        raise ValueError(f"Invalid range after filtering: vmin={vmin}, vmax={vmax}")
    return float(vmin), float(vmax)
