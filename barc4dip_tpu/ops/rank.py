# SPDX-License-Identifier: CECILL-2.1
"""Rank filters (median) on-device.

Parity target: ``scipy.ndimage.median_filter(x, size=k, mode="reflect")``
(reference preprocessing/normalize.py:136, utils/range.py:36,71,78). SciPy's
"reflect" duplicates edges -> ``jnp.pad(mode="symmetric")``.

Implementation: gather the k*k shifted windows into a leading axis and take
the median. For the 3x3 default this is 9 fused shifted adds + an O(9 log 9)
sorting network on the VPU — one HBM pass, no host round-trip.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["median_filter2d"]


def median_filter2d(x, size: int = 3):
    """Median filter over the last two axes with an odd square window.

    On TPU backends the 2D 3x3 float case routes through the Pallas
    sorting-network kernel (ops/pallas_median.py) — one HBM pass instead of
    a materialised 9-window stack + sort.
    """
    k = int(size)
    if k < 1 or k % 2 == 0:
        raise ValueError("size must be a positive odd integer.")
    if k == 1:
        return x

    if k == 3 and x.ndim == 2 and x.dtype in (jnp.float32, jnp.bfloat16):
        from .pallas_median import median3x3_pallas, pallas_supported

        if pallas_supported():
            return median3x3_pallas(x)

    h = k // 2
    pad = [(0, 0)] * (x.ndim - 2) + [(h, h), (h, h)]
    p = jnp.pad(x, pad, mode="symmetric")
    H, W = x.shape[-2], x.shape[-1]

    windows = [
        p[..., dy : dy + H, dx : dx + W] for dy in range(k) for dx in range(k)
    ]
    stacked = jnp.stack(windows, axis=0)
    return jnp.median(stacked, axis=0)
