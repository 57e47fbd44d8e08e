# SPDX-License-Identifier: CECILL-2.1
"""Fused 3x3 stencils (Sobel, Laplace) with SciPy-compatible boundaries.

Parity targets: ``scipy.ndimage.sobel(x, axis, mode="reflect")`` and
``scipy.ndimage.laplace(x, mode="reflect")`` (reference
metrics/sharpness.py:454-455,523). SciPy's "reflect" duplicates the edge
sample — that is ``jnp.pad(mode="symmetric")``.

Implementation: one symmetric pad + 9 shifted views combined with constant
weights. XLA fuses this into a single VPU pass over the image; the squared-sum
reductions used by the sharpness metrics fuse into the same pass, so each
metric is one trip through HBM.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["conv3x3_symmetric", "sobel_x", "sobel_y", "laplace"]

# SciPy sobel: correlate1d([-1, 0, 1]) along the derivative axis,
# correlate1d([1, 2, 1]) along the other.
_SOBEL_X = np.outer([1.0, 2.0, 1.0], [-1.0, 0.0, 1.0])  # derivative along x (axis=1)
_SOBEL_Y = _SOBEL_X.T  # derivative along y (axis=0)
_LAPLACE = np.array([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]])


def conv3x3_symmetric(x, kernel: np.ndarray):
    """Correlate a 2D array with a 3x3 kernel, symmetric (edge-duplicating)
    boundary. ``kernel`` must be a host-side constant."""
    p = jnp.pad(x, ((1, 1), (1, 1)), mode="symmetric")
    H, W = x.shape[-2], x.shape[-1]
    out = None
    for dy in range(3):
        for dx in range(3):
            k = float(kernel[dy, dx])
            if k == 0.0:
                continue
            term = p[..., dy : dy + H, dx : dx + W] * k
            out = term if out is None else out + term
    return out


def sobel_x(x):
    """SciPy-compatible ``sobel(x, axis=1, mode='reflect')``."""
    return conv3x3_symmetric(x, _SOBEL_X)


def sobel_y(x):
    """SciPy-compatible ``sobel(x, axis=0, mode='reflect')``."""
    return conv3x3_symmetric(x, _SOBEL_Y)


def laplace(x):
    """SciPy-compatible ``laplace(x, mode='reflect')``."""
    return conv3x3_symmetric(x, _LAPLACE)
