# SPDX-License-Identifier: CECILL-2.1
"""ROI slice construction (host-side shape logic).

In the TPU-native design these helpers run on the host at trace time: ROI
slices, 3x3 grids and embedding offsets are compile-time constants that
parameterise statically-shaped device programs.

Behavioural parity with reference geometry/roi.py:9,44,109,175 (odd sizes,
clip-or-raise semantics, NW..SE row-major grid labels).
"""
from __future__ import annotations

import math

import numpy as np

__all__ = ["odd_size", "roi_slices", "roi_grid_3x3", "embed_roi"]


def odd_size(n: float | int, *, min_size: int = 3) -> int:
    """Smallest odd integer >= ceil(n), at least ``min_size``."""
    if not math.isfinite(n):
        raise ValueError("n must be finite.")
    if min_size < 1:
        raise ValueError("min_size must be >= 1.")

    size = max(int(math.ceil(n)), int(min_size))
    if size % 2 == 0:
        size += 1
    return size


def roi_slices(
    image_shape: tuple[int, int],
    size_yx: tuple[int, int],
    *,
    center_yx: tuple[int, int] | None = None,
    clip: bool = False,
) -> tuple[slice, slice]:
    """Slices of an odd-sized ROI around ``center_yx`` (default image center).

    With ``clip=False`` raises if the ROI exceeds bounds; with ``clip=True``
    the ROI is clipped (and may shrink).
    """
    H, W = image_shape
    size_y, size_x = size_yx

    if size_y <= 0 or size_x <= 0:
        raise ValueError("ROI sizes must be positive.")
    if size_y % 2 == 0 or size_x % 2 == 0:
        raise ValueError("ROI sizes must be odd for symmetry.")

    if center_yx is None:
        cy, cx = (H // 2, W // 2)
    else:
        cy, cx = center_yx

    hy, hx = size_y // 2, size_x // 2
    y0, y1 = int(cy) - hy, int(cy) + hy + 1
    x0, x1 = int(cx) - hx, int(cx) + hx + 1

    if not clip:
        if y0 < 0 or y1 > H or x0 < 0 or x1 > W:
            raise ValueError("ROI exceeds image bounds.")
    else:
        # clamp BOTH endpoints into [0, bound]: a center fully outside the
        # image yields an empty ordered slice at the nearest edge instead of
        # an inverted slice (reference quirk at geometry/roi.py:100-103;
        # documented intent is "clipped to image bounds")
        y0, y1 = min(max(0, y0), H), min(max(0, y1), H)
        x0, x1 = min(max(0, x0), W), min(max(0, x1), W)

    return slice(y0, y1), slice(x0, x1)


def roi_grid_3x3(
    image_shape: tuple[int, int],
    roi_size_yx: tuple[int, int],
    step_yx: tuple[int, int],
    *,
    center_yx: tuple[int, int] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """3x3 grid of ROI slices around a center; row-major NW..SE labels."""
    H, W = image_shape
    if center_yx is None:
        center_yx = (H // 2, W // 2)

    step_y, step_x = step_yx
    offsets_y = (-step_y, 0, step_y)
    offsets_x = (-step_x, 0, step_x)

    slices = np.empty((3, 3), dtype=object)
    for i, dy in enumerate(offsets_y):
        for j, dx in enumerate(offsets_x):
            cy = center_yx[0] + dy
            cx = center_yx[1] + dx
            slices[i, j] = roi_slices(
                image_shape, roi_size_yx, center_yx=(int(cy), int(cx)), clip=False
            )

    labels = np.array(
        [["NW", "N", "NE"], ["W", "C", "E"], ["SW", "S", "SE"]], dtype=object
    )
    return slices, labels


def embed_roi(
    roi,
    *,
    out_shape: tuple[int, int],
    slices_yx: tuple[slice, slice],
    fill_value: float = 0.0,
    dtype=None,
):
    """Embed a 2D ROI into a full-size array at ``slices_yx``.

    Works for both NumPy and JAX arrays: for JAX inputs this lowers to a
    statically-shaped pad (fusable under jit); for NumPy it allocates + writes.
    """
    H, W = out_shape
    sy, sx = slices_yx

    expected_shape = (sy.stop - sy.start, sx.stop - sx.start)
    if tuple(roi.shape) != expected_shape:
        raise ValueError("ROI shape does not match target slice dimensions.")

    if isinstance(roi, np.ndarray):
        out_dtype = roi.dtype if dtype is None else dtype
        out = np.full((H, W), fill_value, dtype=out_dtype)
        out[sy, sx] = roi
        return out

    import jax.numpy as jnp  # local import keeps this module numpy-light

    arr = roi if dtype is None else roi.astype(dtype)
    pad = ((sy.start, H - sy.stop), (sx.start, W - sx.stop))
    return jnp.pad(arr, pad, mode="constant", constant_values=fill_value)
