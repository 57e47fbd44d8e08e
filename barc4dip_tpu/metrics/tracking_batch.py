# SPDX-License-Identifier: CECILL-2.1
"""Shared geometry helpers for batched stack tracking.

The actual chunked tracking programs live in :mod:`.stack_fused`, which
runs per-frame metrics and the 18-correlation tracker against one uploaded
device chunk (reference behavior: metrics/speckles.py:347-415 tracks with
18*T sequential full-frame template matches).  This module keeps the pieces
shared by tracking programs and tests: turning a 3x3 ROI slice grid into
static start/center geometry, and the static-position tile gather.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["_grid_geometry", "_extract_tiles"]


def _grid_geometry(grid_slices) -> tuple[np.ndarray, np.ndarray, int]:
    """Extract (starts (9,2), centers (9,2), roi_side) from a 3x3 slice grid."""
    starts = []
    centers = []
    sides = set()
    for iy in range(3):
        for ix in range(3):
            sy, sx = grid_slices[iy, ix]
            starts.append((sy.start, sx.start))
            centers.append(
                ((sy.start + sy.stop - 1) / 2.0, (sx.start + sx.stop - 1) / 2.0)
            )
            sides.add((sy.stop - sy.start, sx.stop - sx.start))
    if len(sides) != 1:
        raise ValueError("All grid ROIs must share one shape.")
    (sh, sw), = sides
    if sh != sw:
        raise ValueError("Grid ROIs must be square.")
    return np.asarray(starts, np.int32), np.asarray(centers, np.float64), int(sh)


def _extract_tiles(frame, starts: np.ndarray, s: int):
    """Gather the 9 (s, s) tiles at static start positions."""
    return jnp.stack(
        [frame[y0 : y0 + s, x0 : x0 + s] for (y0, x0) in starts]
    )
