# SPDX-License-Identifier: CECILL-2.1
"""Geometry helpers: ROI slices, grids, padding, crops (host-side shape logic)."""
from .crop import crop_to_square_center
from .masks import pad_to_square
from .roi import embed_roi, odd_size, roi_grid_3x3, roi_slices

__all__ = [
    "odd_size",
    "roi_slices",
    "roi_grid_3x3",
    "embed_roi",
    "pad_to_square",
    "crop_to_square_center",
]
