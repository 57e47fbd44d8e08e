# SPDX-License-Identifier: CECILL-2.1
"""Foundation utilities: dtype conversion, robust ranges, timing."""
from .dtype import round_uint16_bounds, to_uint16
from .range import (
    filtered_minmax_range,
    filtered_minmax_range_streaming,
    percentile_minmax_range,
)
from .synthetic import speckle_field, speckle_stack, spiral_motion
from .time import elapsed_time, now, progress_done, progress_update

__all__ = [
    "speckle_field",
    "speckle_stack",
    "spiral_motion",
    "to_uint16",
    "round_uint16_bounds",
    "filtered_minmax_range",
    "percentile_minmax_range",
    "filtered_minmax_range_streaming",
    "now",
    "elapsed_time",
    "progress_update",
    "progress_done",
]
