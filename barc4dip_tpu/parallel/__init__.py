# SPDX-License-Identifier: CECILL-2.1
"""Multi-device parallelism: frame-axis mesh sharding for stack pipelines."""
from .mesh import (
    FRAME_AXIS,
    frame_mesh,
    init_distributed,
    frames_sharding,
    replicated_sharding,
    shard_frames,
)

__all__ = [
    "FRAME_AXIS",
    "frame_mesh",
    "init_distributed",
    "frames_sharding",
    "replicated_sharding",
    "shard_frames",
]
