# SPDX-License-Identifier: CECILL-2.1
"""End-to-end analysis pipelines (the framework's model layer)."""
from .pipeline import (
    SharpnessScanPipeline,
    SpeckleStackPipeline,
    WavefrontScanPipeline,
    full_step_fn,
)

__all__ = [
    "SpeckleStackPipeline",
    "SharpnessScanPipeline",
    "WavefrontScanPipeline",
    "full_step_fn",
]
