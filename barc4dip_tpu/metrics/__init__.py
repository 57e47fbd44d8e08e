# SPDX-License-Identifier: CECILL-2.1
"""Metric aggregators: speckle, sharpness, distribution statistics."""
from .sharpness import (
    eigenvalues,
    inverse_autocorr_width,
    laplacian_variance,
    sharpness_stack_stats,
    sharpness_stats,
    spectral_entropy,
    tenengrad,
)
from .frc import fourier_ring_correlation
from .maps import visibility_map
from .speckles import amplitude, bandwidth, grain, speckle_stack_stats, speckle_stats
from .statistics import distribution_moments

__all__ = [
    "fourier_ring_correlation",
    "visibility_map",
    "speckle_stats",
    "speckle_stack_stats",
    "amplitude",
    "grain",
    "bandwidth",
    "sharpness_stats",
    "sharpness_stack_stats",
    "tenengrad",
    "laplacian_variance",
    "spectral_entropy",
    "inverse_autocorr_width",
    "eigenvalues",
    "distribution_moments",
]
