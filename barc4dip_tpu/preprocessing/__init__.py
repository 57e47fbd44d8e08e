# SPDX-License-Identifier: CECILL-2.1
"""Preprocessing: flat-field correction, PSF deconvolution, enhancement,
distortion correction.

The reference package exports only the first two (its enhancement module
is unexported and distortion is an empty stub); clahe and the distortion
tools are exported here because they are real implementations.
"""
from .distortion import correct_distortion, distortion_map
from .enhancement import clahe
from .filters import deconvolve_psf
from .normalize import flat_field_correction

__all__ = [
    "flat_field_correction",
    "deconvolve_psf",
    "clahe",
    "correct_distortion",
    "distortion_map",
]
