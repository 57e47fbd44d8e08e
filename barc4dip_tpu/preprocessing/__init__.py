# SPDX-License-Identifier: CECILL-2.1
"""Preprocessing: flat-field correction, PSF deconvolution, enhancement,
distortion correction, stack registration.

The reference package exports only the first two (its enhancement module
is unexported and distortion is an empty stub); clahe, the distortion
tools and the stack registration are exported here because they are real
implementations (registration has no reference counterpart at all).
"""
from .distortion import correct_distortion, distortion_map
from .enhancement import clahe
from .filters import deconvolve_psf
from .normalize import flat_field_correction
from .registration import register_stack, shift_stack

__all__ = [
    "flat_field_correction",
    "deconvolve_psf",
    "clahe",
    "correct_distortion",
    "distortion_map",
    "register_stack",
    "shift_stack",
]
