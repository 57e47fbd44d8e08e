# SPDX-License-Identifier: CECILL-2.1
"""Preprocessing: flat-field correction, PSF deconvolution, enhancement,
distortion correction."""
from .filters import deconvolve_psf
from .normalize import flat_field_correction

__all__ = ["flat_field_correction", "deconvolve_psf"]
