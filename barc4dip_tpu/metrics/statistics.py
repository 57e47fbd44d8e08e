# SPDX-License-Identifier: CECILL-2.1
"""Statistical metrics (public API).

Parity with reference metrics/statistics.py:17-125.
"""
from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.momentscore import distribution_moments_core

logger = logging.getLogger(__name__)

__all__ = ["distribution_moments"]


@partial(jax.jit, static_argnames=("saturation_value", "eps"))
def _moments(x, *, saturation_value, eps):
    return distribution_moments_core(x, saturation_value=saturation_value, eps=eps)


def distribution_moments(
    image,
    *,
    saturation_value: float | None = 65535.0,
    eps: float = 1e-6,
    verbose: bool = False,
) -> dict:
    """Intensity distribution moments and simple diagnostics.

    Returns mean, std, variance, skewness, kurtosis (scipy.stats.describe
    conventions), frac_zero (|x| <= eps), frac_sat (>= saturation_value or
    NaN), and SNRdB = 20*log10(mean/std) with inf/nan edge handling.
    """
    data = np.asarray(image)
    if data.ndim not in (1, 2):
        raise ValueError(f"Expected 1D or 2D array, got ndim={data.ndim}")
    if data.size == 0:
        raise ValueError("distribution_moments received an empty image.")
    if not np.any(np.isfinite(data)):
        raise ValueError("distribution_moments received no finite values.")

    x = jnp.asarray(data)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        from ..config import default_float

        x = x.astype(default_float())

    out = _moments(
        x,
        saturation_value=None if saturation_value is None else float(saturation_value),
        eps=float(eps),
    )
    moments = {k: float(v) for k, v in out.items()}

    if verbose:
        m = moments
        # the "> moments: k=v | ..." line is part of the output contract
        # (mirrored by the markdown report blocks)
        fields = (
            f"mean={m['mean']:.0f}", f"std={m['std']:.0f}",
            f"var={m['variance']:.0f}", f"skew={m['skewness']:.2f}",
            f"kurt={m['kurtosis']:.2f}", f"SNR={m['SNRdB']:.2f} dB",
            f"zero={m['frac_zero']:.6f}", f"sat={m['frac_sat']:.6f}",
        )
        logger.info("> moments: %s", " | ".join(fields))

    return moments
