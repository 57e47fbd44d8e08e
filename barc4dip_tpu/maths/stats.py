# SPDX-License-Identifier: CECILL-2.1
"""Peak-width estimators (public API).

Parity with reference maths/stats.py:9-155. The device kernels
(:mod:`barc4dip_tpu.ops.widths`) vectorise the reference's Python walk-out
loops into masked reductions.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import widths

__all__ = ["width_at_fraction", "distance_at_fraction_from_peak"]


@partial(jax.jit, static_argnames=("fraction", "has_center"))
def _width(p, center_index, *, fraction, has_center):
    return widths.width_at_fraction_core(
        p, fraction=fraction, center_index=center_index if has_center else None
    )


@partial(jax.jit, static_argnames=("fraction",))
def _dist(p, peak_index, *, fraction):
    return widths.distance_at_fraction_core(p, fraction=fraction, peak_index=peak_index)


def _validate_profile(profile, fraction):
    p = jnp.asarray(profile)
    if not jnp.issubdtype(p.dtype, jnp.floating):
        from ..config import default_float

        p = p.astype(default_float())
    if p.ndim != 1 or p.size == 0:
        raise ValueError("profile must be a non-empty 1D array.")
    if not (0.0 < fraction < 1.0):
        raise ValueError("fraction must be in (0, 1).")
    return p


def width_at_fraction(
    profile, *, fraction: float = 1.0 / np.e, center_index: int | None = None
) -> tuple[float, bool]:
    """Full width of a 1D peak at ``fraction`` of its value: (width, hit_edge)."""
    p = _validate_profile(profile, fraction)
    ci = 0 if center_index is None else int(center_index)
    w, hit = _width(p, ci, fraction=float(fraction), has_center=center_index is not None)
    return float(w), bool(hit)


def distance_at_fraction_from_peak(
    profile, *, fraction: float = 1.0 / np.e, peak_index: int = 0
) -> tuple[float, bool]:
    """One-sided distance from peak to the ``fraction`` crossing: (dist, hit_edge)."""
    p = _validate_profile(profile, fraction)
    d, hit = _dist(p, int(peak_index), fraction=float(fraction))
    return float(d), bool(hit)
