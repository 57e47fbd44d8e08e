# SPDX-License-Identifier: CECILL-2.1
"""Vectorised peak-width estimators.

Parity with reference maths/stats.py:9-155, whose Python walk-out loops become
masked reductions: "first sample below threshold walking left/right from the
center" is exactly max/min over a boolean mask — data-independent control
flow, so the whole thing jits and vmaps.

Both functions return ``(value, hit_edge)`` with the reference's fallback of
``profile.size`` when the threshold is never crossed.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["width_at_fraction_core", "distance_at_fraction_core"]


def _interp_cross(p, i0, i1, thr, fallback_idx):
    """x where the segment (i0, p[i0]) -> (i1, p[i1]) crosses thr.

    Returns ``fallback_idx`` (float) when p[i0] == p[i1] (flat segment), as in
    the reference's degenerate-segment branch.
    """
    y0 = p[i0]
    y1 = p[i1]
    flat = y1 == y0
    denom = jnp.where(flat, 1.0, y1 - y0)
    x = i0 + (thr - y0) / denom
    return jnp.where(flat, fallback_idx.astype(x.dtype), x)


def width_at_fraction_core(profile, *, fraction: float, center_index=None):
    """Full width of a 1D peak at ``fraction`` of its peak value.

    Walk-left finds the largest index <= c with p[i] < thr; walk-right the
    smallest index >= c with p[i] < thr. Crossings are linearly interpolated.

    Returns (width: float scalar, hit_edge: bool scalar).
    """
    p = profile
    n = p.shape[-1]
    idx = jnp.arange(n)

    c = jnp.argmax(p) if center_index is None else jnp.asarray(center_index)
    c = jnp.clip(c, 0, n - 1)

    peak = p[c]
    thr = peak * fraction

    below = p < thr
    left_mask = below & (idx <= c)
    right_mask = below & (idx >= c)

    has_left = jnp.any(left_mask)
    has_right = jnp.any(right_mask)

    i_left = jnp.max(jnp.where(left_mask, idx, -1))
    i_right = jnp.min(jnp.where(right_mask, idx, n))

    # Clamp for safe indexing when missing (result discarded via hit_edge);
    # il+1 also clamps the i_left == c == n-1 corner where the reference
    # would raise IndexError (flat fallback applies either way).
    il = jnp.clip(i_left, 0, n - 1)
    ir = jnp.clip(i_right, 0, n - 1)

    x_left = _interp_cross(p, il, jnp.minimum(il + 1, n - 1), thr, il.astype(p.dtype))

    # Right crossing: the reference indexes p[i_right - 1] with Python
    # semantics, so i_right == 0 (a below-threshold peak sample) reads the
    # LAST element while keeping coordinate -1; replicate exactly.
    j0 = (ir - 1) % n
    y0 = p[j0]
    y1 = p[ir]
    flat = y1 == y0
    denom = jnp.where(flat, 1.0, y1 - y0)
    x_right = jnp.where(
        flat,
        ir.astype(p.dtype),
        (ir - 1).astype(p.dtype) + (thr - y0) / denom,
    )

    width = x_right - x_left
    ok = has_left & has_right
    width = jnp.where(ok, width, jnp.asarray(float(n), dtype=p.dtype))
    return width, ~ok


def distance_at_fraction_core(profile, *, fraction: float, peak_index: int = 0):
    """One-sided distance from ``peak_index`` to the first crossing below
    ``fraction * peak`` toward increasing index (for radial profiles).

    Returns (distance: float scalar, hit_edge: bool scalar).
    """
    p = profile
    n = p.shape[-1]
    idx = jnp.arange(n)

    k0 = jnp.clip(jnp.asarray(peak_index), 0, n - 1)
    peak = p[k0]
    thr = peak * fraction

    mask = (p < thr) & (idx >= k0)
    found = jnp.any(mask)
    i_cross = jnp.min(jnp.where(mask, idx, n))

    at_peak = i_cross == k0
    ic = jnp.clip(i_cross, 1, n - 1)
    x_cross = _interp_cross(p, ic - 1, ic, thr, ic.astype(p.dtype))

    dist = x_cross - k0.astype(p.dtype)
    dist = jnp.where(at_peak, jnp.zeros((), p.dtype), dist)
    dist = jnp.where(found, dist, jnp.asarray(float(n), dtype=p.dtype))
    return dist, ~found
