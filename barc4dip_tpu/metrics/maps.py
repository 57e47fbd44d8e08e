# SPDX-License-Identifier: CECILL-2.1
"""Dense per-pixel metric maps.

No reference counterpart (extension): the reference resolves spatial
variation of its metrics only at 3x3/9x9 tile granularity
(reference metrics/common.py:109-170). :func:`visibility_map` is the
dense version of the reference's visibility estimator
(``std/mean``, reference metrics/speckles.py:602-663): a sliding-window
speckle-contrast map — the standard beamline diagnostic for spatially
resolved coherence/visibility.

Numerics note: the window sums use SEPARABLE ``lax.reduce_window`` box
filters, not the integral-image trick of ``ops/ncc.py::window_sums`` —
an f32 integral image of a 2048² frame of ~1e3 counts reaches ~4e9
while a 16² window sum is ~2.6e5, so the subtraction would lose ~3
significant digits of a user-facing METRIC value (the NCC kernel gets
away with it because its inputs are z-scored and its consumer is a
peak argmax). Each separable sum stays at window magnitude, and the
intensities are pre-scaled by the global mean (visibility is
scale-invariant), keeping the map at f32 round-off accuracy at any
frame size.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["visibility_map"]


def _box_sum_valid(x, w: int):
    """Separable (w, w) sliding-window sum, valid mode, via two 1-D
    additive reduce_windows (accurate at any frame size, unlike a global
    integral image in f32)."""
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(w, 1), window_strides=(1, 1), padding="VALID",
    )
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, w), window_strides=(1, 1), padding="VALID",
    )


@lru_cache(maxsize=32)
def _visibility_program(shape: tuple[int, int], window: int, stride: int):
    def one(img):
        # visibility is scale-invariant: normalize by the global mean so
        # the window sums are O(window²) regardless of the count level
        g = jnp.mean(img)
        y = img / jnp.where(g > 0.0, g, 1.0)
        area = float(window * window)
        s1 = _box_sum_valid(y, window)
        s2 = _box_sum_valid(y * y, window)
        mean = s1 / area
        # population variance (ddof=0), tiny f32 negatives clamped
        var = jnp.maximum(s2 / area - mean * mean, 0.0)
        vis = jnp.where(mean > 0.0, jnp.sqrt(var) / mean, jnp.nan)
        return vis[::stride, ::stride]

    return jax.jit(jax.vmap(one))


def visibility_map(image, *, window: int = 16, stride: int = 1,
                   frame_chunk: int = 8):
    """Sliding-window speckle visibility (contrast) map, ``std/mean`` over
    every (window, window) patch (valid mode, population std — the same
    definition as the full-frame/tile ``visibility`` metric).

    Parameters
    ----------
    image : (H, W) or (T, H, W) numpy.ndarray or jax.Array
        Intensity frame(s); windows whose mean is not positive map to NaN.
    window : int
        Patch side in pixels.
    stride : int
        Output decimation (1 = every valid position).
    frame_chunk : int
        Frames per device program for stacks (bounds device memory like
        every other stack API; NumPy stacks get the prefetch-overlapped
        chunk loop, device stacks are sliced on device).

    Returns
    -------
    (H-window+1, W-window+1) map (strided), with a leading T axis for
    stacks. Residence follows the input: NumPy in -> NumPy out, device
    array in -> device array out.
    """
    window = int(window)
    stride = int(stride)
    if window < 2:
        raise ValueError("window must be >= 2.")
    if stride < 1:
        raise ValueError("stride must be >= 1.")
    if not isinstance(image, (np.ndarray, jax.Array)):
        raise TypeError("visibility_map expects a numpy.ndarray or jax.Array")
    if image.ndim not in {2, 3}:
        raise ValueError(
            f"image must be 2D (H, W) or 3D (T, H, W); got ndim={image.ndim}"
        )
    H, W = (int(s) for s in image.shape[-2:])
    if window > min(H, W):
        raise ValueError(
            f"window ({window}) exceeds the image extent ({H}x{W})."
        )

    device_in = isinstance(image, jax.Array)
    single = image.ndim == 2
    frames = image[None] if single else image
    T = int(frames.shape[0])
    B = max(1, min(int(frame_chunk), T))
    program = _visibility_program((H, W), window, stride)

    if device_in:
        frames = frames.astype(jnp.float32)
        pieces = [program(frames[c0 : c0 + B]) for c0 in range(0, T, B)]
        out = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=0)
        return out[0] if single else out

    from .common import run_stack_program

    out = run_stack_program(
        np.asarray(frames, dtype=np.float32), program, frame_chunk=B
    )
    return out[0] if single else out
