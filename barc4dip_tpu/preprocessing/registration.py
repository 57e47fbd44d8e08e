# SPDX-License-Identifier: CECILL-2.1
"""Stack registration: measure per-frame drift and re-align frames.

No reference counterpart (extension): barc4dip measures displacement
time series (``speckle_stack_stats`` temporal tracking,
reference metrics/speckles.py:347-444) but never *corrects* them — users
must re-align drifting stacks by hand before computing stack metrics.
This module closes that loop with the same device kernels the tracker
uses:

- :func:`register_stack` — estimate each frame's translation against a
  reference (first frame, stack mean, or the previous frame) by
  full-frame phase correlation (``ops/phasecorr.py``, the kernel behind
  ``signal.track_translation(method="phase")``), then shift every frame
  back into alignment, all chunked on device.
- :func:`shift_stack` — apply given per-frame (dy, dx) translations,
  either as an exact subpixel Fourier phase ramp or an integer roll.

Conventions match the tracker: displacements are NumPy row/column order
((dy, dx) = frame position relative to the reference, so
``frame ≈ reference shifted by (+dy, +dx)``); alignment applies
(-dy, -dx). Fourier shifts are circular (periodic wrap at the borders,
exact for band-limited content); ``shift_mode="roll"`` rounds to integer
pixels and is exactly lossless. Shifts beyond ±N/2 alias, as in any
FFT-based registration.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.time import elapsed_time, now
from ..ops import phasecorr as pc_ops
from ..ops import upsampled_dft as upsampled

__all__ = ["register_stack", "shift_stack"]

import logging

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------


def _measure_one(frame, ref_z, *, upsample_factor: int):
    """(dy, dx) of ``frame`` relative to an already-z-scored reference,
    such that ``frame ≈ reference shifted by (+dy, +dx)``.

    Uses the upsampled-DFT phase correlation (ops/upsampled_dft.py, the
    tracker's skimage-compatible backend) rather than a 3x3 Taylor fit:
    the whitened correlation peak is near delta-like, where a 3-point
    quadratic fit is biased (~0.2 px measured on synthetic speckle) but
    the matrix-multiply DFT refinement is not (<0.02 px at factor 20).
    ``upsampled`` returns the shift that aligns ``moving`` to
    ``reference`` — the negative of the drift measured here."""
    sy, sx = upsampled.phase_cross_correlation_upsampled(
        ref_z, pc_ops.zscore2d(frame), upsample_factor=upsample_factor
    )
    return (-sy).astype(jnp.float32), (-sx).astype(jnp.float32)


def _fourier_shift(frame, sy, sx):
    """y(p) = x(p - s): move the frame's content by (+sy, +sx) pixels
    via an exact frequency-domain phase ramp (circular boundary)."""
    H, W = frame.shape[-2], frame.shape[-1]
    fy = jnp.fft.fftfreq(H).astype(jnp.float32)[:, None]
    fx = jnp.fft.rfftfreq(W).astype(jnp.float32)[None, :]
    ang = (-2.0 * jnp.pi) * (fy * sy + fx * sx)
    ramp = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
    return jnp.fft.irfft2(jnp.fft.rfft2(frame) * ramp, s=(H, W))


def _roll_shift(frame, sy, sx):
    """Integer-pixel circular shift by (round(sy), round(sx)) — lossless."""
    H, W = frame.shape[-2], frame.shape[-1]
    iy = jnp.round(sy).astype(jnp.int32)
    ix = jnp.round(sx).astype(jnp.int32)
    rows = jnp.mod(jnp.arange(H) - iy, H)
    cols = jnp.mod(jnp.arange(W) - ix, W)
    return jnp.take(jnp.take(frame, rows, axis=-2), cols, axis=-1)


def _apply_shift(frame, sy, sx, mode: str):
    return _fourier_shift(frame, sy, sx) if mode == "fourier" else _roll_shift(
        frame, sy, sx
    )


@lru_cache(maxsize=32)
def _register_program(shape: tuple[int, int], upsample_factor: int,
                      shift_mode: str):
    """Fused measure + align for a fixed reference: one program per chunk.

    (chunk (B,H,W), ref (H,W)) -> (aligned (B,H,W), dy (B,), dx (B,))."""

    def run(chunk, ref):
        ref_z = pc_ops.zscore2d(ref)

        def one(frame):
            dy, dx = _measure_one(frame, ref_z,
                                  upsample_factor=upsample_factor)
            return _apply_shift(frame, -dy, -dx, shift_mode), dy, dx

        return jax.vmap(one)(chunk)

    return jax.jit(run)


@lru_cache(maxsize=32)
def _measure_prev_program(shape: tuple[int, int], upsample_factor: int):
    """Incremental drift: each frame against its predecessor, the chunk's
    first predecessor passed as a single boundary frame (same t-1 tail
    trick as metrics/stack_fused.py) so no frame rides the wire twice.

    (chunk (B,H,W), boundary (H,W)) -> (dy_inc (B,), dx_inc (B,))."""

    def run(chunk, boundary):
        prevs = jnp.concatenate([boundary[None], chunk[:-1]], axis=0)

        def one(frame, prev):
            return _measure_one(frame, pc_ops.zscore2d(prev),
                                upsample_factor=upsample_factor)

        return jax.vmap(one)(chunk, prevs)

    return jax.jit(run)


@lru_cache(maxsize=32)
def _shift_program(shape: tuple[int, int], shift_mode: str):
    """(chunk (B,H,W), sy (B,), sx (B,)) -> shifted chunk."""

    def run(chunk, sy, sx):
        return jax.vmap(lambda f, a, b: _apply_shift(f, a, b, shift_mode))(
            chunk, sy, sx
        )

    return jax.jit(run)


# ---------------------------------------------------------------------------
# chunked host orchestration
# ---------------------------------------------------------------------------


def _chunked(frames, B: int, fn, n_out_arrays: int):
    """Run ``fn(device_chunk, c0, n_valid) -> tuple of device arrays`` over
    padded chunks with prefetch-overlapped uploads; concatenate each output
    position (host numpy for numpy input, device arrays otherwise)."""
    from ..metrics.common import loop_prefetcher, upload_padded_chunk

    T = int(frames.shape[0])
    device_in = isinstance(frames, jax.Array)
    outs: list[list] = [[] for _ in range(n_out_arrays)]

    if device_in:
        for c0 in range(0, T, B):
            dev, _, _ = upload_padded_chunk(frames, c0, B, T, jnp.asarray)
            res = fn(dev, c0, min(B, T - c0))
            for k, r in enumerate(res):
                outs[k].append(r[: min(B, T - c0)])
        return [jnp.concatenate(o, axis=0) for o in outs]

    prefetch = loop_prefetcher()
    uploads: dict = {}
    pending = None  # (results tuple, n_valid)
    for c0 in range(0, T, B):
        fut = uploads.pop(c0, None)
        if fut is None:
            fut = prefetch.submit(
                upload_padded_chunk, frames, c0, B, T, jnp.asarray
            )
        dev = fut.result()[0]
        res = fn(dev, c0, min(B, T - c0))
        if c0 + B < T:
            uploads[c0 + B] = prefetch.submit(
                upload_padded_chunk, frames, c0 + B, B, T, jnp.asarray
            )
        if pending is not None:
            for k, r in enumerate(pending[0]):
                outs[k].append(np.asarray(r)[: pending[1]])
        pending = (res, min(B, T - c0))
    for k, r in enumerate(pending[0]):
        outs[k].append(np.asarray(r)[: pending[1]])
    return [np.concatenate(o, axis=0) for o in outs]


def shift_stack(
    stack,
    dy,
    dx,
    *,
    shift_mode: Literal["fourier", "roll"] = "fourier",
    frame_chunk: int = 8,
):
    """Translate every frame of a (T, H, W) stack by its own (+dy, +dx).

    ``shift_mode="fourier"`` applies an exact subpixel phase ramp
    (circular); ``"roll"`` rounds to integers and is lossless. Residence
    follows the input: NumPy in -> NumPy out, ``jax.Array`` in -> device
    out. A 2D image is accepted with scalar shifts."""
    if shift_mode not in {"fourier", "roll"}:
        raise ValueError("shift_mode must be 'fourier' or 'roll'.")
    single = stack.ndim == 2
    frames = stack[None] if single else stack
    if frames.ndim != 3:
        raise ValueError(
            f"stack must be 2D (H, W) or 3D (T, H, W); got ndim={stack.ndim}"
        )
    if frames.shape[0] < 1:
        raise ValueError("stack must contain at least one frame.")
    device_in = isinstance(frames, jax.Array)
    if not device_in:
        frames = np.asarray(frames, dtype=np.float32)
    else:
        frames = frames.astype(jnp.float32)
    T = int(frames.shape[0])
    dy = np.broadcast_to(np.asarray(dy, np.float32), (T,))
    dx = np.broadcast_to(np.asarray(dx, np.float32), (T,))

    shape = tuple(int(s) for s in frames.shape[1:])
    program = _shift_program(shape, shift_mode)
    B = max(1, min(int(frame_chunk), T))

    def run(dev, c0, n_valid):
        sy = np.zeros(B, np.float32)
        sx = np.zeros(B, np.float32)
        sy[:n_valid] = dy[c0 : c0 + n_valid]
        sx[:n_valid] = dx[c0 : c0 + n_valid]
        return (program(dev, jnp.asarray(sy), jnp.asarray(sx)),)

    (out,) = _chunked(frames, B, run, 1)
    return out[0] if single else out


def register_stack(
    stack,
    *,
    reference: Literal["first", "mean", "previous"] = "first",
    subpixel: bool = True,
    upsample_factor: int = 20,
    shift_mode: Literal["fourier", "roll"] = "fourier",
    frame_chunk: int = 8,
    verbose: bool = False,
):
    """Measure and remove per-frame translational drift from a stack.

    Parameters
    ----------
    stack : (T, H, W) numpy.ndarray or jax.Array
        Frames to align. Residence follows the input (NumPy in -> NumPy
        out; device in -> device out, nothing pulled but the shifts).
    reference : "first" | "mean" | "previous"
        What each frame is registered against. "first"/"mean" measure
        absolute drift in one fused measure+align pass per chunk;
        "previous" measures incremental drift (robust when total drift
        is large but frame-to-frame motion is small), integrates it on
        the host, then aligns in a second chunked pass.
    subpixel : bool
        Refine the correlation peak with the upsampled-DFT evaluation
        (ops/upsampled_dft.py) at ``upsample_factor``; ``False`` measures
        integer-pixel drift only.
    upsample_factor : int
        Subpixel resolution of the refinement (1/upsample_factor px).
    shift_mode : "fourier" | "roll"
        How frames are moved back: exact subpixel phase ramp (circular)
        or lossless integer roll.
    frame_chunk : int
        Frames per device program.

    Returns
    -------
    (aligned, shifts) : aligned stack + ``{"dy", "dx", "reference"}``
        with (T,) float32 per-frame displacements as MEASURED (the
        applied correction is their negative); ``dy[0] == dx[0] == 0``
        by construction for "first" and "previous".
    """
    if reference not in {"first", "mean", "previous"}:
        raise ValueError("reference must be 'first', 'mean' or 'previous'.")
    if shift_mode not in {"fourier", "roll"}:
        raise ValueError("shift_mode must be 'fourier' or 'roll'.")
    if not isinstance(stack, (np.ndarray, jax.Array)):
        raise TypeError("register_stack expects a numpy.ndarray or jax.Array")
    if stack.ndim != 3:
        raise ValueError(
            f"stack must be a 3D array with shape (T, H, W); got ndim={stack.ndim}"
        )
    if stack.shape[0] < 1:
        raise ValueError("stack must contain at least one frame.")

    t0 = now()
    device_in = isinstance(stack, jax.Array)
    frames = (
        stack.astype(jnp.float32)
        if device_in
        else np.asarray(stack, dtype=np.float32)
    )
    T = int(frames.shape[0])
    shape = tuple(int(s) for s in frames.shape[1:])
    B = max(1, min(int(frame_chunk), T))
    u = int(upsample_factor) if subpixel else 1
    if u < 1:
        raise ValueError("upsample_factor must be >= 1.")

    if reference == "previous":
        program = _measure_prev_program(shape, u)

        def measure(dev, c0, n_valid):
            boundary = frames[max(c0 - 1, 0)]
            if not isinstance(boundary, jax.Array):
                boundary = jnp.asarray(boundary)
            return program(dev, boundary)

        dy_inc, dx_inc = (
            np.asarray(a) for a in _chunked(frames, B, measure, 2)
        )
        dy = np.cumsum(dy_inc, dtype=np.float32)
        dx = np.cumsum(dx_inc, dtype=np.float32)
        aligned = shift_stack(
            frames, -dy, -dx, shift_mode=shift_mode, frame_chunk=B
        )
    else:
        if reference == "first":
            ref = frames[0]
        else:
            ref = (
                jnp.mean(frames, axis=0)
                if device_in
                else frames.mean(axis=0, dtype=np.float32)
            )
        ref_dev = ref if isinstance(ref, jax.Array) else jnp.asarray(ref)
        program = _register_program(shape, u, shift_mode)

        def run(dev, c0, n_valid):
            return program(dev, ref_dev)

        aligned, dy, dx = _chunked(frames, B, run, 3)
        dy, dx = np.asarray(dy), np.asarray(dx)

    if verbose:
        logger.info(
            "> register_stack | frames=%d | reference=%s | mode=%s | "
            "max|d|=%.3f px | elapsed=%.3fs",
            T, reference, shift_mode,
            float(np.hypot(dy, dx).max()) if T else 0.0,
            elapsed_time(t0, verbose=False),
        )
    return aligned, {
        "dy": np.asarray(dy, np.float32),
        "dx": np.asarray(dx, np.float32),
        "reference": reference,
    }
