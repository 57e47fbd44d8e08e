# SPDX-License-Identifier: CECILL-2.1
"""Flat-field (gain) correction, device-accelerated.

Parity with reference preprocessing/normalize.py:12-145:
``(I - D) / (F - D) * scale`` with stacked flats/darks mean-reduced, bad
pixels (den <= eps) zeroed and optionally median-repaired, scale in
{none, flat_mean, flat_median}, float32 output. The whole correction is one
fused XLA program — elementwise chain + rank filter with no host round-trips.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rank import median_filter2d
from ..ops.uploadcache import device_resident, register_pair
from ..utils import elapsed_time, now

__all__ = ["flat_field_correction"]


@partial(jax.jit, static_argnames=("scale", "bad_pixel_removal", "has_eps"))
def _ffc_device(img, flat2d, dark2d, eps_in, *, scale, bad_pixel_removal, has_eps):
    from ..ops.quantile import median_exact, nanmedian_exact

    den = flat2d - dark2d

    if has_eps:
        eps = eps_in
    else:
        med = median_exact(den)
        eps = jnp.where(med > 0, 1e-6 * med, 1e-6)

    bad = den <= eps
    den_safe = jnp.where(bad, 1.0, den)

    num = img - dark2d  # broadcasts over a leading stack axis
    out = num / den_safe

    if scale != "none":
        valid = ~bad
        nvalid = jnp.maximum(jnp.sum(valid), 1)
        if scale == "flat_mean":
            s = jnp.sum(jnp.where(valid, den, 0.0)) / nvalid
        else:  # flat_median over valid pixels: mask invalid to NaN
            s = nanmedian_exact(jnp.where(valid, den, jnp.nan))
        out = out * s

    out = jnp.where(bad, 0.0, out)

    if bad_pixel_removal:
        repaired = median_filter2d(out, size=3)
        out = jnp.where(bad, repaired, out)

    return out.astype(jnp.float32)


def flat_field_correction(
    images: np.ndarray,
    *,
    flats: np.ndarray | None = None,
    darks: np.ndarray | None = None,
    scale: str = "flat_median",
    bad_pixel_removal: bool = False,
    eps: float | None = None,
    verbose: bool = False,
    as_numpy: bool | None = None,
) -> np.ndarray:
    """Apply flat-field correction to a 2D image or (N, H, W) stack.

    Returns float32 with the input's shape. Degenerate paths match the
    reference: no flats/darks -> copy; dark-only -> subtraction; flat-only ->
    zero dark.

    ``as_numpy=None`` (default) keeps the result where the input lives:
    NumPy in -> NumPy out (reference contract), device array in -> device
    array out, so preprocessing chains into the metric aggregators with no
    host round-trip. Pass True/False to force either residence.
    """
    t0 = now()

    if scale not in {"none", "flat_mean", "flat_median"}:
        raise ValueError(f"Invalid scale option: {scale}")
    if images.ndim not in {2, 3}:
        raise ValueError("images must be 2D or 3D")

    device_in = isinstance(images, jax.Array)
    if as_numpy is None:
        as_numpy = not device_in
    if device_in:
        img = images.astype(jnp.float32)
    else:
        img = np.asarray(images, dtype=np.float32)

    def _reduce_stack(arr):
        if arr is None:
            return None
        if arr.ndim == 3:
            return np.asarray(arr, dtype=np.float32).mean(axis=0)
        if arr.ndim == 2:
            return np.asarray(arr, dtype=np.float32)
        raise ValueError("flats/darks must be 2D or 3D")

    flat2d = _reduce_stack(flats)
    dark2d = _reduce_stack(darks)

    def _deliver(arr):
        if as_numpy:
            return np.asarray(arr, dtype=np.float32)
        return arr if isinstance(arr, jax.Array) else jnp.asarray(arr)

    if flat2d is None and dark2d is None:
        if verbose:
            elapsed_time(t0)
        return _deliver(img.copy())

    if dark2d is None:
        # a scalar zero broadcasts on device — shipping a full zeros frame
        # over the wire (~17 MB at 2k) would cost as much as the image
        dark2d = np.float32(0.0)

    if flat2d is None:
        out = img - (dark2d if img.ndim == 2 else dark2d[None, ...])
        if verbose:
            elapsed_time(t0)
        return _deliver(out.astype(np.float32))

    # flats/darks are calibration constants reused across every frame of a
    # run: the content-addressed cache uploads each once per session
    out = _ffc_device(
        img if device_in else device_resident(img),
        device_resident(flat2d),
        device_resident(dark2d),
        jnp.float32(0.0 if eps is None else eps),
        scale=scale,
        bad_pixel_removal=bool(bad_pixel_removal),
        has_eps=eps is not None,
    )
    if as_numpy:
        dev = out
        out = np.asarray(dev)
        # the pulled bytes and the live device buffer are the same content:
        # registering the pair lets a follow-on metric call on this numpy
        # result redeem the device copy instead of re-uploading it
        # (CLI chain: read -> flat-field -> speckle_stats)
        register_pair(out, dev)

    if verbose:
        elapsed_time(t0)
    return out
