# SPDX-License-Identifier: CECILL-2.1
"""Perceptual image-quality metrics.

The reference declares this module but ships it empty
(metrics/perceptual.py, 0 LoC; SURVEY §2.6). Implemented natively here:

- :func:`psnr` — peak signal-to-noise ratio;
- :func:`ssim` — structural similarity (Wang et al. 2004), Gaussian- or
  uniform-windowed, matching the standard formulation (skimage-compatible
  defaults: 7x7 uniform window, sample covariance normalisation);
- :func:`ms_ssim` — multi-scale SSIM (Wang et al. 2003) with the standard
  5-scale weights.

All run as fused jitted device programs (separable window convolutions).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["psnr", "ssim", "ms_ssim"]


def _as_float_pair(a, b):
    x = jnp.asarray(a)
    y = jnp.asarray(b)
    if x.shape != y.shape:
        raise ValueError(f"shapes must match; got {x.shape} and {y.shape}")
    if x.ndim != 2:
        raise ValueError("expected 2D images")
    # cast EACH image independently: a mixed call (float processed vs
    # uint16 raw) must not leave the integer one to wrap around in y*y
    if not (
        jnp.issubdtype(x.dtype, jnp.floating)
        and jnp.issubdtype(y.dtype, jnp.floating)
    ):
        from ..config import default_float

        f = default_float()
        x = x.astype(f) if not jnp.issubdtype(x.dtype, jnp.floating) else x
        y = y.astype(f) if not jnp.issubdtype(y.dtype, jnp.floating) else y
    return x, y


@jax.jit
def _psnr_core(x, y, data_range):
    mse = jnp.mean((x - y) ** 2)
    return jnp.where(
        mse > 0, 10.0 * jnp.log10(data_range * data_range / jnp.where(mse > 0, mse, 1.0)),
        jnp.inf,
    )


def psnr(image, reference, *, data_range: float | None = None) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    x, y = _as_float_pair(image, reference)
    if data_range is None:
        data_range = float(jnp.max(y) - jnp.min(y))
    return float(_psnr_core(x, y, jnp.asarray(data_range, x.dtype)))


def _sep_filter(img, kernel1d):
    """Separable 'valid' correlation along both axes."""
    k = kernel1d.shape[0]
    H, W = img.shape[-2], img.shape[-1]
    out = jnp.zeros((H - k + 1, W), img.dtype)
    for i in range(k):
        out = out + kernel1d[i] * img[i : i + H - k + 1, :]
    out2 = jnp.zeros((H - k + 1, W - k + 1), img.dtype)
    for i in range(k):
        out2 = out2 + kernel1d[i] * out[:, i : i + W - k + 1]
    return out2


@lru_cache(maxsize=16)
def _window(win_size: int, gaussian: bool, sigma: float):
    if gaussian:
        x = np.arange(win_size, dtype=np.float64) - (win_size - 1) / 2.0
        w = np.exp(-0.5 * (x / sigma) ** 2)
    else:
        w = np.ones(win_size, dtype=np.float64)
    return w / w.sum()


def _ssim_map(x, y, *, data_range, win_size, gaussian, sigma, k1, k2):
    w = jnp.asarray(_window(win_size, gaussian, sigma), dtype=x.dtype)

    mu_x = _sep_filter(x, w)
    mu_y = _sep_filter(y, w)
    mu_xx = _sep_filter(x * x, w)
    mu_yy = _sep_filter(y * y, w)
    mu_xy = _sep_filter(x * y, w)

    # sample (unbiased-style) normalisation as in skimage: cov_norm = n/(n-1)
    n = win_size * win_size
    cov_norm = n / (n - 1.0)
    vx = cov_norm * (mu_xx - mu_x * mu_x)
    vy = cov_norm * (mu_yy - mu_y * mu_y)
    vxy = cov_norm * (mu_xy - mu_x * mu_y)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    num = (2 * mu_x * mu_y + c1) * (2 * vxy + c2)
    den = (mu_x * mu_x + mu_y * mu_y + c1) * (vx + vy + c2)
    cs = (2 * vxy + c2) / (vx + vy + c2)
    return num / den, cs


@lru_cache(maxsize=32)
def _ssim_jit(win_size, gaussian, sigma, k1, k2):
    def fn(x, y, data_range):
        s, _ = _ssim_map(
            x, y, data_range=data_range, win_size=win_size, gaussian=gaussian,
            sigma=sigma, k1=k1, k2=k2,
        )
        return jnp.mean(s)

    return jax.jit(fn)


def ssim(
    image,
    reference,
    *,
    data_range: float | None = None,
    win_size: int = 7,
    gaussian_weights: bool = False,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> float:
    """Mean structural similarity index (Wang et al. 2004)."""
    x, y = _as_float_pair(image, reference)
    if win_size % 2 == 0 or win_size < 3:
        raise ValueError("win_size must be odd and >= 3")
    if min(x.shape) < win_size:
        raise ValueError("image smaller than the SSIM window")
    if data_range is None:
        data_range = float(jnp.max(y) - jnp.min(y))
    fn = _ssim_jit(int(win_size), bool(gaussian_weights), float(sigma), float(k1), float(k2))
    return float(fn(x, y, jnp.asarray(data_range, x.dtype)))


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@lru_cache(maxsize=16)
def _msssim_jit(levels, win_size, k1, k2):
    weights = np.asarray(_MSSSIM_WEIGHTS[:levels])
    weights = weights / weights.sum()

    def downsample(img):
        H, W = img.shape
        return 0.25 * (
            img[0 : H - H % 2 : 2, 0 : W - W % 2 : 2]
            + img[1 : H : 2, 0 : W - W % 2 : 2]
            + img[0 : H - H % 2 : 2, 1 : W : 2]
            + img[1 : H : 2, 1 : W : 2]
        )

    def fn(x, y, data_range):
        vals = []
        for lvl in range(levels):
            s_map, cs_map = _ssim_map(
                x, y, data_range=data_range, win_size=win_size, gaussian=True,
                sigma=1.5, k1=k1, k2=k2,
            )
            vals.append(jnp.mean(s_map) if lvl == levels - 1 else jnp.mean(cs_map))
            if lvl != levels - 1:
                x = downsample(x)
                y = downsample(y)
        out = jnp.asarray(1.0, vals[0].dtype)
        for v, w in zip(vals, weights):
            out = out * jnp.maximum(v, 1e-6) ** w
        return out

    return jax.jit(fn)


def ms_ssim(
    image,
    reference,
    *,
    data_range: float | None = None,
    levels: int = 5,
    win_size: int = 11,
    k1: float = 0.01,
    k2: float = 0.03,
) -> float:
    """Multi-scale SSIM (Wang et al. 2003), standard 5-scale weighting."""
    x, y = _as_float_pair(image, reference)
    if min(x.shape) < win_size * 2 ** (levels - 1):
        raise ValueError(
            f"image too small for {levels} scales with win_size={win_size}"
        )
    if data_range is None:
        data_range = float(jnp.max(y) - jnp.min(y))
    fn = _msssim_jit(int(levels), int(win_size), float(k1), float(k2))
    return float(fn(x, y, jnp.asarray(data_range, x.dtype)))
