# SPDX-License-Identifier: CECILL-2.1
"""Perceptual metric tests: property-based + golden vs an independent NumPy
SSIM implementation."""
import numpy as np
import pytest
from scipy.ndimage import gaussian_filter, uniform_filter

from barc4dip_tpu.metrics.perceptual import ms_ssim, psnr, ssim
from tests.conftest import make_speckle


def _np_ssim(x, y, data_range, win=7, k1=0.01, k2=0.03):
    """Independent uniform-window SSIM (Wang 2004, sample covariance)."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    f = lambda a: uniform_filter(a, win)  # noqa: E731
    pad = win // 2
    crop = (slice(pad, -pad), slice(pad, -pad))

    ux, uy = f(x)[crop], f(y)[crop]
    uxx, uyy, uxy = f(x * x)[crop], f(y * y)[crop], f(x * y)[crop]
    n = win * win
    cn = n / (n - 1)
    vx, vy, vxy = cn * (uxx - ux**2), cn * (uyy - uy**2), cn * (uxy - ux * uy)
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    return float(s.mean())


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(91)
    clean = make_speckle(rng, shape=(256, 256), grain_px=5.0)
    clean = clean / clean.max()
    noisy = clean + rng.normal(scale=0.05, size=clean.shape)
    return clean, noisy


def test_psnr_basics(pair):
    clean, noisy = pair
    assert psnr(clean, clean) == np.inf
    v = psnr(noisy, clean, data_range=1.0)
    # sigma=0.05 noise on unit range -> ~26 dB
    assert 24 < v < 29
    mse = np.mean((noisy - clean) ** 2)
    assert v == pytest.approx(10 * np.log10(1.0 / mse), rel=1e-6)


def test_ssim_golden(pair):
    clean, noisy = pair
    got = ssim(noisy, clean, data_range=1.0)
    want = _np_ssim(noisy, clean, 1.0)
    assert got == pytest.approx(want, rel=1e-7)
    assert ssim(clean, clean, data_range=1.0) == pytest.approx(1.0, abs=1e-9)


def test_ssim_orders_degradations(pair):
    clean, _ = pair
    a = gaussian_filter(clean, 0.5)
    b = gaussian_filter(clean, 2.0)
    assert ssim(a, clean, data_range=1.0) > ssim(b, clean, data_range=1.0)


def test_ssim_validation(pair):
    clean, _ = pair
    with pytest.raises(ValueError):
        ssim(clean, clean[:-1, :])
    with pytest.raises(ValueError):
        ssim(clean, clean, win_size=4)
    with pytest.raises(ValueError):
        ssim(clean[:5, :5], clean[:5, :5], win_size=7)


def test_ms_ssim(pair):
    clean, noisy = pair
    v = ms_ssim(noisy, clean, data_range=1.0, levels=3)
    assert 0.5 < v < 1.0
    assert ms_ssim(clean, clean, data_range=1.0, levels=3) == pytest.approx(1.0, abs=1e-6)
    blurrier = gaussian_filter(clean, 3.0)
    assert ms_ssim(blurrier, clean, data_range=1.0, levels=3) < v
    with pytest.raises(ValueError):
        ms_ssim(clean[:32, :32], clean[:32, :32], levels=5)


def test_mixed_dtype_pair_does_not_wrap(rng):
    """A float image compared against a raw integer reference must cast the
    integer side too (uint16 y*y would wrap around inside the SSIM window
    statistics)."""
    from barc4dip_tpu.metrics.perceptual import psnr, ssim

    raw = rng.integers(200, 4000, size=(64, 64)).astype(np.uint16)
    as_float = raw.astype(np.float32)
    s_mixed = float(ssim(as_float, raw))
    s_float = float(ssim(as_float, as_float))
    assert s_mixed == pytest.approx(s_float, abs=1e-6)
    assert s_mixed == pytest.approx(1.0, abs=1e-6)
    assert float(psnr(as_float, raw)) > 100.0  # identical content
