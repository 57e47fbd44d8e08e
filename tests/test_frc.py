# SPDX-License-Identifier: CECILL-2.1
"""Fourier ring correlation (metrics/frc.py)."""
import numpy as np
import pytest

from barc4dip_tpu.metrics import fourier_ring_correlation
from barc4dip_tpu.utils.synthetic import speckle_field


def _band_limited(n, fc, seed):
    """White noise low-passed at fc cycles/px — signal with a hard band edge."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, n))
    f = np.fft.fftfreq(n)
    fr = np.hypot(f[:, None], f[None, :])
    return np.fft.ifft2(np.fft.fft2(x) * (fr <= fc)).real.astype(np.float32)


def test_identical_images_give_unit_frc():
    img = speckle_field((96, 96), grain_px=5.0, seed=0).astype(np.float32)
    out = fourier_ring_correlation(img, img)
    assert np.nanmax(np.abs(out["frc"][1:] - 1.0)) < 1e-4
    # never crosses the threshold -> no finite resolution
    assert np.isnan(out["resolution_cyc_per_px"])
    assert np.isnan(out["resolution_px"])


def test_independent_noise_decorrelates():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(128, 128)).astype(np.float32)
    b = rng.normal(size=(128, 128)).astype(np.float32)
    out = fourier_ring_correlation(a, b)
    # high-frequency rings hold many samples: FRC there is ~0
    assert np.nanmax(np.abs(out["frc"][20:])) < 0.25
    assert np.nanmean(np.abs(out["frc"][20:])) < 0.08


def test_resolution_tracks_the_common_band_edge():
    """Shared band-limited signal + independent noise: the 0.143 crossing
    lands at the band edge."""
    n, fc = 256, 0.18
    sig = _band_limited(n, fc, seed=2)
    rng = np.random.default_rng(3)
    scale = sig.std()
    a = sig + rng.normal(size=(n, n)).astype(np.float32) * 0.05 * scale
    b = sig + rng.normal(size=(n, n)).astype(np.float32) * 0.05 * scale
    out = fourier_ring_correlation(a, b)
    assert out["frc"][3] > 0.99            # inside the band: correlated
    res = out["resolution_cyc_per_px"]
    assert fc - 0.01 <= res <= fc + 0.01, res
    np.testing.assert_allclose(out["resolution_px"], 1.0 / res)
    # a stricter threshold crosses at or before (never beyond) the band edge
    res_half = fourier_ring_correlation(a, b, threshold=0.5)[
        "resolution_cyc_per_px"
    ]
    assert res_half <= res + 1e-9


def test_curve_shape_and_freq_axis():
    img = speckle_field((64, 80), grain_px=4.0, seed=4).astype(np.float32)
    out = fourier_ring_correlation(img, img)
    nr = min(64, 80) // 2
    assert out["frc"].shape == (nr,) and out["freq"].shape == (nr,)
    np.testing.assert_allclose(out["freq"][1] - out["freq"][0], 1.0 / 64)
    assert out["freq"][0] == 0.0


def test_validation_errors():
    img = np.ones((16, 16), np.float32)
    with pytest.raises(ValueError, match="2D"):
        fourier_ring_correlation(img[None], img[None])
    with pytest.raises(ValueError, match="shape"):
        fourier_ring_correlation(img, np.ones((16, 18), np.float32))
    with pytest.raises(ValueError, match="threshold"):
        fourier_ring_correlation(img, img, threshold=1.5)
