# SPDX-License-Identifier: CECILL-2.1
"""Golden tests: circular correlation vs direct NumPy FFT formulas."""
import numpy as np
import pytest

from barc4dip_tpu.signal import corr as scorr


def _np_xcorr2d(a, b, remove_mean=True, standardize=False, normalize="peak"):
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    if remove_mean:
        a = a - a.mean()
        b = b - b.mean()
    if standardize:
        sa, sb = a.std(), b.std()
        if sa > 0:
            a = a / sa
        if sb > 0:
            b = b / sb
    c = np.fft.fftshift(np.fft.ifft2(np.fft.fft2(a) * np.conj(np.fft.fft2(b)))).real
    if normalize == "peak":
        m = np.max(np.abs(c))
        if m > 0:
            c = c / m
    return c


@pytest.mark.parametrize("shape", [(64, 64), (63, 65)])
@pytest.mark.parametrize("remove_mean", [True, False])
@pytest.mark.parametrize("standardize", [True, False])
@pytest.mark.parametrize("normalize", ["none", "peak"])
def test_xcorr2d_golden(rng, shape, remove_mean, standardize, normalize):
    a = rng.normal(size=shape) * 7 + 3
    b = rng.normal(size=shape) * 2 - 1
    corr, xlag, ylag = scorr.xcorr2d(
        a, b, remove_mean=remove_mean, standardize=standardize, normalize=normalize
    )
    ref = _np_xcorr2d(a, b, remove_mean, standardize, normalize)
    np.testing.assert_allclose(np.asarray(corr), ref, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(xlag, (np.arange(shape[1]) - shape[1] // 2) * 1.0)
    np.testing.assert_allclose(ylag, (np.arange(shape[0]) - shape[0] // 2) * 1.0)


def test_autocorr2d_is_real_and_peaked(speckle):
    ac, xlag, ylag = scorr.autocorr2d(speckle)
    ac = np.asarray(ac)
    assert not np.iscomplexobj(ac)
    ref = _np_xcorr2d(speckle, speckle)
    np.testing.assert_allclose(ac, ref, rtol=1e-7, atol=1e-8)
    iy, ix = np.unravel_index(np.argmax(ac), ac.shape)
    assert (iy, ix) == (speckle.shape[0] // 2, speckle.shape[1] // 2)
    assert ac[iy, ix] == pytest.approx(1.0)


def test_xcorr1d_golden(rng):
    a = rng.normal(size=101)
    b = np.roll(a, 7)
    corr, xlag = scorr.xcorr1d(a, b, normalize="peak")
    c = np.asarray(corr)
    # circular shift of 7 -> peak at lag -7 relative to center
    assert xlag[np.argmax(c)] == -7
    ref1 = np.fft.fftshift(
        np.fft.ifft(np.fft.fft(a - a.mean()) * np.conj(np.fft.fft(b - b.mean())))
    ).real
    ref1 = ref1 / np.max(np.abs(ref1))
    np.testing.assert_allclose(c, ref1, rtol=1e-9, atol=1e-9)


def test_xcorr2d_physical_lags(rng):
    a = rng.normal(size=(16, 32))
    corr, xlag, ylag = scorr.xcorr2d(a, a, dx=0.5, dy=2.0)
    np.testing.assert_allclose(xlag, (np.arange(32) - 16) * 0.5)
    np.testing.assert_allclose(ylag, (np.arange(16) - 8) * 2.0)


def test_invalid_normalize_raises(rng):
    a = rng.normal(size=(8, 8))
    with pytest.raises(ValueError):
        scorr.xcorr2d(a, a, normalize="bogus")
