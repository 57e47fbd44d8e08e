# SPDX-License-Identifier: CECILL-2.1
"""Golden tests for stencil / rank / moments / NCC device kernels."""
import numpy as np
import pytest
from scipy import ndimage
from scipy.stats import describe

import jax.numpy as jnp

from barc4dip_tpu.ops import (
    distribution_moments_core,
    laplace,
    median_filter2d,
    ncc_valid,
    sobel_x,
    sobel_y,
)


@pytest.mark.parametrize("shape", [(32, 32), (33, 47)])
def test_sobel_matches_scipy(rng, shape):
    x = rng.normal(size=shape)
    np.testing.assert_allclose(
        np.asarray(sobel_x(jnp.asarray(x))),
        ndimage.sobel(x, axis=1, mode="reflect"),
        rtol=1e-10, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(sobel_y(jnp.asarray(x))),
        ndimage.sobel(x, axis=0, mode="reflect"),
        rtol=1e-10, atol=1e-10,
    )


def test_laplace_matches_scipy(rng):
    x = rng.normal(size=(40, 28))
    np.testing.assert_allclose(
        np.asarray(laplace(jnp.asarray(x))),
        ndimage.laplace(x, mode="reflect"),
        rtol=1e-10, atol=1e-10,
    )


@pytest.mark.parametrize("size", [3, 5])
def test_median_filter_matches_scipy(rng, size):
    x = rng.normal(size=(31, 27))
    np.testing.assert_allclose(
        np.asarray(median_filter2d(jnp.asarray(x), size=size)),
        ndimage.median_filter(x, size=size, mode="reflect"),
        rtol=1e-12, atol=1e-12,
    )


def test_median_filter_stack(rng):
    x = rng.normal(size=(3, 16, 16))
    np.testing.assert_allclose(
        np.asarray(median_filter2d(jnp.asarray(x), size=3)),
        ndimage.median_filter(x, size=(1, 3, 3), mode="reflect"),
        rtol=1e-12, atol=1e-12,
    )


def test_distribution_moments_golden(rng):
    x = rng.normal(size=(64, 64)) * 120 + 900
    x[5, 5] = np.nan
    x[10, 2] = np.inf
    x[0, 0] = 0.0
    x[1, 1] = 70000.0

    out = {k: float(v) for k, v in distribution_moments_core(jnp.asarray(x)).items()}

    xf = x.ravel()[np.isfinite(x.ravel())]
    assert out["mean"] == pytest.approx(xf.mean(), rel=1e-12)
    assert out["std"] == pytest.approx(xf.std(ddof=0), rel=1e-12)
    assert out["variance"] == pytest.approx(xf.std(ddof=0) ** 2, rel=1e-12)
    d = describe(xf)
    # summation-order differences show up in high moments of outlier-heavy
    # data; 1e-6 rel is far tighter than the 1e-5 parity target
    assert out["skewness"] == pytest.approx(d.skewness, rel=1e-6, abs=1e-12)
    assert out["kurtosis"] == pytest.approx(d.kurtosis, rel=1e-6, abs=1e-12)
    assert out["frac_zero"] == pytest.approx(np.mean(np.abs(xf) <= 1e-6))
    assert out["frac_sat"] == pytest.approx(np.mean(xf >= 65535.0))
    assert out["SNRdB"] == pytest.approx(20 * np.log10(xf.mean() / xf.std()), rel=1e-12)


def test_distribution_moments_edge_cases():
    const = np.full(100, 5.0)
    out = distribution_moments_core(jnp.asarray(const))
    assert float(out["SNRdB"]) == np.inf
    assert np.isnan(float(out["skewness"]))

    zeros = np.zeros(50)
    out = distribution_moments_core(jnp.asarray(zeros))
    assert np.isnan(float(out["SNRdB"]))  # std=0, mean=0

    out = distribution_moments_core(jnp.asarray(const), saturation_value=None)
    assert np.isnan(float(out["frac_sat"]))


@pytest.mark.parametrize("tpl_shape", [(15, 15), (24, 16)])
def test_ncc_matches_opencv(rng, tpl_shape):
    import cv2

    img = (rng.normal(size=(96, 80)) * 50 + 500).astype(np.float32)
    h, w = tpl_shape
    tpl = img[30 : 30 + h, 20 : 20 + w].copy() + rng.normal(size=tpl_shape).astype(np.float32)

    ref = cv2.matchTemplate(img, tpl, method=cv2.TM_CCOEFF_NORMED)
    got = np.asarray(ncc_valid(jnp.asarray(img, dtype=jnp.float64), jnp.asarray(tpl, dtype=jnp.float64)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)
    # peak location must agree exactly
    assert np.unravel_index(np.argmax(got), got.shape) == np.unravel_index(
        np.argmax(ref), ref.shape
    )


def test_ncc_peak_at_known_location(rng):
    img = rng.normal(size=(128, 128))
    tpl = img[40:71, 50:81].copy()
    got = np.asarray(ncc_valid(jnp.asarray(img), jnp.asarray(tpl)))
    assert np.unravel_index(np.argmax(got), got.shape) == (40, 50)
    assert got.max() == pytest.approx(1.0, abs=1e-8)


def test_radial_binned_core_accepts_any_dtype():
    """Regression: the host-precomputed bin counts must not crash for
    uint16/float16 inputs (id dtype resolution used a jnp class repr)."""
    import jax.numpy as jnp

    from barc4dip_tpu.ops.radialcore import radial_mean_binned_core

    for dt in (np.uint16, np.float16, np.float32):
        r, c = radial_mean_binned_core(jnp.asarray(np.ones((16, 16), dt)))
        r = np.asarray(r, np.float64)
        assert np.allclose(r[np.isfinite(r)], 1.0), dt
