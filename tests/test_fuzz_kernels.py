# SPDX-License-Identifier: CECILL-2.1
"""Randomized property tests for the hand-vectorised kernels (widths,
quantiles, NCC peaks) across adversarial profiles — many seeds, exact
comparison against straightforward NumPy formulations."""
import numpy as np
import pytest

import jax.numpy as jnp

from barc4dip_tpu.maths import distance_at_fraction_from_peak, width_at_fraction
from barc4dip_tpu.ops.quantile import nanpercentiles_exact
from tests.reference_impl import distance_at_fraction as ref_dist
from tests.reference_impl import width_at_fraction as ref_width


def _adversarial_profiles(rng, n):
    yield np.zeros(n) + 1.0                          # constant
    yield np.linspace(0, 1, n)                        # monotone ramp
    yield np.linspace(1, 0, n)                        # reverse ramp
    p = np.zeros(n); p[0] = 1.0
    yield p                                           # peak at edge
    p = np.zeros(n); p[-1] = 1.0
    yield p                                           # peak at other edge
    yield rng.normal(size=n)                          # signed noise
    yield np.abs(rng.normal(size=n)) + 1e-9           # positive noise
    p = rng.normal(size=n); p[n // 2] = 100.0
    yield p                                           # spike
    yield np.repeat(rng.normal(size=max(1, n // 4)), 4)[:n]  # plateaus/ties
    p = -np.abs(rng.normal(size=n))
    yield p                                           # all-negative


@pytest.mark.parametrize("n", [5, 16, 33, 128])
@pytest.mark.parametrize("fraction", [0.1, 1 / np.e, 0.5, 0.9])
def test_width_at_fraction_fuzz(rng, n, fraction):
    for k, p in enumerate(_adversarial_profiles(rng, n)):
        got = width_at_fraction(p, fraction=fraction)
        want = ref_width(p, fraction)
        assert got[1] == want[1], (k, p[:6])
        assert got[0] == pytest.approx(want[0], rel=1e-9, abs=1e-12), (k, p[:6])


@pytest.mark.parametrize("n", [5, 16, 128])
@pytest.mark.parametrize("fraction", [0.2, 1 / np.e, 0.8])
def test_distance_at_fraction_fuzz(rng, n, fraction):
    for k, p in enumerate(_adversarial_profiles(rng, n)):
        for peak_index in (0, n // 2, n - 1):
            got = distance_at_fraction_from_peak(
                p, fraction=fraction, peak_index=peak_index
            )
            want = ref_dist(p, fraction, peak_index)
            assert got[1] == want[1], (k, peak_index)
            assert got[0] == pytest.approx(want[0], rel=1e-9, abs=1e-12), (k, peak_index)


def test_quantile_fuzz(rng):
    for trial in range(20):
        n = int(rng.integers(2, 5000))
        kind = trial % 4
        if kind == 0:
            x = rng.normal(size=n) * 10.0 ** float(rng.integers(-3, 6))
        elif kind == 1:
            x = rng.integers(-5, 5, size=n).astype(float)  # heavy ties
        elif kind == 2:
            x = np.full(n, float(rng.normal()))            # constant
        else:
            x = rng.normal(size=n)
            x[rng.random(size=n) < 0.3] = np.nan           # many NaNs
            if np.all(np.isnan(x)):
                x[0] = 1.0
        ps = tuple(sorted(rng.uniform(0, 100, size=3)))
        got = np.asarray(nanpercentiles_exact(jnp.asarray(x), ps))
        want = np.nanpercentile(x, list(ps))
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12,
                                   err_msg=f"trial {trial} n={n} kind={kind}")


def test_pull_centrosymmetric_fuzz(rng):
    """Half-pull reconstruction matches a full pull to dtype eps for PSD and
    autocorr of real input, across random (odd/even, rectangular) shapes."""
    from barc4dip_tpu.signal import autocorr2d, psd2d, pull_centrosymmetric

    for trial in range(12):
        ny = int(rng.integers(16, 97))
        nx = int(rng.integers(16, 97))
        img = rng.normal(size=(ny, nx)) * 10.0 ** float(rng.integers(-2, 4))
        for dev_map, _, _ in (psd2d(img), autocorr2d(img)):
            full = np.asarray(dev_map)
            half = pull_centrosymmetric(dev_map)
            tol = 500 * np.finfo(full.dtype).eps * max(np.abs(full).max(), 1e-30)
            np.testing.assert_allclose(
                half, full, rtol=0, atol=tol,
                err_msg=f"trial {trial} shape=({ny},{nx})",
            )


def test_ncc_affine_invariance_fuzz(rng):
    """NCC is invariant to affine rescaling of image and template (the
    property the reference's TM_CCOEFF_NORMED backend relies on)."""
    from barc4dip_tpu.ops.ncc import ncc_valid

    for trial in range(8):
        H = int(rng.integers(40, 90))
        W = int(rng.integers(40, 90))
        s = int(rng.integers(7, 20))
        img = rng.normal(size=(H, W))
        y0 = int(rng.integers(0, H - s)); x0 = int(rng.integers(0, W - s))
        tpl = img[y0:y0+s, x0:x0+s] + 0.01 * rng.normal(size=(s, s))

        base = np.asarray(ncc_valid(jnp.asarray(img), jnp.asarray(tpl)))
        a = 10.0 ** float(rng.integers(-2, 3))
        b = float(rng.normal()) * 100.0
        scaled = np.asarray(ncc_valid(jnp.asarray(a * img + b),
                                      jnp.asarray(0.5 * a * tpl - b)))
        np.testing.assert_allclose(scaled, base, rtol=0, atol=5e-6,
                                   err_msg=f"trial {trial}")
        # the peak must be at the template's source position
        pk = np.unravel_index(np.argmax(base), base.shape)
        assert pk == (y0, x0), f"trial {trial}: peak {pk} != ({y0},{x0})"
