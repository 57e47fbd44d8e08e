# SPDX-License-Identifier: CECILL-2.1
"""Golden tests: peak widths and radial means vs NumPy/SciPy references."""
import numpy as np
import pytest
from scipy.interpolate import RegularGridInterpolator

from barc4dip_tpu.maths import (
    distance_at_fraction_from_peak,
    radial_mean_binned,
    radial_mean_interpolated,
    width_at_fraction,
)


# --- independent reference implementations (documented semantics) ----------

def _ref_width_at_fraction(p, fraction, center_index=None):
    p = np.asarray(p, dtype=float)
    c = int(np.argmax(p)) if center_index is None else int(center_index)
    c = max(0, min(c, p.size - 1))
    thr = p[c] * fraction
    i_left = next((i for i in range(c, -1, -1) if p[i] < thr), None)
    i_right = next((i for i in range(c, p.size) if p[i] < thr), None)
    if i_left is None or i_right is None:
        return float(p.size), True
    y0, y1 = p[i_left], p[i_left + 1]
    x_left = float(i_left) if y1 == y0 else i_left + (thr - y0) / (y1 - y0)
    y0, y1 = p[i_right - 1], p[i_right]
    x_right = float(i_right) if y1 == y0 else (i_right - 1) + (thr - y0) / (y1 - y0)
    return float(x_right - x_left), False


def _ref_distance_at_fraction(p, fraction, peak_index=0):
    p = np.asarray(p, dtype=float)
    k0 = max(0, min(int(peak_index), p.size - 1))
    thr = p[k0] * fraction
    i_cross = next((i for i in range(k0, p.size) if p[i] < thr), None)
    if i_cross is None:
        return float(p.size), True
    if i_cross == k0:
        return 0.0, False
    y0, y1 = p[i_cross - 1], p[i_cross]
    x = float(i_cross) if y1 == y0 else (i_cross - 1) + (thr - y0) / (y1 - y0)
    return float(x - k0), False


def _ref_radial_binned(z, r_max=None, bin_size=1.0):
    z = np.asarray(z, dtype=float)
    ny, nx = z.shape
    x = np.arange(nx, dtype=float) - nx // 2
    y = np.arange(ny, dtype=float) - ny // 2
    if r_max is None:
        r_max = min(np.max(np.abs(x)), np.max(np.abs(y)))
    Y, X = np.meshgrid(y, x, indexing="ij")
    R = np.sqrt(X * X + Y * Y)
    nbins = int(np.floor(r_max / bin_size)) + 1
    ids = np.floor(R / bin_size).astype(np.int64)
    mask = ids < nbins
    sums = np.bincount(ids[mask].ravel(), weights=z[mask].ravel(), minlength=nbins)
    counts = np.bincount(ids[mask].ravel(), minlength=nbins)
    radial = np.full(nbins, np.nan)
    ok = counts > 0
    radial[ok] = sums[ok] / counts[ok]
    return radial, (np.arange(nbins) + 0.5) * bin_size


def _ref_radial_interp(z, fill_value=0.0):
    z = np.asarray(z, dtype=float)
    ny, nx = z.shape
    x = np.arange(nx, dtype=float) - nx // 2
    y = np.arange(ny, dtype=float) - ny // 2
    r_max = min(np.max(np.abs(x)), np.max(np.abs(y)))
    nr = int(np.floor(r_max)) + 1
    ntheta = int(2.0 * np.pi * 180.0)
    r = np.linspace(0.0, r_max, nr)
    theta = np.linspace(0.0, 2 * np.pi, ntheta, endpoint=False)
    R, T = np.meshgrid(r, theta, indexing="ij")
    pts = np.column_stack([(R * np.sin(T)).ravel(), (R * np.cos(T)).ravel()])
    interp = RegularGridInterpolator((y, x), z, bounds_error=False, fill_value=fill_value)
    vals = interp(pts).reshape(R.shape)
    return vals.mean(axis=1), r


# --- width tests -----------------------------------------------------------

def _gaussian_profile(n=101, sigma=7.0):
    x = np.arange(n) - n // 2
    return np.exp(-0.5 * (x / sigma) ** 2)


@pytest.mark.parametrize("fraction", [1 / np.e, 0.5, 0.9])
def test_width_at_fraction_gaussian(fraction):
    p = _gaussian_profile()
    got = width_at_fraction(p, fraction=fraction)
    ref = _ref_width_at_fraction(p, fraction)
    assert got[1] == ref[1]
    assert got[0] == pytest.approx(ref[0], rel=1e-10)


def test_width_at_fraction_random_profiles(rng):
    for _ in range(25):
        p = np.abs(rng.normal(size=64)).cumsum()
        p = p * np.exp(-0.1 * np.arange(64))
        got = width_at_fraction(p, fraction=0.4)
        ref = _ref_width_at_fraction(p, 0.4)
        assert got[1] == ref[1]
        assert got[0] == pytest.approx(ref[0], rel=1e-9)


def test_width_hit_edge():
    p = np.ones(32)
    w, hit = width_at_fraction(p, fraction=0.5)
    assert hit is True and w == 32.0


def test_width_explicit_center():
    p = _gaussian_profile()
    got = width_at_fraction(p, fraction=0.5, center_index=45)
    ref = _ref_width_at_fraction(p, 0.5, center_index=45)
    assert got[0] == pytest.approx(ref[0], rel=1e-10)


def test_distance_at_fraction_gaussian():
    p = _gaussian_profile(n=60, sigma=10.0)[30:]  # radial-style decay from peak
    got = distance_at_fraction_from_peak(p, fraction=1 / np.e)
    ref = _ref_distance_at_fraction(p, 1 / np.e)
    assert got[1] == ref[1]
    assert got[0] == pytest.approx(ref[0], rel=1e-10)


def test_distance_hit_edge():
    p = np.ones(16)
    d, hit = distance_at_fraction_from_peak(p, fraction=0.5)
    assert hit is True and d == 16.0


def test_distance_at_peak_below_threshold():
    p = np.array([-1.0, 5.0, 4.0, 3.0])
    # peak_index=0 with negative value: thr > p[0] -> crossing at k0 -> 0.0
    d, hit = distance_at_fraction_from_peak(p, fraction=0.5, peak_index=0)
    ref = _ref_distance_at_fraction(p, 0.5, 0)
    assert (d, hit) == (pytest.approx(ref[0]), ref[1])


def test_width_validation():
    with pytest.raises(ValueError):
        width_at_fraction(np.ones((3, 3)))
    with pytest.raises(ValueError):
        width_at_fraction(np.ones(5), fraction=1.5)


# --- radial tests ----------------------------------------------------------

@pytest.mark.parametrize("shape", [(64, 64), (65, 63), (40, 60)])
def test_radial_mean_binned_golden(rng, shape):
    z = rng.normal(size=shape)
    radial, r = radial_mean_binned(z)
    ref_radial, ref_r = _ref_radial_binned(z)
    np.testing.assert_allclose(np.asarray(r), ref_r)
    np.testing.assert_allclose(np.asarray(radial), ref_radial, rtol=1e-10, atol=1e-12)


def test_radial_mean_binned_custom_bins(rng):
    z = rng.normal(size=(48, 48))
    radial, r = radial_mean_binned(z, r_max=20.0, bin_size=2.5)
    ref_radial, ref_r = _ref_radial_binned(z, r_max=20.0, bin_size=2.5)
    np.testing.assert_allclose(np.asarray(r), ref_r)
    np.testing.assert_allclose(np.asarray(radial), ref_radial, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("shape", [(64, 64), (65, 65), (50, 70)])
def test_radial_mean_interpolated_golden(rng, shape):
    z = rng.normal(size=shape)
    radial, r = radial_mean_interpolated(z)
    ref_radial, ref_r = _ref_radial_interp(z)
    np.testing.assert_allclose(np.asarray(r), ref_r, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(radial), ref_radial, rtol=1e-8, atol=1e-10)


def test_radial_rejects_nonfinite():
    z = np.ones((16, 16))
    z[3, 3] = np.nan
    with pytest.raises(ValueError):
        radial_mean_binned(z)


@pytest.mark.parametrize("dtype,bin_size", [
    (np.float32, 0.1), (np.float32, 0.37), (np.float64, 0.1), (np.float32, 1.0),
])
def test_binned_counts_match_device_ids(dtype, bin_size):
    """The host-precomputed per-bin counts must agree with the device
    program's bin ids at the SAME float precision — boundary pixels used
    to land in different bins (f64 host vs f32 device: 360 mismatches at
    2048^2 with bin_size=0.1)."""
    import jax.numpy as jnp

    from barc4dip_tpu.ops.radialcore import (
        _binned_counts,
        _radius_field,
        binned_geometry,
        radial_mean_binned_core,
    )

    shape = (512, 512)
    _, nbins, _ = binned_geometry(shape, None, float(bin_size))
    R = _radius_field(shape, jnp.dtype(dtype))
    ids = np.asarray(jnp.floor(R / bin_size).astype(jnp.int32)).ravel()
    dev_counts = np.bincount(ids[ids < nbins], minlength=nbins)
    host_counts = _binned_counts(shape, float(bin_size), nbins, np.dtype(dtype).name)
    np.testing.assert_array_equal(host_counts, dev_counts)

    # end to end: ones image -> every populated bin's mean is exactly 1
    ones = jnp.ones(shape, dtype=dtype)
    radial, _ = radial_mean_binned_core(ones, bin_size=float(bin_size))
    radial = np.asarray(radial)
    populated = np.isfinite(radial)
    np.testing.assert_allclose(radial[populated], 1.0, rtol=1e-6)


@pytest.mark.parametrize("n", [64, 65, 128])
def test_radial_interpolated_centrosymmetric_exact(rng, n):
    """The half-ring fast path must equal the full-circle mean EXACTLY
    (f64 roundoff) on a centro-symmetric map, for even and odd sizes —
    including the outermost ring where one member of a theta pair is
    out-of-bounds on even grids."""
    import jax.numpy as jnp

    from barc4dip_tpu.ops.corrcore import autocorr2d_core
    from barc4dip_tpu.ops.radialcore import radial_mean_interpolated_core

    img = rng.normal(size=(n, n))
    ac = autocorr2d_core(
        jnp.asarray(img), remove_mean=True, standardize=False,
        normalize="peak",
    )
    full, r1 = radial_mean_interpolated_core(ac)
    half, r2 = radial_mean_interpolated_core(ac, centrosymmetric=True)
    np.testing.assert_allclose(np.asarray(half), np.asarray(full),
                               atol=1e-13, rtol=0)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_radial_interpolated_centrosymmetric_fill_value(rng):
    """Non-zero fill_value must weight exactly like the full circle."""
    import jax.numpy as jnp

    from barc4dip_tpu.ops.corrcore import autocorr2d_core
    from barc4dip_tpu.ops.radialcore import radial_mean_interpolated_core

    img = rng.normal(size=(64, 64))
    ac = autocorr2d_core(
        jnp.asarray(img), remove_mean=True, standardize=False,
        normalize="peak",
    )
    full, _ = radial_mean_interpolated_core(ac, fill_value=7.5)
    half, _ = radial_mean_interpolated_core(
        ac, fill_value=7.5, centrosymmetric=True
    )
    np.testing.assert_allclose(np.asarray(half), np.asarray(full),
                               atol=1e-13, rtol=0)
