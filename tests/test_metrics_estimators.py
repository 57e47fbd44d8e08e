# SPDX-License-Identifier: CECILL-2.1
"""Golden tests: every speckle/sharpness estimator vs independent NumPy
formulations at <=1e-5 relative error (the driver's parity target)."""
import numpy as np
import pytest

from barc4dip_tpu.metrics import (
    amplitude,
    bandwidth,
    distribution_moments,
    eigenvalues,
    grain,
    inverse_autocorr_width,
    laplacian_variance,
    spectral_entropy,
    tenengrad,
)
from tests import reference_impl as ref
from tests.conftest import make_speckle

RTOL = 1e-5


@pytest.fixture(scope="module")
def field():
    rng = np.random.default_rng(11)
    return make_speckle(rng, shape=(256, 192), grain_px=6.0)


@pytest.fixture(scope="module")
def square_field():
    rng = np.random.default_rng(12)
    return make_speckle(rng, shape=(256, 256), grain_px=5.0)


def test_amplitude_golden(field):
    got = amplitude(field)
    want = ref.amplitude_metrics(field)
    assert got["visibility"] == pytest.approx(want["visibility"], rel=RTOL)
    assert got["contrast"] == pytest.approx(want["contrast"], rel=RTOL)


def test_amplitude_rejects_nonpositive_mean():
    with pytest.raises(ValueError):
        amplitude(np.zeros((16, 16)) - 5.0)


@pytest.mark.parametrize("shape", [(256, 256), (256, 192)])
def test_grain_golden(shape):
    rng = np.random.default_rng(13)
    field = make_speckle(rng, shape=shape, grain_px=6.0)
    got = grain(field)
    want = ref.grain_metrics(field)
    assert got["lx"] == pytest.approx(want["lx"], rel=RTOL)
    assert got["ly"] == pytest.approx(want["ly"], rel=RTOL)
    assert got["leq"] == pytest.approx(want["leq"], rel=RTOL)
    assert got["r"] == pytest.approx(want["r"], rel=RTOL)
    np.testing.assert_allclose(got["autocorr"], want["autocorr"], rtol=1e-7, atol=1e-9)


def test_grain_tracks_known_grain_size(square_field):
    # grain_px=5 -> 1/e width of intensity autocorr ~ grain size scale
    got = grain(square_field)
    assert 3.0 < got["lx"] < 12.0
    assert 3.0 < got["ly"] < 12.0
    assert 0.7 < got["r"] < 1.4  # isotropic field

def test_grain_min_size():
    with pytest.raises(ValueError):
        grain(np.ones((100, 100)))


def test_bandwidth_golden(field):
    got = bandwidth(field)
    want = ref.bandwidth_metrics(field)
    for k in ("feq", "f95", "sig_fx", "sig_fy", "rf", "spr"):
        assert got[k] == pytest.approx(want[k], rel=RTOL), k


def test_tenengrad_golden(field):
    got = tenengrad(field)
    want = ref.tenengrad_metrics(field)
    for k in ("tenengrad", "ex", "ey", "re"):
        assert got[k] == pytest.approx(want[k], rel=RTOL), k


def test_laplacian_variance_golden(field):
    assert laplacian_variance(field) == pytest.approx(
        ref.laplacian_variance_metric(field), rel=RTOL
    )


def test_spectral_entropy_golden(field):
    assert spectral_entropy(field) == pytest.approx(
        ref.spectral_entropy_metric(field), rel=RTOL
    )


def test_inverse_autocorr_width_golden(field):
    got = inverse_autocorr_width(field)
    want = ref.inverse_autocorr_width_metrics(field)
    for k in ("sx", "sy", "seq", "r"):
        assert got[k] == pytest.approx(want[k], rel=RTOL), k


def test_inverse_autocorr_width_min_size():
    with pytest.raises(ValueError):
        inverse_autocorr_width(np.ones((16, 16)))


def test_eigenvalues_golden(field):
    got = eigenvalues(field)
    want = ref.eigenvalues_metrics(field)
    assert got["eigenvalues"] == pytest.approx(want["eigenvalues"], rel=RTOL)
    assert got["e1"] == pytest.approx(want["e1"], rel=RTOL)
    assert got["e2"] == pytest.approx(want["e2"], rel=RTOL)
    assert got["re"] == pytest.approx(want["re"], rel=RTOL)


def test_eigenvalues_rejects_zero_image():
    with pytest.raises(ValueError):
        eigenvalues(np.zeros((32, 32)))


def test_eigenvalues_subspace_matches_dense_above_gate():
    """Frames >= 1024 take the subspace-iteration top-k path; it must agree
    with a dense solve at ~1e-6 (the advertised bound, ops/eig.py)."""
    import jax.numpy as jnp

    from barc4dip_tpu.ops.eig import topk_eigvalsh_subspace

    rng = np.random.default_rng(17)
    base = make_speckle(rng, shape=(1100, 1100), grain_px=7.0)
    x = jnp.asarray(base)
    x = x / jnp.sqrt(jnp.sum(x * x))
    J = x - jnp.mean(x)
    G = jnp.matmul(J, J.T, precision="highest")

    dense = np.flip(np.linalg.eigvalsh(np.asarray(G)))[:5]
    sub = np.asarray(topk_eigvalsh_subspace(G, 5))
    np.testing.assert_allclose(sub, dense, rtol=5e-6)

    # the public estimator (which routes through the gate at this size)
    got = eigenvalues(base)
    denom = base.size - 1
    assert got["eigenvalues"] == pytest.approx(float(dense.sum() / denom), rel=1e-5)
    assert got["e1"] == pytest.approx(float(dense[0] / denom), rel=1e-5)


def test_distribution_moments_public(field):
    from scipy.stats import describe

    got = distribution_moments(field)
    x = field.ravel()
    assert got["mean"] == pytest.approx(x.mean(), rel=1e-10)
    assert got["std"] == pytest.approx(x.std(ddof=0), rel=1e-10)
    d = describe(x)
    assert got["skewness"] == pytest.approx(d.skewness, rel=1e-7)
    assert got["kurtosis"] == pytest.approx(d.kurtosis, rel=1e-7)
    assert got["frac_sat"] == pytest.approx(np.mean(x >= 65535.0))


def test_sharpness_ranks_focus_series():
    """Sharper images must score higher (ex_01 semantics: argmax over a
    focus scan finds the sharpest frame)."""
    rng = np.random.default_rng(3)
    base = make_speckle(rng, shape=(256, 256), grain_px=4.0)
    from scipy.ndimage import gaussian_filter

    blurred = [gaussian_filter(base, s) for s in (0.0, 1.0, 2.5, 5.0)]
    ten = [tenengrad(b)["tenengrad"] for b in blurred]
    lap = [laplacian_variance(b) for b in blurred]
    assert ten == sorted(ten, reverse=True)
    assert lap == sorted(lap, reverse=True)
