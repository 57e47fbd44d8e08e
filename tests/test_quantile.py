# SPDX-License-Identifier: CECILL-2.1
"""Sort-free exact quantiles vs np.nanpercentile."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from barc4dip_tpu.ops.quantile import (
    median_exact,
    nanmedian_exact,
    nanpercentiles_exact,
)


@pytest.mark.parametrize("n", [11, 100, 2048, 100003])
@pytest.mark.parametrize("ps", [(0.05, 99.95), (50.0,), (0.0, 25.0, 100.0)])
def test_matches_numpy_percentile(rng, n, ps):
    x = rng.normal(size=n) * 1000
    got = np.asarray(jax.jit(lambda a: nanpercentiles_exact(a, ps))(jnp.asarray(x)))
    want = np.percentile(x, list(ps))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)


def test_nan_aware(rng):
    x = rng.normal(size=5000)
    x[::7] = np.nan
    got = np.asarray(nanpercentiles_exact(jnp.asarray(x), (10.0, 90.0)))
    want = np.nanpercentile(x, [10.0, 90.0])
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_median(rng):
    x = rng.normal(size=4001)
    assert float(median_exact(jnp.asarray(x))) == pytest.approx(np.median(x), rel=1e-12)
    x2 = rng.normal(size=4000)  # even count -> interpolated
    assert float(median_exact(jnp.asarray(x2))) == pytest.approx(np.median(x2), rel=1e-12)
    x2[5] = np.nan
    assert float(nanmedian_exact(jnp.asarray(x2))) == pytest.approx(
        np.nanmedian(x2), rel=1e-12
    )


def test_float32_path(rng):
    x = (rng.normal(size=10000) * 100).astype(np.float32)
    got = np.asarray(nanpercentiles_exact(jnp.asarray(x), (0.05, 99.95)))
    want = np.percentile(x.astype(np.float64), [0.05, 99.95])
    # f32 interpolation arithmetic limits agreement to ~1e-5 relative
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_negative_and_special_values():
    x = np.array([-np.inf, -5.0, -0.0, 0.0, 3.0, np.inf, np.nan])
    got = np.asarray(nanpercentiles_exact(jnp.asarray(x), (50.0,)))
    # isfinite excludes +-inf and nan -> median of [-5, -0, 0, 3]
    want = np.percentile(np.array([-5.0, -0.0, 0.0, 3.0]), 50.0)
    np.testing.assert_allclose(got, [want])


def test_all_nan():
    x = np.full(10, np.nan)
    got = np.asarray(nanpercentiles_exact(jnp.asarray(x), (50.0,)))
    assert np.isnan(got).all()


def test_infinities_rank_like_nanpercentile():
    """Only NaNs are excluded: +/-inf participate in the ranking. Exact hits
    on an infinite order statistic return +/-inf — the correct order
    statistic, where numpy's lerp emits NaN with RuntimeWarnings — and
    interior quantiles match numpy."""
    import jax.numpy as jnp

    from barc4dip_tpu.ops.quantile import nanpercentiles_exact

    x = np.array([0.0, 1.0, 2.0, np.inf, np.nan, -np.inf])
    got = np.asarray(nanpercentiles_exact(jnp.asarray(x), (0.0, 50.0, 100.0)))
    np.testing.assert_array_equal(got, [-np.inf, 1.0, np.inf])
    # interior quantile agrees with numpy (which is well-defined there)
    np.testing.assert_allclose(
        got[1], np.nanpercentile(x, 50.0), rtol=0, atol=0
    )
