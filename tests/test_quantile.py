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


def test_integer_range_matches_generic_and_numpy():
    """The integer-value-space bisection (uint16 provenance contract) must
    equal both the generic bit-space path and np.nanpercentile exactly on
    integer-valued float data, including NaN exclusion and edge ranks."""
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 65536, size=5001).astype(np.float32)
    vals[::97] = np.nan
    ps = (0.0, 0.05, 37.2, 50.0, 99.95, 100.0)
    got_int = np.asarray(
        nanpercentiles_exact(jnp.asarray(vals), ps, integer_range=(0, 65535))
    )
    got_gen = np.asarray(nanpercentiles_exact(jnp.asarray(vals), ps))
    ref = np.nanpercentile(vals.astype(np.float64), list(ps))
    np.testing.assert_array_equal(got_int, got_gen)
    np.testing.assert_allclose(got_int, ref, rtol=1e-6)


def test_integer_range_small_span_and_negative():
    x = np.array([-3.0, -1.0, 0.0, 2.0, 2.0, 7.0])
    got = np.asarray(
        nanpercentiles_exact(jnp.asarray(x), (0.0, 50.0, 100.0),
                             integer_range=(-3, 7))
    )
    ref = np.percentile(x, [0.0, 50.0, 100.0])
    np.testing.assert_allclose(got, ref)


def test_integer_range_rejects_wide_span():
    import pytest

    with pytest.raises(ValueError):
        nanpercentiles_exact(
            jnp.asarray(np.zeros(4, np.float32)), (50.0,),
            integer_range=(0, 1 << 25),
        )


def test_amplitude_uint16_hint_matches_float_path():
    """speckle_stats amplitude on a uint16 image (integer-range fast path)
    equals the same image pre-cast to float32 (generic bit-space path)."""
    import barc4dip_tpu as dip

    rng = np.random.default_rng(3)
    img = rng.integers(10, 60000, size=(160, 160)).astype(np.uint16)
    a = dip.speckle_stats(img, metrics="amplitude", tiles=False, verbose=False)
    b = dip.speckle_stats(
        img.astype(np.float32), metrics="amplitude", tiles=False, verbose=False
    )
    for k in ("visibility", "contrast"):
        np.testing.assert_allclose(
            a["full"]["amplitude"][k], b["full"]["amplitude"][k], rtol=0, atol=0
        )
