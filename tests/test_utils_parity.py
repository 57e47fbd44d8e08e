# SPDX-License-Identifier: CECILL-2.1
"""Utils parity vs the actual reference: dtype conversion and robust ranges."""
import sys

import numpy as np
import pytest

REF_PATH = "/root/reference/src"


@pytest.fixture(scope="module")
def ref_utils():
    import pathlib

    if not pathlib.Path(REF_PATH).exists():
        pytest.skip("reference package not available")
    sys.path.insert(0, REF_PATH)
    from barc4dip.utils import dtype as ref_dtype
    from barc4dip.utils import range as ref_range

    yield ref_dtype, ref_range
    sys.path.remove(REF_PATH)


def test_to_uint16_counts_path(ref_utils, rng):
    from barc4dip_tpu.utils import to_uint16

    ref_dtype, _ = ref_utils
    img = (rng.normal(30000, 5000, size=(64, 64))).astype(np.float32)
    img = np.clip(img, 0, 66000)
    np.testing.assert_array_equal(to_uint16(img), ref_dtype.to_uint16(img))


def test_to_uint16_normalized_path(ref_utils, rng):
    from barc4dip_tpu.utils import to_uint16

    ref_dtype, _ = ref_utils
    img = rng.random(size=(64, 64)).astype(np.float32)  # mean < 10 -> stretch
    got = to_uint16(img)
    want = ref_dtype.to_uint16(img)
    # identical modulo float32 rounding at the integer boundary
    assert got.dtype == want.dtype == np.uint16
    assert np.mean(np.abs(got.astype(int) - want.astype(int)) <= 1) > 0.999


def test_filtered_minmax_range_parity(ref_utils, rng):
    from barc4dip_tpu.utils import filtered_minmax_range

    _, ref_range = ref_utils
    img = rng.normal(1000, 100, size=(48, 48)).astype(np.float32)
    img[3, 3] = 1e6  # salt pixel suppressed by the median prefilter
    got = filtered_minmax_range(img)
    want = ref_range.filtered_minmax_range(img)
    assert got[0] == pytest.approx(want[0], rel=1e-6)
    assert got[1] == pytest.approx(want[1], rel=1e-6)


def test_percentile_minmax_range_parity(ref_utils, rng):
    from barc4dip_tpu.utils import percentile_minmax_range

    _, ref_range = ref_utils
    img = rng.normal(1000, 100, size=(200, 200))
    got = percentile_minmax_range(img)
    want = ref_range.percentile_minmax_range(img)
    assert got[0] == pytest.approx(want[0], rel=1e-9)
    assert got[1] == pytest.approx(want[1], rel=1e-9)


def test_round_uint16_bounds_parity(ref_utils):
    from barc4dip_tpu.utils import round_uint16_bounds

    ref_dtype, _ = ref_utils
    for vmin, vmax in ((123.0, 4567.0), (-50.0, 70000.0), (999.9, 1000.1)):
        assert round_uint16_bounds(vmin, vmax) == ref_dtype.round_uint16_bounds(vmin, vmax)
