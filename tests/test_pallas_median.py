# SPDX-License-Identifier: CECILL-2.1
"""Pallas 3x3 median kernel: interpreter-mode parity with scipy and with the
lax fallback (the compiled TPU path is exercised by the bench/drive runs)."""
import numpy as np
import pytest
from scipy import ndimage

import jax
import jax.numpy as jnp

from barc4dip_tpu.ops.pallas_median import _median9, median3x3_pallas


def test_median9_network_matches_sort(rng):
    vals = [jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32)) for _ in range(9)]
    got = np.asarray(_median9(vals))
    want = np.median(np.stack([np.asarray(v) for v in vals]), axis=0)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("shape", [(64, 64), (200, 130), (256, 256), (300, 257)])
def test_pallas_median_interpret_matches_scipy(rng, shape):
    """Run the kernel in interpreter mode (works on CPU) and compare against
    scipy.ndimage.median_filter."""
    from jax.experimental import pallas as pl
    from unittest import mock

    x = rng.normal(size=shape).astype(np.float32)

    orig_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig_call(*args, **kwargs)

    with mock.patch.object(pl, "pallas_call", interp_call):
        got = np.asarray(median3x3_pallas(jnp.asarray(x)))

    want = ndimage.median_filter(x, size=3, mode="reflect")
    np.testing.assert_array_equal(got, want)
