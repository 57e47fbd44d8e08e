# SPDX-License-Identifier: CECILL-2.1
"""Public synthetic-data generators: ground-truth properties hold."""
import numpy as np
import pytest

from barc4dip_tpu.utils import speckle_field, speckle_stack, spiral_motion


def test_speckle_field_grain_matches_request():
    """The grain metric recovers the requested correlation length."""
    from barc4dip_tpu.metrics import speckle_stats

    field = speckle_field((384, 384), grain_px=8.0, seed=5, dtype=np.float64)
    g = speckle_stats(field, metrics="grain", tiles=False, verbose=False)
    leq = float(g["full"]["grain"]["leq"])
    assert 5.0 < leq < 12.0, leq  # tracks grain_px up to speckle statistics


def test_speckle_field_reproducible_and_scaled():
    a = speckle_field((64, 64), seed=3)
    b = speckle_field((64, 64), seed=3)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.float32
    assert a.mean() == pytest.approx(1000.0, rel=1e-3)


def test_speckle_stack_motion_is_exact():
    """Tracking the generated stack recovers the requested motion."""
    from barc4dip_tpu.metrics import speckle_stack_stats

    dys = np.array([0.0, 1.25, -2.5])
    dxs = np.array([0.0, -0.75, 1.5])
    stack = speckle_stack(
        3, (256, 256), grain_px=5.0, dys=dys, dxs=dxs, dtype=np.float64
    )
    out = speckle_stack_stats(
        stack, metrics="amplitude,stats", tiles=False, verbose=False
    )
    np.testing.assert_allclose(out["temporal"]["abs"]["dy"], dys, atol=0.05)
    np.testing.assert_allclose(out["temporal"]["abs"]["dx"], dxs, atol=0.05)


def test_speckle_stack_validation_and_dtype():
    with pytest.raises(ValueError, match="dys/dxs"):
        speckle_stack(3, (64, 64), dys=np.zeros(2), dxs=np.zeros(3))
    u16 = speckle_stack(2, (64, 64), mean_counts=8000.0, dtype=np.uint16)
    assert u16.dtype == np.uint16 and u16.max() <= 65535
    dys, dxs = spiral_motion(4)
    assert dys.shape == (4,) and dxs[0] == 0.0
