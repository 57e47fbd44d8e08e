# SPDX-License-Identifier: CECILL-2.1
"""Dense metric maps (metrics/maps.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from barc4dip_tpu.metrics import visibility_map
from barc4dip_tpu.utils.synthetic import speckle_field


def _brute_force(img, w):
    H, W = img.shape
    out = np.empty((H - w + 1, W - w + 1), np.float64)
    for i in range(out.shape[0]):
        for j in range(out.shape[1]):
            patch = img[i : i + w, j : j + w].astype(np.float64)
            m = patch.mean()
            out[i, j] = patch.std() / m if m > 0 else np.nan
    return out


def test_matches_brute_force_sliding_window():
    rng = np.random.default_rng(0)
    img = (rng.random((24, 30)).astype(np.float32) + 0.2) * 100.0
    got = visibility_map(img, window=5)
    want = _brute_force(img, 5)
    assert got.shape == (20, 26)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_nonpositive_mean_windows_are_nan():
    img = np.zeros((12, 12), np.float32)
    img[8:, 8:] = 5.0
    got = visibility_map(img, window=4)
    assert np.isnan(got[0, 0])           # all-zero window -> mean 0 -> NaN
    assert np.isfinite(got[-1, -1])      # window overlapping the signal


def test_stride_subsamples_the_full_map():
    rng = np.random.default_rng(1)
    img = rng.random((32, 32)).astype(np.float32) + 0.5
    full = visibility_map(img, window=8)
    dec = visibility_map(img, window=8, stride=3)
    np.testing.assert_array_equal(dec, full[::3, ::3])


def test_stack_and_device_residence():
    stack = np.stack(
        [speckle_field((48, 48), grain_px=4.0, seed=s).astype(np.float32)
         for s in range(3)]
    )
    out_np = visibility_map(stack, window=9)
    assert out_np.shape == (3, 40, 40)
    assert isinstance(out_np, np.ndarray)
    out_dev = visibility_map(jnp.asarray(stack), window=9)
    assert isinstance(out_dev, jnp.ndarray)
    np.testing.assert_allclose(np.asarray(out_dev), out_np, atol=1e-6)
    # per-frame independence: frame 0 alone matches the stack's slice
    np.testing.assert_array_equal(visibility_map(stack[0], window=9), out_np[0])


def test_visibility_definition_matches_full_frame_metric():
    # a window covering the whole frame reproduces the amplitude
    # estimator's visibility scalar (same std/mean definition)
    from barc4dip_tpu.metrics import amplitude

    img = speckle_field((64, 64), grain_px=5.0, seed=7).astype(np.float32)
    vm = visibility_map(img, window=64)
    assert vm.shape == (1, 1)
    vis = amplitude(img, verbose=False)["visibility"]
    np.testing.assert_allclose(vm[0, 0], vis, rtol=2e-5)


def test_f32_accuracy_at_production_count_levels():
    """The separable box sums must hold f32 round-off accuracy on a large
    frame at detector count levels (~1e3-1e4), where an integral-image
    formulation loses ~3 significant digits to cancellation."""
    img = (speckle_field((512, 512), grain_px=5.0, seed=11) * 12.0 + 5000.0)
    img = img.astype(np.float32)
    got = visibility_map(img, window=16, stride=16)
    img64 = img.astype(np.float64)
    for i in range(0, got.shape[0], 7):       # spot-check a grid of windows
        for j in range(0, got.shape[1], 7):
            patch = img64[16 * i : 16 * i + 16, 16 * j : 16 * j + 16]
            want = patch.std() / patch.mean()
            np.testing.assert_allclose(got[i, j], want, rtol=1e-4)


def test_validation_errors():
    img = np.ones((16, 16), np.float32)
    with pytest.raises(ValueError, match="window"):
        visibility_map(img, window=1)
    with pytest.raises(ValueError, match="stride"):
        visibility_map(img, stride=0)
    with pytest.raises(ValueError, match="exceeds"):
        visibility_map(img, window=17)
    with pytest.raises(ValueError, match="2D"):
        visibility_map(img[None, None])
    with pytest.raises(TypeError):
        visibility_map([[1.0]])
