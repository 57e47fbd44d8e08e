# SPDX-License-Identifier: CECILL-2.1
"""Preprocessing tests: flat-field golden, deconvolution restoration power,
CLAHE properties, distortion correction."""
import numpy as np
import pytest
from scipy.ndimage import gaussian_filter, median_filter

from barc4dip_tpu.preprocessing import deconvolve_psf, flat_field_correction
from barc4dip_tpu.preprocessing.distortion import correct_distortion
from barc4dip_tpu.preprocessing.enhancement import clahe
from tests.conftest import make_speckle


def _ref_flat_field(images, flats=None, darks=None, scale="flat_median",
                    bad_pixel_removal=False, eps=None):
    img = images.astype(np.float32)
    is_stack = img.ndim == 3

    def red(a):
        if a is None:
            return None
        return a.astype(np.float32).mean(axis=0) if a.ndim == 3 else a.astype(np.float32)

    flat2d, dark2d = red(flats), red(darks)
    if flat2d is None and dark2d is None:
        return img.copy()
    if dark2d is None:
        dark2d = np.zeros_like(flat2d)
    if flat2d is None:
        return img - (dark2d if not is_stack else dark2d[None])

    den = flat2d - dark2d
    if eps is None:
        med = np.median(den)
        eps = 1e-6 * med if med > 0 else 1e-6
    bad = den <= eps
    den_safe = den.copy()
    den_safe[bad] = 1.0
    num = img - (dark2d if not is_stack else dark2d[None])
    out = num / (den_safe if not is_stack else den_safe[None])
    if scale != "none":
        valid = ~bad
        s = np.mean(den[valid]) if scale == "flat_mean" else np.median(den[valid])
        out = out * s
    if not is_stack:
        out[bad] = 0.0
    else:
        out[:, bad] = 0.0
    if bad_pixel_removal:
        rep = median_filter(out, size=(1, 3, 3) if is_stack else (3, 3))
        if not is_stack:
            out[bad] = rep[bad]
        else:
            out[:, bad] = rep[:, bad]
    return out.astype(np.float32)


@pytest.mark.parametrize("scale", ["none", "flat_mean", "flat_median"])
def test_flat_field_golden_2d(rng, scale):
    img = rng.normal(1000, 50, size=(64, 64)).astype(np.float32)
    flat = rng.normal(2000, 100, size=(64, 64)).astype(np.float32)
    dark = rng.normal(100, 5, size=(64, 64)).astype(np.float32)
    flat[3, 3] = dark[3, 3]  # bad pixel

    got = flat_field_correction(img, flats=flat, darks=dark, scale=scale)
    want = _ref_flat_field(img, flat, dark, scale=scale)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)
    assert got[3, 3] == 0.0


def test_flat_field_golden_stack_with_repair(rng):
    img = rng.normal(1000, 50, size=(3, 32, 32)).astype(np.float32)
    flat = rng.normal(2000, 100, size=(5, 32, 32)).astype(np.float32)
    dark = rng.normal(100, 5, size=(2, 32, 32)).astype(np.float32)
    flat[:, 5, 7] = dark[:, 5, 7].mean() - 1.0  # dead pixel in all flats

    got = flat_field_correction(
        img, flats=flat, darks=dark, bad_pixel_removal=True
    )
    want = _ref_flat_field(img, flat, dark, bad_pixel_removal=True)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)


def test_flat_field_degenerate_paths(rng):
    img = rng.normal(size=(16, 16)).astype(np.float32)
    np.testing.assert_allclose(flat_field_correction(img), img)
    dark = np.full((16, 16), 0.5, np.float32)
    np.testing.assert_allclose(
        flat_field_correction(img, darks=dark), img - 0.5, rtol=1e-6
    )
    with pytest.raises(ValueError):
        flat_field_correction(img, scale="bogus")


@pytest.mark.parametrize("method", ["wiener", "rl", "uw"])
def test_deconvolution_restores_blur(method):
    rng = np.random.default_rng(5)
    sharp = make_speckle(rng, shape=(128, 128), grain_px=4.0).astype(np.float32)
    sharp /= sharp.max()
    sigma = 1.5
    blurred = gaussian_filter(sharp, sigma).astype(np.float32)

    restored = deconvolve_psf(blurred, sigma=sigma, method=method)
    assert restored.shape == sharp.shape
    err_blur = np.mean((blurred - sharp) ** 2)
    err_rest = np.mean((restored - sharp) ** 2)
    assert err_rest < 0.8 * err_blur, (method, err_rest, err_blur)


def test_deconvolution_stack_and_anisotropic():
    rng = np.random.default_rng(6)
    sharp = make_speckle(rng, shape=(96, 96), grain_px=4.0).astype(np.float32)
    sharp /= sharp.max()
    blurred = gaussian_filter(sharp, (2.0, 1.0)).astype(np.float32)
    stack = np.stack([blurred, blurred])
    out = deconvolve_psf(stack, sigma=(2.0, 1.0), method="wiener")
    assert out.shape == stack.shape
    np.testing.assert_allclose(out[0], out[1], rtol=1e-6)


def test_flat_field_residence_follows_input(rng):
    """NumPy in -> NumPy out; device in -> device out (same values), so
    preprocessing chains on-chip without explicit as_numpy plumbing."""
    import jax
    import jax.numpy as jnp

    img = rng.normal(1000.0, 30.0, size=(48, 48)).astype(np.float32)
    flat = rng.normal(2000.0, 40.0, size=(48, 48)).astype(np.float32)

    host = flat_field_correction(img, flats=flat)
    assert isinstance(host, np.ndarray) and not isinstance(host, jax.Array)

    dev = flat_field_correction(jnp.asarray(img), flats=flat)
    assert isinstance(dev, jax.Array)
    np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-6, atol=1e-6)

    # explicit overrides still win
    assert isinstance(
        flat_field_correction(jnp.asarray(img), flats=flat, as_numpy=True),
        np.ndarray,
    )
    assert isinstance(flat_field_correction(img, flats=flat, as_numpy=False), jax.Array)
    # degenerate paths follow the same rule
    assert isinstance(flat_field_correction(jnp.asarray(img)), jax.Array)
    assert isinstance(flat_field_correction(img), np.ndarray)


def test_deconvolve_residence_follows_input(rng):
    import jax
    import jax.numpy as jnp

    img = gaussian_filter(
        rng.normal(1000.0, 200.0, size=(64, 64)).astype(np.float32), 1.2
    )
    host = deconvolve_psf(img, sigma=1.2, method="wiener")
    dev = deconvolve_psf(jnp.asarray(img), sigma=1.2, method="wiener")
    assert isinstance(host, np.ndarray) and isinstance(dev, jax.Array)
    np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-5, atol=1e-5)

    stack = np.stack([img, img * 1.1, img * 0.9]).astype(np.float32)
    dev_stack = deconvolve_psf(jnp.asarray(stack), sigma=1.2, method="wiener",
                               frame_chunk=2)
    host_stack = deconvolve_psf(stack, sigma=1.2, method="wiener", frame_chunk=2)
    assert isinstance(dev_stack, jax.Array)
    np.testing.assert_allclose(np.asarray(dev_stack), host_stack, rtol=1e-5, atol=1e-5)


def test_deconvolution_validation():
    img = np.ones((32, 32), np.float32)
    with pytest.raises(ValueError):
        deconvolve_psf(img, sigma=-1.0)
    with pytest.raises(ValueError):
        deconvolve_psf(img, sigma=1.0, method="bogus")
    with pytest.raises(TypeError):
        deconvolve_psf([[1.0]], sigma=1.0)


def test_clahe_improves_local_contrast():
    rng = np.random.default_rng(7)
    # low-contrast image with a dim gradient
    base = (rng.normal(30000, 500, size=(128, 128))).astype(np.uint16)
    out = clahe(base, clip_limit=4.0, tile_grid_size=(8, 8))
    assert out.dtype == np.uint16
    assert out.shape == base.shape
    assert out.std() > base.std()  # contrast expanded


def test_clahe_close_to_opencv_uint8():
    import cv2

    rng = np.random.default_rng(8)
    img = (rng.integers(80, 160, size=(64, 64))).astype(np.uint8)
    ours = clahe(img, clip_limit=2.0, tile_grid_size=(4, 4)).astype(np.float64)
    cv = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(4, 4)).apply(img).astype(np.float64)
    # same algorithm family; implementations differ in excess-redistribution
    # details, so require strong agreement rather than bit equality
    corr = np.corrcoef(ours.ravel(), cv.ravel())[0, 1]
    assert corr > 0.98


def test_distortion_identity_and_barrel():
    rng = np.random.default_rng(9)
    img = rng.normal(size=(64, 64))
    ident = np.asarray(correct_distortion(img))
    np.testing.assert_allclose(ident, img, rtol=1e-6, atol=1e-6)

    warped = np.asarray(correct_distortion(img, k1=0.05))
    assert warped.shape == img.shape
    # center pixel is fixed under pure radial distortion
    assert warped[32, 32] == pytest.approx(img[32, 32], abs=1e-3)
    # corners move -> output differs
    assert not np.allclose(warped, img)


def test_distortion_stack():
    img = np.random.default_rng(10).normal(size=(2, 32, 32))
    out = np.asarray(correct_distortion(img, k1=0.02))
    assert out.shape == img.shape
    np.testing.assert_allclose(out[0], np.asarray(correct_distortion(img[0], k1=0.02)))
