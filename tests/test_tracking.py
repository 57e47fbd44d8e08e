# SPDX-License-Identifier: CECILL-2.1
"""Tracking tests: known synthetic shifts must be recovered (ex_04-style
ground-truth validation) and geometry conventions must match the reference."""
import numpy as np
import pytest

from barc4dip_tpu.geometry import roi_slices
from barc4dip_tpu.signal.tracking import (
    phase_correlation,
    template_matching,
    track_translation,
)
from tests.conftest import make_speckle


def _shifted_frame(field, dy, dx):
    """Shift by (dy, dx) with subpixel accuracy via Fourier shift theorem."""
    ny, nx = field.shape
    fy = np.fft.fftfreq(ny)[:, None]
    fx = np.fft.fftfreq(nx)[None, :]
    F = np.fft.fft2(field)
    return np.real(np.fft.ifft2(F * np.exp(-2j * np.pi * (fy * dy + fx * dx))))


@pytest.fixture()
def scene(rng):
    return make_speckle(rng, shape=(256, 256), grain_px=8.0)


@pytest.mark.parametrize("shift", [(3, -5), (-7, 2), (0, 0)])
def test_template_matching_integer_shift(scene, shift):
    dy_true, dx_true = shift
    frame = _shifted_frame(scene, dy_true, dx_true)
    sl = roi_slices(scene.shape, (61, 61))
    tpl = scene[sl[0], sl[1]]
    dy, dx, peak, snr = template_matching(tpl, frame, slices_yx=sl, subpixel=False)
    assert dy == pytest.approx(dy_true)
    assert dx == pytest.approx(dx_true)
    assert peak > 0.9
    assert snr > 5


@pytest.mark.parametrize("shift", [(2.3, -1.7), (-0.4, 3.6)])
def test_template_matching_subpixel_shift(scene, shift):
    dy_true, dx_true = shift
    frame = _shifted_frame(scene, dy_true, dx_true)
    sl = roi_slices(scene.shape, (61, 61))
    tpl = scene[sl[0], sl[1]]
    dy, dx, _, _ = template_matching(tpl, frame, slices_yx=sl, subpixel=True)
    assert dy == pytest.approx(dy_true, abs=0.15)
    assert dx == pytest.approx(dx_true, abs=0.15)


@pytest.mark.parametrize("backend", ["opencv", "skimage"])
def test_template_backends_agree(scene, backend):
    frame = _shifted_frame(scene, 4.0, -3.0)
    sl = roi_slices(scene.shape, (61, 61))
    tpl = scene[sl[0], sl[1]]
    dy, dx, _, _ = template_matching(tpl, frame, slices_yx=sl, backend=backend)
    assert dy == pytest.approx(4.0, abs=0.1)
    assert dx == pytest.approx(-3.0, abs=0.1)


def test_template_matching_vs_opencv_map_peak(scene):
    """Peak position parity with cv2.matchTemplate on the same inputs."""
    import cv2

    frame = _shifted_frame(scene, 5.0, 7.0).astype(np.float32)
    sl = roi_slices(scene.shape, (41, 41), center_yx=(100, 90))
    tpl = scene[sl[0], sl[1]].astype(np.float32)

    z = (frame - frame.mean()) / frame.std()
    tz = (tpl - tpl.mean()) / tpl.std()
    ref_map = cv2.matchTemplate(z, tz, method=cv2.TM_CCOEFF_NORMED)
    ri, rj = np.unravel_index(np.argmax(ref_map), ref_map.shape)

    dy, dx, peak, _ = template_matching(tpl, frame, slices_yx=sl, subpixel=False)
    # reconstruct our peak indices from (dy, dx)
    y0 = (sl[0].start + sl[0].stop - 1) / 2.0
    x0 = (sl[1].start + sl[1].stop - 1) / 2.0
    assert ri == int(dy + y0 - 20)
    assert rj == int(dx + x0 - 20)
    assert peak == pytest.approx(ref_map.max(), abs=1e-3)


@pytest.mark.parametrize("shift", [(6, -9), (0, 0)])
def test_phase_correlation_integer(scene, shift):
    dy_true, dx_true = shift
    frame = _shifted_frame(scene, dy_true, dx_true)
    sl = roi_slices(scene.shape, (101, 101))
    tpl = scene[sl[0], sl[1]]
    dy, dx, peak, snr = phase_correlation(tpl, frame, slices_yx=sl, subpixel=False)
    assert dy == pytest.approx(dy_true)
    assert dx == pytest.approx(dx_true)
    assert np.isfinite(peak) and np.isfinite(snr)


@pytest.mark.parametrize("shift", [(1.4, -2.6)])
def test_phase_correlation_subpixel(scene, shift):
    dy_true, dx_true = shift
    frame = _shifted_frame(scene, dy_true, dx_true)
    sl = roi_slices(scene.shape, (101, 101))
    tpl = scene[sl[0], sl[1]]
    dy, dx, _, _ = phase_correlation(tpl, frame, slices_yx=sl, subpixel=True)
    assert dy == pytest.approx(dy_true, abs=0.25)
    assert dx == pytest.approx(dx_true, abs=0.25)


def test_phase_correlation_skimage_backend(scene):
    frame = _shifted_frame(scene, 3.7, -2.2)
    sl = roi_slices(scene.shape, (101, 101))
    tpl = scene[sl[0], sl[1]]
    dy, dx, peak, snr = phase_correlation(
        tpl, frame, slices_yx=sl, backend="skimage", subpixel=True
    )
    assert np.isnan(peak) and np.isnan(snr)
    # embedded-template whitened correlation carries an inherent sub-pixel
    # bias (verified identical against a NumPy replica of skimage's
    # phase_cross_correlation); parity tolerance is within the coarse pixel
    assert dy == pytest.approx(3.7, abs=0.75)
    assert dx == pytest.approx(-2.2, abs=0.75)


def test_track_translation_dispatch(scene):
    frame = _shifted_frame(scene, 2, 2)
    sl = roi_slices(scene.shape, (61, 61))
    tpl = scene[sl[0], sl[1]]
    r1 = track_translation(tpl, frame, slices_yx=sl, method="template", backend="skimage")
    r2 = template_matching(tpl, frame, slices_yx=sl, backend="skimage")
    assert r1 == r2
    with pytest.raises(ValueError):
        track_translation(tpl, frame, method="bogus")


def test_upsampled_dft_matches_known_shift(rng):
    """Native upsampled phase correlation recovers fine subpixel shifts."""
    field = make_speckle(rng, shape=(128, 128), grain_px=5.0)
    moved = _shifted_frame(field, -1.35, 2.15)
    from barc4dip_tpu.ops.upsampled_dft import phase_cross_correlation_upsampled

    dy, dx = phase_cross_correlation_upsampled(field, moved, upsample_factor=50)
    # registering `moved` to `field`: shift is -(applied shift)
    assert float(dy) == pytest.approx(1.35, abs=0.03)
    assert float(dx) == pytest.approx(-2.15, abs=0.03)
