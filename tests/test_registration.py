# SPDX-License-Identifier: CECILL-2.1
"""Stack registration (preprocessing/registration.py).

Ground-truth strategy mirrors the tracking tests: synthesize a smooth
band-limited speckle field, translate it by KNOWN shifts (circular, so
Fourier/roll translation is exact), and require register_stack to (a)
measure the shifts back and (b) return frames aligned to the reference.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from barc4dip_tpu.preprocessing import register_stack, shift_stack
from barc4dip_tpu.utils.synthetic import speckle_field


def _field(n=96, seed=3):
    f = speckle_field((n, n), grain_px=6.0, seed=seed).astype(np.float32)
    return f / f.mean()


def _roll_stack(ref, shifts):
    return np.stack(
        [np.roll(ref, (int(dy), int(dx)), axis=(0, 1)) for dy, dx in shifts]
    )


def _fourier_stack(ref, shifts):
    fy = np.fft.fftfreq(ref.shape[0])[:, None]
    fx = np.fft.fftfreq(ref.shape[1])[None, :]
    F = np.fft.fft2(ref)
    return np.stack(
        [
            np.fft.ifft2(F * np.exp(-2j * np.pi * (fy * dy + fx * dx))).real
            for dy, dx in shifts
        ]
    ).astype(np.float32)


SHIFTS_INT = [(0, 0), (3, -2), (-5, 7), (10, 4)]
SHIFTS_SUB = [(0.0, 0.0), (1.3, -2.6), (-3.4, 4.75), (6.2, -0.8)]


def test_integer_shifts_roll_mode_exact_roundtrip():
    ref = _field()
    stack = _roll_stack(ref, SHIFTS_INT)
    aligned, shifts = register_stack(
        stack, reference="first", subpixel=False, shift_mode="roll",
        frame_chunk=3,
    )
    np.testing.assert_allclose(shifts["dy"], [s[0] for s in SHIFTS_INT])
    np.testing.assert_allclose(shifts["dx"], [s[1] for s in SHIFTS_INT])
    # integer roll undoes an integer roll exactly
    np.testing.assert_array_equal(aligned, np.broadcast_to(ref, stack.shape))


def test_subpixel_fourier_registration_recovers_shifts():
    ref = _field()
    stack = _fourier_stack(ref, SHIFTS_SUB)
    aligned, shifts = register_stack(stack, reference="first", frame_chunk=2)
    err = np.hypot(
        shifts["dy"] - [s[0] for s in SHIFTS_SUB],
        shifts["dx"] - [s[1] for s in SHIFTS_SUB],
    )
    assert err.max() < 0.05, err
    # the Fourier shift undoes a Fourier shift up to the measurement error
    scale = np.abs(ref).max()
    assert np.abs(aligned - ref[None]).max() / scale < 0.02


def test_previous_reference_integrates_incremental_drift():
    ref = _field()
    # a steadily growing drift: frame-to-frame motion is small even though
    # the total is large — the use case for reference="previous"
    shifts = [(0.0, 0.0), (1.2, -0.7), (2.5, -1.3), (3.9, -2.2), (5.1, -2.8)]
    stack = _fourier_stack(ref, shifts)
    aligned, got = register_stack(stack, reference="previous", frame_chunk=2)
    err = np.hypot(
        got["dy"] - [s[0] for s in shifts], got["dx"] - [s[1] for s in shifts]
    )
    assert err.max() < 0.08, err  # cumulative: errors add over frames
    assert got["dy"][0] == got["dx"][0] == 0.0
    scale = np.abs(ref).max()
    assert np.abs(aligned - ref[None]).max() / scale < 0.03


def test_mean_reference_mode_runs_and_centers_shifts():
    ref = _field()
    stack = _fourier_stack(ref, [(-2.0, 1.0), (0.0, 0.0), (2.0, -1.0)])
    aligned, shifts = register_stack(stack, reference="mean")
    # drift measured against the blurred mean is still the relative motion:
    # pairwise differences must match the injected ones
    np.testing.assert_allclose(
        shifts["dy"] - shifts["dy"][1], [-2.0, 0.0, 2.0], atol=0.1
    )
    np.testing.assert_allclose(
        shifts["dx"] - shifts["dx"][1], [1.0, 0.0, -1.0], atol=0.1
    )
    assert aligned.shape == stack.shape


def test_device_resident_input_stays_on_device_and_matches_numpy():
    ref = _field()
    stack = _fourier_stack(ref, SHIFTS_SUB)
    a_np, s_np = register_stack(stack, reference="first", frame_chunk=2)
    a_dev, s_dev = register_stack(
        jnp.asarray(stack), reference="first", frame_chunk=2
    )
    assert isinstance(a_dev, jnp.ndarray) and not isinstance(a_np, jnp.ndarray)
    np.testing.assert_allclose(np.asarray(a_dev), a_np, rtol=0, atol=1e-6)
    np.testing.assert_allclose(s_dev["dy"], s_np["dy"], atol=1e-6)
    np.testing.assert_allclose(s_dev["dx"], s_np["dx"], atol=1e-6)


def test_shift_stack_fourier_matches_numpy_reference():
    ref = _field(n=64)
    dy, dx = 2.3, -1.7
    ours = shift_stack(ref, dy, dx)  # 2D single-frame path
    theirs = _fourier_stack(ref, [(dy, dx)])[0]
    np.testing.assert_allclose(ours, theirs, atol=2e-5)
    assert ours.shape == ref.shape


def test_shift_stack_roll_is_lossless_and_chunk_invariant():
    ref = _field(n=64)
    stack = np.stack([ref, ref * 2.0, ref + 1.0, ref - 0.5, ref * 0.3])
    dy = np.array([1, -2, 0, 5, -7], np.float32)
    dx = np.array([-3, 4, 0, -1, 6], np.float32)
    a = shift_stack(stack, dy, dx, shift_mode="roll", frame_chunk=2)
    b = shift_stack(stack, dy, dx, shift_mode="roll", frame_chunk=5)
    np.testing.assert_array_equal(a, b)
    for t in range(5):
        np.testing.assert_array_equal(
            a[t], np.roll(stack[t], (int(dy[t]), int(dx[t])), axis=(0, 1))
        )


def test_register_then_speckle_stack_chain():
    # the motivating pipeline: align, then compute stack metrics on the
    # registered frames — residual temporal drift must be ~0
    from barc4dip_tpu.metrics import speckle_stack_stats

    ref = _field(n=128)
    stack = _fourier_stack(ref, SHIFTS_SUB)
    aligned, _ = register_stack(stack)
    out = speckle_stack_stats(
        np.ascontiguousarray(aligned), metrics=("grain",), tiles=False,
        verbose=False, grain_maps=False,
    )
    r = np.hypot(out["temporal"]["abs"]["dy"], out["temporal"]["abs"]["dx"])
    assert np.nanmax(r) < 0.1, r


def test_validation_errors():
    ref = _field(n=32)
    with pytest.raises(ValueError, match="reference"):
        register_stack(np.stack([ref, ref]), reference="nope")
    with pytest.raises(ValueError, match="shift_mode"):
        register_stack(np.stack([ref, ref]), shift_mode="nope")
    with pytest.raises(ValueError, match="3D"):
        register_stack(ref)
    with pytest.raises(TypeError):
        register_stack([[1.0]])
    with pytest.raises(ValueError, match="shift_mode"):
        shift_stack(ref, 1.0, 1.0, shift_mode="nope")
