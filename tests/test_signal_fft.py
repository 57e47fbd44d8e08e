# SPDX-License-Identifier: CECILL-2.1
"""Golden tests: shifted FFT / PSD conventions vs direct NumPy formulas."""
import numpy as np
import pytest

from barc4dip_tpu.signal import fft as sfft


def test_freq_axis1d_matches_numpy():
    for n in (8, 9, 250, 251):
        np.testing.assert_allclose(
            sfft.freq_axis1d(n=n, dx=0.5),
            np.fft.fftshift(np.fft.fftfreq(n, d=0.5)),
        )


def test_freq_axis1d_from_axis():
    x = np.linspace(0.0, 10.0, 100, endpoint=False)
    np.testing.assert_allclose(
        sfft.freq_axis1d(n=100, x=x),
        np.fft.fftshift(np.fft.fftfreq(100, d=0.1)),
        rtol=1e-12,
    )


def test_freq_axis_rejects_both_calibrations():
    with pytest.raises(ValueError):
        sfft.freq_axis1d(n=10, x=np.arange(10.0), dx=2.0)


def test_fft1d_roundtrip_and_shift(rng):
    s = rng.normal(size=101)
    F, fx = sfft.fft1d(s)
    np.testing.assert_allclose(np.asarray(F), np.fft.fftshift(np.fft.fft(s)), rtol=1e-10, atol=1e-9)
    back = sfft.ifft1d(F)
    np.testing.assert_allclose(np.asarray(back).real, s, rtol=1e-10, atol=1e-9)


@pytest.mark.parametrize("shape", [(64, 64), (63, 64), (65, 33)])
def test_fft2d_matches_numpy(rng, shape):
    img = rng.normal(size=shape)
    F, fx, fy = sfft.fft2d(img, dx=2.0, dy=3.0)
    np.testing.assert_allclose(np.asarray(F), np.fft.fftshift(np.fft.fft2(img)), rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(fx, np.fft.fftshift(np.fft.fftfreq(shape[1], d=2.0)))
    np.testing.assert_allclose(fy, np.fft.fftshift(np.fft.fftfreq(shape[0], d=3.0)))
    back = sfft.ifft2d(F)
    np.testing.assert_allclose(np.asarray(back).real, img, rtol=1e-9, atol=1e-8)


@pytest.mark.parametrize("shape", [(64, 64), (63, 65), (64, 63)])
@pytest.mark.parametrize("scale", [True, False])
def test_psd2d_matches_numpy(rng, shape, scale):
    img = rng.normal(size=shape)
    P, fx, fy = sfft.psd2d(img, dx=1.5, dy=0.5, scale=scale)
    ref = np.abs(np.fft.fftshift(np.fft.fft2(img))) ** 2
    if scale:
        ref = ref * (1.5 * 0.5) / (shape[0] * shape[1])
    np.testing.assert_allclose(np.asarray(P), ref, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("n", [64, 65])
@pytest.mark.parametrize("scale", [True, False])
def test_psd1d_matches_numpy(rng, n, scale):
    s = rng.normal(size=n)
    P, fx = sfft.psd1d(s, dx=0.25, scale=scale)
    ref = np.abs(np.fft.fftshift(np.fft.fft(s))) ** 2
    if scale:
        ref = ref * 0.25 / n
    np.testing.assert_allclose(np.asarray(P), ref, rtol=1e-9, atol=1e-9)


def test_psd2d_complex_input(rng):
    img = rng.normal(size=(32, 32)) + 1j * rng.normal(size=(32, 32))
    P, _, _ = sfft.psd2d(img, scale=False)
    ref = np.abs(np.fft.fftshift(np.fft.fft2(img))) ** 2
    np.testing.assert_allclose(np.asarray(P), ref, rtol=1e-9, atol=1e-8)


class TestPullCentrosymmetric:
    """Half-transfer materialisation of centro-symmetric maps."""

    @pytest.mark.parametrize("shape", [(64, 64), (63, 64), (64, 62), (63, 61)])
    def test_psd_and_autocorr_match_full_pull(self, shape):
        from barc4dip_tpu.signal import autocorr2d, psd2d, pull_centrosymmetric

        rng = np.random.default_rng(5)
        img = rng.normal(size=shape)
        for dev_map, _, _ in (psd2d(img), autocorr2d(img)):
            full = np.asarray(dev_map)
            half = pull_centrosymmetric(dev_map)
            assert half.shape == full.shape
            np.testing.assert_allclose(
                half, full, rtol=0, atol=200 * np.finfo(full.dtype).eps * np.abs(full).max()
            )

    def test_mirror_rectangular_and_batched(self):
        from barc4dip_tpu.ops.symmetry import HALF_ROWS, mirror_centrosymmetric

        # build an exactly centro-symmetric batched map and round-trip it
        rng = np.random.default_rng(6)
        for N0, N1 in ((32, 48), (33, 48), (32, 47), (33, 47)):
            spec = rng.normal(size=(3, N0, N1))
            sym = np.fft.fftshift(
                np.abs(np.fft.fft2(np.fft.ifft2(np.fft.ifftshift(spec, axes=(-2, -1))).real,
                                   axes=(-2, -1))) ** 2,
                axes=(-2, -1),
            )
            i, j = np.meshgrid(np.arange(N0), np.arange(N1), indexing="ij")
            sym = 0.5 * (sym + sym[..., (2 * (N0 // 2) - i) % N0, (2 * (N1 // 2) - j) % N1])
            rebuilt = mirror_centrosymmetric(sym[..., : HALF_ROWS(N0), :], N0)
            np.testing.assert_array_equal(rebuilt, sym)

    def test_mirror_shape_validation(self):
        from barc4dip_tpu.ops.symmetry import mirror_centrosymmetric

        with pytest.raises(ValueError):
            mirror_centrosymmetric(np.zeros((5, 16)), 16)

    def test_spectral_summary_matches_separate_calls(self):
        from barc4dip_tpu import maths
        from barc4dip_tpu.signal import autocorr2d, psd2d, spectral_summary

        rng = np.random.default_rng(11)
        img = rng.normal(size=(96, 80)).astype(np.float32) + 2.0
        s = spectral_summary(img, dx=0.5, dy=0.25)

        P, fx, fy = psd2d(img, dx=0.5, dy=0.25)
        ac, xlag, ylag = autocorr2d(img, dx=0.5, dy=0.25)
        rb, r_b = maths.radial_mean_binned(np.asarray(ac))
        ri, r_i = maths.radial_mean_interpolated(np.asarray(ac))

        np.testing.assert_allclose(np.asarray(s["psd"]), np.asarray(P), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s["autocorr"]), np.asarray(ac), rtol=1e-6, atol=1e-7)
        np.testing.assert_array_equal(s["fx"], fx)
        np.testing.assert_array_equal(s["fy"], fy)
        np.testing.assert_array_equal(s["xlag"], xlag)
        np.testing.assert_array_equal(s["ylag"], ylag)
        np.testing.assert_allclose(s["radial_binned"], np.asarray(rb), rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(s["radial_interpolated"], np.asarray(ri), rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(s["r_binned"], np.asarray(r_b))
        np.testing.assert_allclose(s["r_interpolated"], np.asarray(r_i))

    def test_quantized_pull_error_bound(self):
        from barc4dip_tpu.signal import autocorr2d, pull_centrosymmetric

        rng = np.random.default_rng(7)
        img = rng.normal(size=(96, 96))
        ac, _, _ = autocorr2d(img)  # peak-normalised: values in [-1, 1]
        exact = pull_centrosymmetric(ac)
        coded = pull_centrosymmetric(ac, quantize="u16")
        span = exact.max() - exact.min()
        assert np.abs(coded - exact).max() <= span / 65535.0
        with pytest.raises(ValueError):
            pull_centrosymmetric(ac, quantize="u8")


class TestSpectralSummaryStack:
    def test_matches_per_frame_summary(self):
        from tests.conftest import make_speckle

        from barc4dip_tpu.signal import spectral_summary, spectral_summary_stack

        rng = np.random.default_rng(9)
        base = make_speckle(rng, shape=(160, 192), grain_px=4.0).astype(np.float32)
        stack = np.stack([base * (1 + 0.1 * t) for t in range(5)])

        out = spectral_summary_stack(stack, frame_chunk=2)
        assert out["radial_binned"].shape[0] == 5
        for t in (0, 2, 4):
            single = spectral_summary(stack[t])
            np.testing.assert_allclose(
                out["radial_binned"][t], single["radial_binned"],
                rtol=1e-6, atol=1e-9,
            )
            np.testing.assert_allclose(
                out["radial_interpolated"][t], single["radial_interpolated"],
                rtol=1e-6, atol=1e-9,
            )
        np.testing.assert_allclose(out["r_binned"], single["r_binned"])

    def test_rejects_non_3d(self):
        from barc4dip_tpu.signal import spectral_summary_stack

        with pytest.raises(ValueError, match="3D"):
            spectral_summary_stack(np.zeros((8, 8), np.float32))

    def test_device_resident_input_matches_numpy(self):
        # serving pattern: a jax.Array stack is sliced ON DEVICE (no host
        # round trip; upload_padded_chunk's jax.Array branch). frame_chunk
        # 2 over T=5 exercises the device-side tail padding too.
        import jax.numpy as jnp

        from tests.conftest import make_speckle

        from barc4dip_tpu.signal import spectral_summary_stack

        rng = np.random.default_rng(11)
        base = make_speckle(rng, shape=(160, 160), grain_px=4.0).astype(np.float32)
        stack = np.stack([base * (1 + 0.07 * t) for t in range(5)])

        host = spectral_summary_stack(stack, frame_chunk=2)
        dev = spectral_summary_stack(jnp.asarray(stack), frame_chunk=2)
        for key in ("radial_binned", "radial_interpolated"):
            np.testing.assert_array_equal(host[key], dev[key])

    def test_uint16_input_ships_raw_and_matches_float(self):
        # detector stacks ride the wire as uint16 (half the bytes) and
        # cast to float32 on device — results must equal the host-cast
        # float32 path exactly (uint16 -> f32 is lossless)
        from tests.conftest import make_speckle

        from barc4dip_tpu.signal import spectral_summary_stack

        rng = np.random.default_rng(12)
        base = make_speckle(rng, shape=(160, 160), grain_px=4.0)
        stack_f = np.stack(
            [base * 4000.0 * (1 + 0.05 * t) for t in range(3)]
        )
        stack_u16 = stack_f.astype(np.uint16)

        out_u16 = spectral_summary_stack(stack_u16, frame_chunk=3)
        out_f32 = spectral_summary_stack(
            stack_u16.astype(np.float32), frame_chunk=3
        )
        for key in ("radial_binned", "radial_interpolated"):
            np.testing.assert_array_equal(out_u16[key], out_f32[key])
