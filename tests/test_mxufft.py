# SPDX-License-Identifier: CECILL-2.1
"""MXU matmul-DFT (ops/mxufft.py) vs the NumPy/XLA FFT ground truth.

The module is platform-gated (auto = off on CPU); these tests force the
knob on so the matmul path itself runs on the CPU backend and can be
compared at float64 tolerances. A final test pins the default-off CPU
behavior so the golden/parity suites keep exercising the rfft2 path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from barc4dip_tpu.ops import mxufft, ncc
from barc4dip_tpu.ops.corrcore import autocorr2d_core


@pytest.fixture()
def force_on(monkeypatch):
    monkeypatch.setenv("BARC4DIP_TPU_MXU_FFT", "1")


@pytest.fixture()
def force_off(monkeypatch):
    monkeypatch.setenv("BARC4DIP_TPU_MXU_FFT", "0")


@pytest.mark.parametrize("n", [64, 256])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_fft2_matches_numpy(force_on, rng, n, dtype):
    x = rng.normal(size=(3, n, n)).astype(dtype)
    got = np.asarray(mxufft.fft2(jnp.asarray(x)))
    ref = np.fft.fft2(x.astype(np.float64))
    tol = 2e-5 if dtype == np.float32 else 1e-10
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=tol * scale)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_ifft2_roundtrip(force_on, rng, dtype):
    x = rng.normal(size=(2, 128, 128)).astype(dtype)
    y = mxufft.ifft2(mxufft.fft2(jnp.asarray(x)))
    tol = 2e-6 if dtype == np.float32 else 1e-12
    np.testing.assert_allclose(np.asarray(y.real), x, atol=tol * np.abs(x).max())
    assert float(jnp.abs(y.imag).max()) < tol * float(np.abs(x).max())


def test_rfft2_irfft2_match_numpy(force_on, rng):
    x = rng.normal(size=(128, 256))
    F = mxufft.rfft2(jnp.asarray(x))
    ref = np.fft.rfft2(x)
    np.testing.assert_allclose(np.asarray(F), ref, atol=1e-10 * np.abs(ref).max())
    y = mxufft.irfft2(jnp.asarray(ref), s=(128, 256))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-12)


def test_unsupported_size_falls_back(force_on, rng):
    x = rng.normal(size=(100, 100))  # not a supported size
    np.testing.assert_allclose(
        np.asarray(mxufft.fft2(jnp.asarray(x))), np.fft.fft2(x), atol=1e-9
    )


def test_permuted_correlation_equals_xla(force_on, rng):
    """fftp2 -> conj product -> ifftp2_real == rfft2/irfft2 correlation."""
    a = rng.normal(size=(256, 128))
    b = rng.normal(size=(256, 128))
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    assert mxufft.perm_supported_2d(ja.shape)
    are, aim = mxufft.fftp2(ja)
    bre, bim = mxufft.fftp2(jb)
    pre = are * bre + aim * bim
    pim = aim * bre - are * bim
    got = np.asarray(mxufft.ifftp2_real(pre, pim))
    ref = np.fft.irfft2(np.fft.rfft2(a) * np.conj(np.fft.rfft2(b)), s=a.shape)
    np.testing.assert_allclose(got, ref, atol=1e-10 * np.abs(ref).max())


def test_ifftp2_real_none_imag_matches_zeros(force_on, rng):
    """The im=None power-spectrum fast path == explicit zero plane."""
    x = rng.normal(size=(128, 128))
    fre, fim = mxufft.fftp2(jnp.asarray(x))
    p = fre * fre + fim * fim
    a = np.asarray(mxufft.ifftp2_real(p, None))
    b = np.asarray(mxufft.ifftp2_real(p, jnp.zeros_like(p)))
    np.testing.assert_allclose(a, b, atol=1e-9 * max(np.abs(b).max(), 1.0))


def test_autocorr_core_knob_invariant(rng, monkeypatch):
    """grain's autocorrelation is identical with the matmul path on/off."""
    x = rng.normal(size=(256, 256)) + 10.0
    monkeypatch.setenv("BARC4DIP_TPU_MXU_FFT", "0")
    off = np.asarray(autocorr2d_core(jnp.asarray(x)))
    monkeypatch.setenv("BARC4DIP_TPU_MXU_FFT", "1")
    on = np.asarray(autocorr2d_core(jnp.asarray(x)))
    np.testing.assert_allclose(on, off, atol=1e-10 * np.abs(off).max())


def test_ncc_knob_invariant(rng, monkeypatch):
    """Tracker NCC maps are identical with the matmul path on/off."""
    img = rng.normal(size=(256, 256))
    tpl = np.ascontiguousarray(img[40:71, 50:81])
    monkeypatch.setenv("BARC4DIP_TPU_MXU_FFT", "0")
    off = np.asarray(ncc.ncc_valid(jnp.asarray(img), jnp.asarray(tpl)))
    monkeypatch.setenv("BARC4DIP_TPU_MXU_FFT", "1")
    on = np.asarray(ncc.ncc_valid(jnp.asarray(img), jnp.asarray(tpl)))
    np.testing.assert_allclose(on, off, atol=1e-9)
    # peak still lands on the true location
    iy, ix = np.unravel_index(np.argmax(on), on.shape)
    assert (iy, ix) == (40, 50)


def test_ncc_vmapped_template_bank(force_on, rng):
    """The permuted prep dicts vmap as a template bank (stack-tracking shape)."""
    img = jnp.asarray(rng.normal(size=(256, 256)))
    tiles = jnp.stack([img[10:41, 10:41], img[100:131, 150:181]])
    prep = ncc.zncc_prepare_image(img, 31, 31)
    banks = jax.vmap(lambda t: ncc.prep_template(t, 256, 256))(tiles)
    maps = jax.vmap(lambda tp: ncc.ncc_valid_from_preps(prep, tp))(banks)
    peaks = [np.unravel_index(int(jnp.argmax(m)), m.shape) for m in maps]
    assert peaks == [(10, 10), (100, 150)]


def test_bandwidth_knob_invariant(rng, monkeypatch):
    """bandwidth_core's permuted-order PSD == natural-order PSD statistics."""
    from barc4dip_tpu.metrics.estimators import bandwidth_core

    # speckle-like field so the spectral moments are non-trivial
    a = rng.normal(size=(256, 256))
    k = np.exp(-((np.arange(256) - 128) ** 2) / (2 * 20.0**2))
    field = np.abs(np.fft.ifft2(np.fft.fft2(a) * np.outer(k, k))) ** 2 + 1.0
    x = jnp.asarray(field)
    monkeypatch.setenv("BARC4DIP_TPU_MXU_FFT", "0")
    off = {k: float(v) for k, v in bandwidth_core(x).items()}
    monkeypatch.setenv("BARC4DIP_TPU_MXU_FFT", "1")
    on = {k: float(v) for k, v in bandwidth_core(x).items()}
    assert on.keys() == off.keys()
    for key in off:
        np.testing.assert_allclose(on[key], off[key], rtol=1e-9, err_msg=key)


def test_spectral_entropy_knob_invariant(rng, monkeypatch):
    from barc4dip_tpu.metrics.estimators import spectral_entropy_core

    x = jnp.asarray(rng.normal(size=(128, 256)) + 5.0)
    monkeypatch.setenv("BARC4DIP_TPU_MXU_FFT", "0")
    off = float(spectral_entropy_core(x)["spectral_entropy"])
    monkeypatch.setenv("BARC4DIP_TPU_MXU_FFT", "1")
    on = float(spectral_entropy_core(x)["spectral_entropy"])
    np.testing.assert_allclose(on, off, rtol=1e-10)


def test_pallas_corr_kernel_interpret(force_on, rng):
    """The fused Pallas correlation kernel == the einsum inverse (interpret
    mode on CPU; the same kernel runs compiled on TPU, gated by the bench)."""
    from barc4dip_tpu.ops import pallas_fftp

    H = W = 256
    img = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    tpl = jnp.asarray(rng.normal(size=(3, H, W)).astype(np.float32))
    Fre, Fim = mxufft.fftp2(img)
    Gre, Gim = mxufft.fftp2(tpl)
    pre = Fre[None] * Gre + Fim[None] * Gim
    pim = Fim[None] * Gre - Fre[None] * Gim
    ref = np.asarray(mxufft.ifftp2_real(pre, pim))
    got = np.asarray(
        pallas_fftp.corr_from_spectra(Fre, Fim, Gre, Gim, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=3e-6 * np.abs(ref).max())
    # single-template squeeze path
    got1 = np.asarray(
        pallas_fftp.corr_from_spectra(Fre, Fim, Gre[0], Gim[0], interpret=True)
    )
    np.testing.assert_allclose(got1, ref[0], atol=3e-6 * np.abs(ref).max())


def test_pallas_corr_kernel_vmap_interpret(force_on, rng):
    """vmap over frames of the Pallas kernel (the tracker chunk pattern)."""
    from barc4dip_tpu.ops import pallas_fftp

    H = W = 128
    frames = jnp.asarray(rng.normal(size=(2, H, W)).astype(np.float32))
    tpl = jnp.asarray(rng.normal(size=(3, H, W)).astype(np.float32))
    Gre, Gim = mxufft.fftp2(tpl)

    def per_frame(img):
        fre, fim = mxufft.fftp2(img)
        return pallas_fftp.corr_from_spectra(
            fre, fim, Gre, Gim, interpret=True
        )

    got = np.asarray(jax.vmap(per_frame)(frames))

    def ref_frame(img):
        fre, fim = mxufft.fftp2(img)
        pre = fre[None] * Gre + fim[None] * Gim
        pim = fim[None] * Gre - fre[None] * Gim
        return mxufft.ifftp2_real(pre, pim)

    ref = np.asarray(jax.vmap(ref_frame)(frames))
    np.testing.assert_allclose(got, ref, atol=3e-6 * np.abs(ref).max())


def test_phase_corr_surface_knob_invariant(rng, monkeypatch):
    from barc4dip_tpu.ops.phasecorr import phase_corr_surface, zscore2d

    img = rng.normal(size=(256, 256))
    tpl_pad = np.zeros_like(img)
    tpl_pad[60:91, 80:111] = img[70:101, 90:121]
    a = zscore2d(jnp.asarray(img))
    b = zscore2d(jnp.asarray(tpl_pad))
    monkeypatch.setenv("BARC4DIP_TPU_MXU_FFT", "0")
    off = np.asarray(phase_corr_surface(a, b))
    monkeypatch.setenv("BARC4DIP_TPU_MXU_FFT", "1")
    on = np.asarray(phase_corr_surface(a, b))
    np.testing.assert_allclose(on, off, atol=1e-9 * off.max())


def test_stack_phase_tracking_knob_invariant(monkeypatch):
    """The stack phase tracker at a perm-supported frame size recovers known
    shifts with the matmul path on and off (whitening amplifies the ~1e-6
    f32 FFT differences, so the agreement tolerance is in subpixel units)."""
    from barc4dip_tpu.metrics.stack_fused import _track_chunk_program
    from barc4dip_tpu.utils.synthetic import speckle_field

    base = np.asarray(
        speckle_field((256, 256), grain_px=6.0, seed=3, precision="double"),
        np.float64,
    )
    shifts = [(0, 0), (2, -1), (-3, 4)]
    stack = np.stack(
        [np.roll(np.roll(base, dy, 0), dx, 1) for dy, dx in shifts]
    ).astype(np.float32)

    s = 65
    starts = [(gy, gx) for gy in (64, 96, 128) for gx in (64, 96, 128)]
    starts_key = tuple(np.asarray(starts, np.int32).reshape(-1))

    def run(knob):
        monkeypatch.setenv("BARC4DIP_TPU_MXU_FFT", knob)
        _track_chunk_program.cache_clear()
        prog = _track_chunk_program(
            "phase", True, 256, 256, s, starts_key, None, knob == "1"
        )
        out, _ = prog(
            jnp.asarray(stack), jnp.asarray(stack[0]), jnp.asarray(stack[0]),
            jnp.asarray(1e-9, jnp.float32),
        )
        return (
            np.asarray(out["dy_a"]).mean(axis=1),
            np.asarray(out["dx_a"]).mean(axis=1),
        )

    dy_off, dx_off = run("0")
    dy_on, dx_on = run("1")
    np.testing.assert_allclose(dy_on, dy_off, atol=0.1)
    np.testing.assert_allclose(dx_on, dx_off, atol=0.1)
    np.testing.assert_allclose(dy_on, [dy for dy, _ in shifts], atol=0.2)
    np.testing.assert_allclose(dx_on, [dx for _, dx in shifts], atol=0.2)


def test_default_off_on_cpu(force_off):
    assert not mxufft.mxu_fft_enabled()
    # and 'auto' resolves off on the CPU backend too
    import os

    os.environ.pop("BARC4DIP_TPU_MXU_FFT", None)
    assert jax.default_backend() == "cpu"
    assert not mxufft.mxu_fft_enabled()


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("offset", [(0, 0), (37, 101)])
def test_fftp2_small_matches_padded_fftp2(force_on, rng, dtype, offset):
    """fftp2_small == fftp2 of the block zero-padded at the offset, for the
    tracker geometry (small odd block inside a supported frame)."""
    H = W = 256
    s = 29
    t = rng.normal(size=(s, s)).astype(dtype)
    y0, x0 = offset
    pad = np.zeros((H, W), dtype)
    pad[y0:y0 + s, x0:x0 + s] = t
    ref_re, ref_im = mxufft.fftp2(jnp.asarray(pad))
    got_re, got_im = mxufft.fftp2_small(jnp.asarray(t), (H, W), offset=offset)
    tol = 1e-10 if dtype == np.float64 else 2e-4
    scale = float(np.abs(np.asarray(ref_re)).max())
    np.testing.assert_allclose(np.asarray(got_re), np.asarray(ref_re),
                               atol=tol * scale)
    np.testing.assert_allclose(np.asarray(got_im), np.asarray(ref_im),
                               atol=tol * scale)


def test_fftp2_small_batched_and_rect(force_on, rng):
    """Leading batch axes and a non-square block/frame."""
    H, W = 128, 256
    sh, sw = 13, 21
    t = rng.normal(size=(4, sh, sw)).astype(np.float64)
    got_re, got_im = mxufft.fftp2_small(jnp.asarray(t), (H, W))
    for k in range(4):
        pad = np.zeros((H, W))
        pad[:sh, :sw] = t[k]
        ref_re, ref_im = mxufft.fftp2(jnp.asarray(pad))
        np.testing.assert_allclose(np.asarray(got_re[k]), np.asarray(ref_re),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(got_im[k]), np.asarray(ref_im),
                                   atol=1e-9)


def test_prep_template_small_path_equals_rfft_path(rng, monkeypatch):
    """NCC with the thin-matmul template prep must match the rfft2 golden
    path through the full public surface (knob-invariance of ncc_valid)."""
    img = rng.normal(size=(160, 128)).astype(np.float64)
    tpl = img[40:69, 30:59].copy()
    monkeypatch.setenv("BARC4DIP_TPU_MXU_FFT", "0")
    ref = np.asarray(ncc.ncc_valid(jnp.asarray(img), jnp.asarray(tpl)))
    monkeypatch.setenv("BARC4DIP_TPU_MXU_FFT", "1")
    got = np.asarray(ncc.ncc_valid(jnp.asarray(img), jnp.asarray(tpl)))
    np.testing.assert_allclose(got, ref, atol=1e-9)
    assert np.unravel_index(np.argmax(got), got.shape) == (40, 30)


def test_ncc_full_masked_matches_sliced_peaks(rng, monkeypatch):
    """ncc_full_masked_from_preps must give the same argmax peak and
    subpixel values as the sliced valid map — both knob states."""
    from barc4dip_tpu.ops import phasecorr as pc

    for knob in ("0", "1"):
        monkeypatch.setenv("BARC4DIP_TPU_MXU_FFT", knob)
        img = jnp.asarray(rng.normal(size=(128, 128)))
        tpl = img[40:61, 30:51] + 0.0
        prep = ncc.zncc_prepare_image(img, 21, 21)
        tp = ncc.prep_template(tpl, 128, 128)
        sliced = ncc.ncc_valid_from_preps(prep, tp)
        masked, (vh, vw) = ncc.ncc_full_masked_from_preps(prep, tp)
        assert (vh, vw) == (108, 108)
        # valid region values match exactly; wrap region is -inf
        np.testing.assert_array_equal(
            np.asarray(masked)[:vh, :vw], np.asarray(sliced)
        )
        assert np.all(np.isneginf(np.asarray(masked)[vh:, :]))
        assert np.all(np.isneginf(np.asarray(masked)[:, vw:]))
        i1, j1 = (np.asarray(v) for v in pc.argmax2d(sliced))
        i2, j2 = (np.asarray(v) for v in pc.argmax2d(masked))
        assert (i1, j1) == (i2, j2) == (40, 30)
        d1 = pc.subpixel_taylor(sliced, *pc.argmax2d(sliced))
        d2 = pc.subpixel_taylor(masked, *pc.argmax2d(masked),
                                bounds=(vh, vw))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2))


def test_subpixel_taylor_bounds_border_zeroes(rng):
    """A peak ON the valid-region border must return (0, 0) through the
    bounds override exactly like the sliced map does natively — even
    though the masked map has -inf neighbours there."""
    from barc4dip_tpu.ops import phasecorr as pc

    m = np.full((64, 64), -np.inf)
    m[:50, :50] = rng.normal(size=(50, 50))
    m[49, 20] = 100.0  # peak on the valid border row
    mj = jnp.asarray(m)
    i, j = pc.argmax2d(mj)
    di, dj = pc.subpixel_taylor(mj, i, j, bounds=(50, 50))
    assert float(di) == 0.0 and float(dj) == 0.0
    # sliced equivalent: same zero
    sj = jnp.asarray(m[:50, :50])
    i2, j2 = pc.argmax2d(sj)
    d2 = pc.subpixel_taylor(sj, i2, j2)
    assert float(d2[0]) == 0.0 and float(d2[1]) == 0.0


def test_pallas_ncc_masked_kernel_interpret(force_on, rng):
    """The fused NCC-epilogue kernel == the unfused composition (inverse +
    divide + wrap mask), interpret mode; and the whole bank path through
    ncc_bank_masked_from_preps matches per-template
    ncc_full_masked_from_preps."""
    from barc4dip_tpu.ops import pallas_fftp

    H = W = 256
    h = w = 21
    img = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    tiles = jnp.asarray(rng.normal(size=(3, h, w)).astype(np.float32))
    prep = ncc.zncc_prepare_image(img, h, w)
    bank = jax.vmap(lambda t: ncc.prep_template(t, H, W))(tiles)
    var_full = jnp.pad(prep["var_sum"], ((0, h - 1), (0, w - 1)))

    fused = np.asarray(
        pallas_fftp.ncc_masked_from_spectra(
            prep["Fre"], prep["Fim"], bank["Ftre"], bank["Ftim"],
            var_full, bank["energy"], valid_hw=(H - h + 1, W - w + 1),
            interpret=True,
        )
    )
    for k in range(3):
        tp = jax.tree_util.tree_map(lambda x: x[k], bank)
        ref, vb = ncc.ncc_full_masked_from_preps(prep, tp)
        ref = np.asarray(ref)
        valid = np.isfinite(ref)
        assert (np.isfinite(fused[k]) == valid).all()
        np.testing.assert_allclose(
            fused[k][valid], ref[valid], atol=5e-6 * np.abs(ref[valid]).max()
        )


def test_ncc_bank_masked_matches_single_cpu(rng, monkeypatch):
    """CPU fallback of the bank call == per-template masked maps, and the
    whole tracker surface stays knob-invariant through it."""
    monkeypatch.setenv("BARC4DIP_TPU_MXU_FFT", "0")
    img = jnp.asarray(rng.normal(size=(160, 128)))
    tiles = jnp.asarray(rng.normal(size=(2, 17, 17)))
    prep = ncc.zncc_prepare_image(img, 17, 17)
    bank = jax.vmap(lambda t: ncc.prep_template(t, 160, 128))(tiles)
    maps, vb = ncc.ncc_bank_masked_from_preps(prep, bank)
    assert vb == (144, 112)
    for k in range(2):
        tp = jax.tree_util.tree_map(lambda x: x[k], bank)
        ref, _ = ncc.ncc_full_masked_from_preps(prep, tp)
        valid = np.isfinite(np.asarray(ref))
        np.testing.assert_array_equal(
            np.asarray(maps[k])[valid], np.asarray(ref)[valid]
        )
        assert (np.isfinite(np.asarray(maps[k])) == valid).all()


def test_ncc_bank_masked_peaks_match_argmax(force_on, rng):
    """The kernel's per-strip peak reduction must equal argmax2d over the
    masked maps exactly (interpret mode), including on the CPU fallback."""
    from barc4dip_tpu.ops import phasecorr as pc

    img = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    tiles = jnp.stack([img[40:69, 30:59], img[100:129, 200:229],
                       img[5:34, 5:34]])
    prep = ncc.zncc_prepare_image(img, 29, 29)
    bank = jax.vmap(lambda t: ncc.prep_template(t, 256, 256))(tiles)
    maps, iy, ix, vb = ncc.ncc_bank_masked_peaks(prep, bank)
    assert vb == (228, 228)
    for k in range(3):
        i_ref, j_ref = pc.argmax2d(maps[k])
        assert (int(iy[k]), int(ix[k])) == (int(i_ref), int(j_ref))
    # the self-match tiles must peak at their own positions
    assert (int(iy[0]), int(ix[0])) == (40, 30)
    assert (int(iy[1]), int(ix[1])) == (100, 200)
    assert (int(iy[2]), int(ix[2])) == (5, 5)


def test_pallas_ncc_peak_reduction_interpret(force_on, rng):
    """The in-kernel per-strip (max, argmax) reduction == jnp.argmax over
    the kernel's own masked maps (interpret mode, first-occurrence ties)."""
    from barc4dip_tpu.ops import pallas_fftp

    H = W = 256
    h = w = 21
    img = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    tiles = jnp.asarray(rng.normal(size=(3, h, w)).astype(np.float32))
    prep = ncc.zncc_prepare_image(img, h, w)
    bank = jax.vmap(lambda t: ncc.prep_template(t, H, W))(tiles)
    var_full = jnp.pad(prep["var_sum"], ((0, h - 1), (0, w - 1)))
    maps, iy, ix = pallas_fftp.ncc_masked_peaks_from_spectra(
        prep["Fre"], prep["Fim"], bank["Ftre"], bank["Ftim"],
        var_full, bank["energy"], valid_hw=(H - h + 1, W - w + 1),
        interpret=True,
    )
    m = np.asarray(maps)
    for k in range(3):
        flat = int(np.argmax(m[k]))
        assert (int(iy[k]), int(ix[k])) == (flat // W, flat % W)
