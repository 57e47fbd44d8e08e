"""MXU-resident FFT: Cooley-Tukey four-step DFT built from small matmuls.

Why this exists
---------------
XLA's TPU FFT lowering moves a 2048x2048 transform at ~90 GB/s effective
(~1.3 ms batched on a v5e chip) -- an order of magnitude under both the
HBM roofline and the MXU's matmul rate measured on the same chip
(35-50 TFLOP/s for batched f32). A radix-(N1,N2) four-step DFT does the
same transform as two *tiny dense matmuls* plus a twiddle multiply:

    n = N2*n1 + n2,  k = k1 + N1*k2
    A[k1, n2] = sum_n1 W_N1[k1, n1] * x[n1, n2]         (matmul over N1)
    B[k1, n2] = A[k1, n2] * tw[k1, n2],  tw = exp(-2i pi k1 n2 / N)
    C[k1, k2] = sum_n2 B[k1, n2] * W_N2[k2, n2]         (matmul over N2)
    X[k1 + N1*k2] = C[k1, k2]                            (transpose+reshape)

which is ~(N1+N2) complex MACs per sample instead of XLA's generic
lowering, runs on the MXU, and fuses with neighbouring elementwise work.
For N=2048 (N1=32, N2=64) that is ~6.4 GFLOP per 2D transform --
compute takes ~0.2 ms at the measured MXU rate, leaving the transform
HBM-bound (the theoretical minimum for an out-of-place FFT).

Scope: a *drop-in* subset of ``jnp.fft`` -- ``fft2 / ifft2 / rfft2 /
irfft2`` over the last two axes -- for power-of-two sizes in
``_SPLITS``. Anything else (odd sizes, CPU platform, knob off) falls
back to ``jnp.fft`` transparently, so callers never need to care.

Numerics: matrices are built in float64 and cast to the working complex
dtype; f32 relative error vs ``np.fft`` is ~1e-6 at 2048^2 (validated in
``tests/test_mxufft.py``), comparable to the f32 XLA FFT itself. The
hardware tracking gate (<=0.05 px, ``bench.py``) is the final arbiter on
the axon backend.

Reference parity note: the reference computes every spectrum with
NumPy/pyFFTW on the host (e.g. barc4dip ``signal/fft.py``,
``signal/tracking.py``); this module changes only *how* the same DFT is
evaluated on-device, not any convention.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# On TPU the MXU's default f32 matmul is a SINGLE bf16 pass (~4e-3 rel
# error measured on-chip on the DFT stages); HIGHEST requests the full
# f32 multi-pass decomposition so the transforms stay ~1e-6-accurate on
# hardware, matching the CPU validation. BARC4DIP_TPU_DFT_PRECISION
# (highest|high|default) trades DFT matmul passes for accuracy — an A/B
# knob for the tracking-gate-vs-speed frontier; read once per process
# (the jitted programs bake the traced precision in).
_PREC = {
    "highest": lax.Precision.HIGHEST,
    "high": lax.Precision.HIGH,
    "default": lax.Precision.DEFAULT,
}[os.environ.get("BARC4DIP_TPU_DFT_PRECISION", "highest").lower()]

__all__ = [
    "fft2",
    "ifft2",
    "rfft2",
    "irfft2",
    "fftp2",
    "fftp2_small",
    "ifftp2_real",
    "perm_supported_2d",
    "perm_active_2d",
    "mxu_fft_enabled",
    "supported_size",
]

# Balanced-ish factor splits. Contraction dims this small underfill the
# 128x128 MXU, but the transform is HBM-bound anyway; the split mainly
# controls FLOP count (~N1+N2 MACs/sample), so keep it near sqrt(N).
_SPLITS: dict[int, tuple[int, int]] = {
    64: (8, 8),
    128: (8, 16),
    256: (16, 16),
    512: (16, 32),
    1024: (32, 32),
    2048: (32, 64),
    4096: (64, 64),
    8192: (64, 128),
}


def _knob() -> str:
    return os.environ.get("BARC4DIP_TPU_MXU_FFT", "auto").lower()


def _platform_is_tpu() -> bool:
    """Platform of the EFFECTIVE default device (not cached: an enclosing
    ``jax.default_device(cpu)`` — e.g. the host-side frame-0 grain sizing —
    must flip this off even when the process default backend is the TPU)."""
    dev = getattr(jax.config, "jax_default_device", None)
    if dev is not None:
        plat = getattr(dev, "platform", None)
        if plat is not None:
            return plat not in ("cpu",)
    try:
        plat = jax.default_backend()
    except Exception:  # pragma: no cover - no backend at all
        return False
    return plat not in ("cpu",)


def mxu_fft_enabled() -> bool:
    """True when the matmul DFT path should be used on this backend."""
    knob = _knob()
    if knob in ("0", "off", "false"):
        return False
    if knob in ("1", "on", "true"):
        return True
    # auto: TPU-like accelerators win, CPU's native FFT is better
    return _platform_is_tpu()


def supported_size(n: int) -> bool:
    return n in _SPLITS


@lru_cache(maxsize=64)
def _stage_consts(n: int, inverse: bool, dtype_name: str):
    """(W1[k1,n1], tw[k1,n2], W2[k2,n2]) for length n.

    NumPy arrays on purpose: they embed as (tiny) jaxpr constants at the
    use site. Caching ``jnp`` values here would capture tracers when the
    first call happens under ``jit`` and poison every later trace.
    """
    n1, n2 = _SPLITS[n]
    sign = 1.0 if inverse else -1.0
    i1 = np.arange(n1)
    i2 = np.arange(n2)
    w1 = np.exp(sign * 2j * np.pi * np.outer(i1, i1) / n1)
    w2 = np.exp(sign * 2j * np.pi * np.outer(i2, i2) / n2)
    tw = np.exp(sign * 2j * np.pi * np.outer(i1, i2) / n)
    cdtype = np.dtype(dtype_name)
    return (w1.astype(cdtype), tw.astype(cdtype), w2.astype(cdtype))


def _cdtype_for(x: jnp.ndarray) -> str:
    if x.dtype in (jnp.complex128, jnp.float64):
        return "complex128"
    return "complex64"


def _fft1d_last(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """DFT along the last axis via the four-step matmul decomposition.

    ``x`` is complex, last-axis length must be in ``_SPLITS``. The inverse
    here is *unscaled* (caller divides by N once for the 2D inverse).
    """
    n = x.shape[-1]
    n1, n2 = _SPLITS[n]
    w1, tw, w2 = _stage_consts(n, inverse, str(x.dtype))
    lead = x.shape[:-1]
    v = x.reshape(lead + (n1, n2))  # v[..., n1, n2], n = N2*n1 + n2
    # stage 1: DFT over n1 -> A[..., k1, n2]  (matmul, contraction n1)
    a = jnp.einsum("ab,...bc->...ac", w1, v, precision=_PREC)
    # stage 2: twiddle
    b = a * tw
    # stage 3: DFT over n2 -> C[..., k1, k2] (matmul, contraction n2)
    c = jnp.einsum("...an,kn->...ak", b, w2, precision=_PREC)
    # stage 4: k = k1 + N1*k2 -> index (k2, k1) row-major
    return jnp.swapaxes(c, -1, -2).reshape(lead + (n,))


def _use_mxu(shape: tuple[int, ...]) -> bool:
    return (
        mxu_fft_enabled()
        and len(shape) >= 2
        and supported_size(shape[-1])
        and supported_size(shape[-2])
    )


def fft2(x: jnp.ndarray) -> jnp.ndarray:
    """``jnp.fft.fft2`` over the last two axes (matmul path when it wins)."""
    if not _use_mxu(x.shape):
        return jnp.fft.fft2(x, axes=(-2, -1))
    xc = x.astype(_cdtype_for(x))
    y = _fft1d_last(xc, inverse=False)
    y = _fft1d_last(jnp.swapaxes(y, -1, -2), inverse=False)
    return jnp.swapaxes(y, -1, -2)


def ifft2(x: jnp.ndarray) -> jnp.ndarray:
    """``jnp.fft.ifft2`` over the last two axes."""
    if not _use_mxu(x.shape):
        return jnp.fft.ifft2(x, axes=(-2, -1))
    xc = x.astype(_cdtype_for(x))
    y = _fft1d_last(xc, inverse=True)
    y = _fft1d_last(jnp.swapaxes(y, -1, -2), inverse=True)
    scale = 1.0 / (x.shape[-1] * x.shape[-2])
    return jnp.swapaxes(y, -1, -2) * jnp.asarray(scale, y.real.dtype)


def rfft2(x: jnp.ndarray) -> jnp.ndarray:
    """``jnp.fft.rfft2`` over the last two axes: half-spectrum of real input.

    The matmul path computes the full complex transform and slices -- the
    extra FLOPs are free at MXU rates and the sliced result keeps the
    downstream memory halved (same as the native rfft2 contract).
    """
    if not _use_mxu(x.shape):
        return jnp.fft.rfft2(x, axes=(-2, -1))
    n = x.shape[-1]
    return fft2(x)[..., : n // 2 + 1]


# ---------------------------------------------------------------------------
# Permuted-order transforms: the fast path for FFT correlation.
#
# The four-step DFT naturally produces the spectrum in (k1, k2) block order
# (k = k1 + N1*k2 stored at position k1*N2 + k2). Undoing that permutation
# costs a transpose per axis -- a full extra HBM pass each. But FFT
# *correlation* never looks at the spectrum: it multiplies two spectra
# pointwise and transforms back. Pointwise products are order-agnostic, and
# the inverse four-step can be written to CONSUME the permuted order and
# emit natural order (its output index n = N2*n1 + n2 is the natural
# reshape). So the whole chain
#
#     corr = ifftp2( fftp2(img) * conj(fftp2(tpl)) )
#
# runs with ZERO transposes: every stage is a tiny dense matmul over a
# natively-tiled (..., N1, N2=128) layout plus a fused twiddle multiply.
# With N2 = 128 the main contraction exactly fills the 128x128 MXU.
#
# Storage contract: a permuted spectrum is a complex array of the same
# shape as the input; only the ORDER of frequencies differs. It is only
# meaningful to combine permuted spectra of the same shape produced by
# these functions. (Cross-program transport should use split re/im parts:
# the axon backend corrupts complex64 across program boundaries -- see
# docs/AXON_BACKEND_NOTES.md.)
# ---------------------------------------------------------------------------

_N2 = 128  # fixed small-DFT size: matches the MXU contraction dim exactly


def _perm_supported(n: int) -> bool:
    return n % _N2 == 0 and 1 <= n // _N2 <= 64


@lru_cache(maxsize=64)
def _perm_consts(n: int, inverse: bool, dtype_name: str):
    """Real/imag parts of (W1[k1,n1], tw[k1,n2], W2[k2,n2]) for length n.

    Forward:  X[k1 + N1*k2] = sum_{n2} W2[k2,n2] tw[k1,n2]
                              sum_{n1} W1[k1,n1] x[N2*n1 + n2]
    Inverse (consuming permuted order, emitting natural order):
              x[N2*n1 + n2] = (1/N) sum_{k1} W1i[n1,k1] twi[k1,n2]
                              sum_{k2} W2i[n2,k2] Y[k1,k2]
    """
    n1 = n // _N2
    n2 = _N2
    sign = 1.0 if inverse else -1.0
    i1 = np.arange(n1)
    i2 = np.arange(n2)
    w1 = np.exp(sign * 2j * np.pi * np.outer(i1, i1) / n1)
    w2 = np.exp(sign * 2j * np.pi * np.outer(i2, i2) / n2)
    tw = np.exp(sign * 2j * np.pi * np.outer(i1, i2) / n)
    rdtype = np.float64 if dtype_name == "complex128" else np.float32
    out = []
    for m in (w1, tw, w2):
        out.append(np.ascontiguousarray(m.real, rdtype))
        out.append(np.ascontiguousarray(m.imag, rdtype))
    return tuple(out)


def _cmul(are, aim, bre, bim):
    return are * bre - aim * bim, are * bim + aim * bre


def _fftp_last(re, im, inverse: bool):
    """Four-step DFT along the last axis in split re/im form.

    Forward maps natural order -> permuted order; inverse maps permuted ->
    natural (unscaled). ``im`` may be None (real input fast path)."""
    n = re.shape[-1]
    n1 = n // _N2
    w1re, w1im, twre, twim, w2re, w2im = _perm_consts(
        n, inverse, "complex128" if re.dtype == jnp.float64 else "complex64"
    )
    lead = re.shape[:-1]
    vre = re.reshape(lead + (n1, _N2))
    if not inverse:
        # stage 1: contraction over n1 (small), batched over everything else
        are = jnp.einsum("ab,...bn->...an", w1re, vre, precision=_PREC)
        aim = jnp.einsum("ab,...bn->...an", w1im, vre, precision=_PREC)
        if im is not None:
            vim = im.reshape(lead + (n1, _N2))
            are = are - jnp.einsum("ab,...bn->...an", w1im, vim, precision=_PREC)
            aim = aim + jnp.einsum("ab,...bn->...an", w1re, vim, precision=_PREC)
        bre, bim = _cmul(are, aim, twre, twim)
        # stage 2: contraction over n2 = 128 (exact MXU fill)
        cre = jnp.einsum("...an,kn->...ak", bre, w2re, precision=_PREC) - jnp.einsum(
            "...an,kn->...ak", bim, w2im
        , precision=_PREC)
        cim = jnp.einsum("...an,kn->...ak", bre, w2im, precision=_PREC) + jnp.einsum(
            "...an,kn->...ak", bim, w2re
        , precision=_PREC)
        return cre.reshape(lead + (n,)), cim.reshape(lead + (n,))
    # inverse, consuming permuted (k1, k2) blocks
    vim = im.reshape(lead + (n1, _N2))
    dre = jnp.einsum("...ak,nk->...an", vre, w2re, precision=_PREC) - jnp.einsum(
        "...ak,nk->...an", vim, w2im
    , precision=_PREC)
    dim = jnp.einsum("...ak,nk->...an", vre, w2im, precision=_PREC) + jnp.einsum(
        "...ak,nk->...an", vim, w2re
    , precision=_PREC)
    ere, eim = _cmul(dre, dim, twre, twim)
    xre = jnp.einsum("ba,...an->...bn", w1re, ere, precision=_PREC) - jnp.einsum(
        "ba,...an->...bn", w1im, eim
    , precision=_PREC)
    xim = jnp.einsum("ba,...an->...bn", w1re, eim, precision=_PREC) + jnp.einsum(
        "ba,...an->...bn", w1im, ere
    , precision=_PREC)
    return xre.reshape(lead + (n,)), xim.reshape(lead + (n,))


def _fftp_rows(re, im, inverse: bool):
    """Same transform along axis -2 (image rows), no transposes."""
    h, w = re.shape[-2:]
    n1 = h // _N2
    w1re, w1im, twre, twim, w2re, w2im = _perm_consts(
        h, inverse, "complex128" if re.dtype == jnp.float64 else "complex64"
    )
    lead = re.shape[:-2]
    tw_re = twre[:, :, None]
    tw_im = twim[:, :, None]
    vre = re.reshape(lead + (n1, _N2, w))
    if not inverse:
        are = jnp.einsum("ab,...bnw->...anw", w1re, vre, precision=_PREC)
        aim = jnp.einsum("ab,...bnw->...anw", w1im, vre, precision=_PREC)
        if im is not None:
            vim = im.reshape(lead + (n1, _N2, w))
            are = are - jnp.einsum("ab,...bnw->...anw", w1im, vim, precision=_PREC)
            aim = aim + jnp.einsum("ab,...bnw->...anw", w1re, vim, precision=_PREC)
        bre, bim = _cmul(are, aim, tw_re, tw_im)
        cre = jnp.einsum("...anw,kn->...akw", bre, w2re, precision=_PREC) - jnp.einsum(
            "...anw,kn->...akw", bim, w2im
        , precision=_PREC)
        cim = jnp.einsum("...anw,kn->...akw", bre, w2im, precision=_PREC) + jnp.einsum(
            "...anw,kn->...akw", bim, w2re
        , precision=_PREC)
        return cre.reshape(lead + (h, w)), cim.reshape(lead + (h, w))
    dre = jnp.einsum("...akw,nk->...anw", vre, w2re, precision=_PREC)
    dim = jnp.einsum("...akw,nk->...anw", vre, w2im, precision=_PREC)
    if im is not None:
        vim = im.reshape(lead + (n1, _N2, w))
        dre = dre - jnp.einsum("...akw,nk->...anw", vim, w2im, precision=_PREC)
        dim = dim + jnp.einsum("...akw,nk->...anw", vim, w2re, precision=_PREC)
    ere, eim = _cmul(dre, dim, tw_re, tw_im)
    xre = jnp.einsum("ba,...anw->...bnw", w1re, ere, precision=_PREC) - jnp.einsum(
        "ba,...anw->...bnw", w1im, eim
    , precision=_PREC)
    xim = jnp.einsum("ba,...anw->...bnw", w1re, eim, precision=_PREC) + jnp.einsum(
        "ba,...anw->...bnw", w1im, ere
    , precision=_PREC)
    return xre.reshape(lead + (h, w)), xim.reshape(lead + (h, w))


def perm_supported_2d(shape: tuple[int, ...]) -> bool:
    """True when the permuted-order fast path covers (..., H, W)."""
    return (
        len(shape) >= 2
        and _perm_supported(shape[-1])
        and _perm_supported(shape[-2])
    )


def perm_active_2d(shape: tuple[int, ...]) -> bool:
    """perm_supported_2d AND the backend knob resolves on."""
    return mxu_fft_enabled() and perm_supported_2d(shape)


def fftp2(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """2D DFT of real ``x`` over the last two axes, PERMUTED frequency order.

    Returns split (re, im). Only pointwise algebra and :func:`ifftp2` /
    :func:`ifftp2_real` understand the order. Requires
    :func:`perm_supported_2d`.
    """
    re, im = _fftp_last(x, None, inverse=False)
    return _fftp_rows(re, im, inverse=False)


def _perm_freqs(n: int) -> jnp.ndarray:
    """True frequency of each PERMUTED-order spectrum position.

    The four-step forward stores X[k1 + N1*k2] at flat position
    p = k1*N2 + k2 (see :func:`_fftp_last`), so position p holds frequency
    ``p // N2 + (n // N2) * (p % N2)``. Built from iota on device — no
    host constants ride into the HLO."""
    n1 = n // _N2
    p = lax.iota(jnp.int32, n)
    return p // _N2 + n1 * (p % _N2)


def _small_factors(n: int, s: int, off, dtype):
    """Thin (s, n) DFT factor planes for a length-s block living at offset
    ``off`` inside a length-n zero signal, emitting PERMUTED order."""
    f = _perm_freqs(n).astype(dtype)
    j = lax.iota(dtype, s) + jnp.asarray(off, dtype)
    ang = (-2.0 * np.pi / n) * (j[:, None] * f[None, :])
    return jnp.cos(ang), jnp.sin(ang)


def fftp2_small(
    t: jnp.ndarray,
    out_shape: tuple[int, int],
    offset: tuple = (0, 0),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Permuted-order 2D DFT of a small real block zero-padded into a
    (H, W) frame at ``offset`` — WITHOUT materialising or transforming the
    padded frame.

    A zero-padded s×s block only has s non-zero rows/columns, so the full
    four-step transform collapses to two thin dense matmuls against the
    (s, H)/(s, W) slices of the effective permuted-order DFT matrix —
    measured 3x faster than pad+:func:`fftp2` for the tracker's 9-template
    bank at 29²→2048² on the v5e MXU, identical output to f32 roundoff.
    Bit-compatible with :func:`fftp2` of the padded frame (validated in
    tests/test_mxufft.py). ``offset`` may be traced (per-tile positions
    under vmap); shapes must be static and :func:`perm_supported_2d`.
    """
    H, W = int(out_shape[-2]), int(out_shape[-1])
    sh, sw = t.shape[-2], t.shape[-1]
    dt = t.dtype
    ewre, ewim = _small_factors(W, sw, offset[1], dt)
    ehre, ehim = _small_factors(H, sh, offset[0], dt)
    gre = jnp.einsum("...ij,jw->...iw", t, ewre, precision=_PREC)
    gim = jnp.einsum("...ij,jw->...iw", t, ewim, precision=_PREC)
    fre = jnp.einsum("ih,...iw->...hw", ehre, gre, precision=_PREC) - jnp.einsum(
        "ih,...iw->...hw", ehim, gim, precision=_PREC
    )
    fim = jnp.einsum("ih,...iw->...hw", ehre, gim, precision=_PREC) + jnp.einsum(
        "ih,...iw->...hw", ehim, gre, precision=_PREC
    )
    return fre, fim


def ifftp2_real(re: jnp.ndarray, im: jnp.ndarray | None) -> jnp.ndarray:
    """Real part of the inverse 2D DFT of a permuted-order spectrum.

    For the correlation of two real signals the product spectrum is
    Hermitian, so the inverse is exactly real -- the output imaginary
    plane (and its final small matmul) is never computed. Pass ``im=None``
    for a purely real spectrum (e.g. a power spectrum |F|^2): the rows
    stage then skips the zero plane's matmuls entirely."""
    h, w = re.shape[-2:]
    dre, dim = _fftp_rows(re, im, inverse=True)
    xre = _fftp_last_real_out(dre, dim)
    return xre * (1.0 / (h * w))


def _fftp_last_real_out(re, im):
    """Last-axis inverse keeping only the real output plane."""
    n = re.shape[-1]
    n1 = n // _N2
    w1re, w1im, twre, twim, w2re, w2im = _perm_consts(
        n, True, "complex128" if re.dtype == jnp.float64 else "complex64"
    )
    lead = re.shape[:-1]
    vre = re.reshape(lead + (n1, _N2))
    vim = im.reshape(lead + (n1, _N2))
    dre = jnp.einsum("...ak,nk->...an", vre, w2re, precision=_PREC) - jnp.einsum(
        "...ak,nk->...an", vim, w2im
    , precision=_PREC)
    dim = jnp.einsum("...ak,nk->...an", vre, w2im, precision=_PREC) + jnp.einsum(
        "...ak,nk->...an", vim, w2re
    , precision=_PREC)
    ere, eim = _cmul(dre, dim, twre, twim)
    xre = jnp.einsum("ba,...an->...bn", w1re, ere, precision=_PREC) - jnp.einsum(
        "ba,...an->...bn", w1im, eim
    , precision=_PREC)
    return xre.reshape(lead + (n,))


def irfft2(x: jnp.ndarray, s: tuple[int, int]) -> jnp.ndarray:
    """``jnp.fft.irfft2(x, s=s)``: real inverse from a half-spectrum.

    Rebuilds the Hermitian full spectrum (F[-ky, -kx] = conj(F[ky, kx]))
    then takes the real part of the full inverse.
    """
    h, w = s
    if not (
        mxu_fft_enabled()
        and supported_size(h)
        and supported_size(w)
        and x.shape[-2] == h
        and x.shape[-1] == w // 2 + 1
    ):
        return jnp.fft.irfft2(x, s=s, axes=(-2, -1))
    # full last axis: bins [0, w/2] given; bins [w/2+1, w-1] are the
    # conjugate of bins [1, w/2-1] with the row index negated
    tail = jnp.conj(x[..., 1 : w // 2])[..., ::-1]  # kx = w/2+1 .. w-1
    tail = jnp.roll(tail[..., ::-1, :], 1, axis=-2)  # ky -> (h-ky) % h
    full = jnp.concatenate([x, tail], axis=-1)
    return ifft2(full).real
