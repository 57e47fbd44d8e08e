# SPDX-License-Identifier: CECILL-2.1
"""Fused Pallas kernel for the permuted-order FFT correlation inverse.

The einsum formulation in :mod:`ops.mxufft` is MXU-resident but XLA still
materializes every stage to HBM: for the tracker's ``corr =
ifftp2_real(F * conj(G))`` chain that is ~6 full-plane round trips per
correlation. This kernel fuses, per 128-wide strip held in VMEM:

  stage 1 (grid j, b, a; a innermost):
      product  pre/pim = F * conj(G)           (computed on the fly)
      rows DFT d = W2 @ p  (128x128 MXU matmul per slab)
      twiddle  e = d * tw[a]
      accumulate out[b'*128+n, c] += W1[b', a] * e[n, c]   (b' unrolled)
  stage 2 (grid b, i, a):  same structure along the last axis, real output
      only, scaled by 1/(H*W) on the final slab.

HBM traffic becomes one read of each spectrum strip, one write + one read
of the mid planes, and one write of the real correlation — the minimum for
a two-stage factorization that cannot hold a full plane in VMEM.

Mosaic layout constraints shaped the code (found the hard way): 1-D->N-D
broadcasts are "unsupported shape cast", so the per-slab W1 column lives
in SMEM and is read as unrolled scalars, and the twiddle rows are passed
pre-shaped — (128, 1) for the sublane-broadcast stage, (1, 128) for the
lane-broadcast stage.

Math identical to ``mxufft.ifftp2_real(F*conj(G))`` (same four-step
factorization, same permuted storage contract); validated against it in
``tests/test_mxufft.py`` (interpret mode) and on hardware by the bench
tracking gate.

Reference note: this accelerates the reference's dominant compute —
``cv2.matchTemplate``/FFT correlation inside tracking
(signal/tracking.py:149-167) — with no convention change.
"""
from __future__ import annotations

import functools
import os
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import mxufft

__all__ = [
    "corr_from_spectra",
    "ncc_masked_from_spectra",
    "ncc_masked_peaks_from_spectra",
    "pallas_fftp_enabled",
    "supported",
]

_N2 = 128  # fixed small-DFT size (matches mxufft and the MXU/lane width)


def _knob() -> str:
    return os.environ.get("BARC4DIP_TPU_PALLAS_FFT", "auto").lower()


def pallas_fftp_enabled() -> bool:
    knob = _knob()
    if knob in ("0", "off", "false"):
        return False
    if knob in ("1", "on", "true"):
        return True
    return mxufft._platform_is_tpu()


def supported(shape: tuple[int, ...]) -> bool:
    """(B, H, W) or (H, W) template-spectra shape the kernel covers."""
    if len(shape) < 2:
        return False
    h, w = shape[-2], shape[-1]
    return (
        h % _N2 == 0
        and w % _N2 == 0
        and 1 <= h // _N2 <= 64
        and 1 <= w // _N2 <= 64
    )


@lru_cache(maxsize=16)
def _inv_consts(n: int):
    """float32 INVERSE-DFT constants for length n in the permuted
    factorization (numpy, f64-built): W1^T (n1, n1), twiddle as both
    (n1, 128, 1) [sublane broadcast] and (n1, 1, 128) [lane broadcast],
    W2 (128, 128)."""
    n1 = n // _N2
    i1 = np.arange(n1)
    i2 = np.arange(_N2)
    w1 = np.exp(2j * np.pi * np.outer(i1, i1) / n1)
    w2 = np.exp(2j * np.pi * np.outer(i2, i2) / _N2)
    tw = np.exp(2j * np.pi * np.outer(i1, i2) / n)

    def f32(m):
        return np.ascontiguousarray(m, np.float32)

    return {
        "w1t_re": f32(w1.real.T),
        "w1t_im": f32(w1.imag.T),
        "tw_col_re": f32(tw.real.reshape(n1, _N2, 1)),
        "tw_col_im": f32(tw.imag.reshape(n1, _N2, 1)),
        "tw_row_re": f32(tw.real.reshape(n1, 1, _N2)),
        "tw_row_im": f32(tw.imag.reshape(n1, 1, _N2)),
        "w2_re": f32(w2.real),
        "w2_im": f32(w2.imag),
    }


def _stage1_kernel(
    fre_ref, fim_ref, gre_ref, gim_ref,
    w1re_ref, w1im_ref, twre_ref, twim_ref, w2re_ref, w2im_ref,
    ore_ref, oim_ref, *, n1: int,
):
    """Rows-stage inverse of the conj product, one (128-row) slab per step.

    Grid (j, b, a): j = column strip, b = batch, a = row slab (innermost —
    the output strip stays resident in VMEM and accumulates over a).
    """
    a = pl.program_id(2)

    @pl.when(a == 0)
    def _():
        ore_ref[...] = jnp.zeros(ore_ref.shape, ore_ref.dtype)
        oim_ref[...] = jnp.zeros(oim_ref.shape, oim_ref.dtype)

    # conj product: F * conj(G), computed in VMEM for this slab
    fre = fre_ref[...]
    fim = fim_ref[...]
    gre = gre_ref[0]
    gim = gim_ref[0]
    pre = fre * gre + fim * gim
    pim = fim * gre - fre * gim

    w2re = w2re_ref[...]
    w2im = w2im_ref[...]
    # rows DFT of the slab: d[n, c] = sum_k w2[n, k] p[k, c]  (MXU)
    dre = (
        jnp.dot(w2re, pre, preferred_element_type=jnp.float32, precision=mxufft._PREC)
        - jnp.dot(w2im, pim, preferred_element_type=jnp.float32, precision=mxufft._PREC)
    )
    dim = (
        jnp.dot(w2im, pre, preferred_element_type=jnp.float32, precision=mxufft._PREC)
        + jnp.dot(w2re, pim, preferred_element_type=jnp.float32, precision=mxufft._PREC)
    )
    # twiddle for this slab: tw[a, n], pre-shaped (128, 1) for sublanes
    twre = twre_ref[0]
    twim = twim_ref[0]
    ere = dre * twre - dim * twim
    eim = dre * twim + dim * twre
    # a-contraction: out[b'*128 + n, c] += w1[b', a] e[n, c], b' unrolled
    for bb in range(n1):
        wre = w1re_ref[a, bb]
        wim = w1im_ref[a, bb]
        sl = slice(bb * _N2, (bb + 1) * _N2)
        ore_ref[0, sl, :] += wre * ere - wim * eim
        oim_ref[0, sl, :] += wre * eim + wim * ere


def _stage2_kernel(
    mre_ref, mim_ref,
    w1re_ref, w1im_ref, twre_ref, twim_ref, w2re_ref, w2im_ref,
    out_ref, *, n1: int, scale: float,
):
    """Last-axis inverse, REAL output plane only, one column slab per step.

    Grid (b, i, a): i = row strip, a = column slab (innermost)."""
    a = pl.program_id(2)

    @pl.when(a == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    mre = mre_ref[0]
    mim = mim_ref[0]
    w2re = w2re_ref[...]
    w2im = w2im_ref[...]
    # d[r, n] = sum_k m[r, k] w2[n, k]  (contraction over the lane axis)
    dre = (
        jnp.dot(mre, w2re.T, preferred_element_type=jnp.float32, precision=mxufft._PREC)
        - jnp.dot(mim, w2im.T, preferred_element_type=jnp.float32, precision=mxufft._PREC)
    )
    dim = (
        jnp.dot(mre, w2im.T, preferred_element_type=jnp.float32, precision=mxufft._PREC)
        + jnp.dot(mim, w2re.T, preferred_element_type=jnp.float32, precision=mxufft._PREC)
    )
    # twiddle: tw[a, n], pre-shaped (1, 128) for lanes
    twre = twre_ref[0]
    twim = twim_ref[0]
    ere = dre * twre - dim * twim
    eim = dre * twim + dim * twre
    # out[r, b'*128 + n] += w1[b', a] e[r, n], b' unrolled over column slabs
    for bb in range(n1):
        wre = w1re_ref[a, bb]
        wim = w1im_ref[a, bb]
        sl = slice(bb * _N2, (bb + 1) * _N2)
        out_ref[0, :, sl] += wre * ere - wim * eim

    @pl.when(a == pl.num_programs(2) - 1)
    def _():
        out_ref[...] = out_ref[...] * scale


def _stage2_ncc_kernel(
    mre_ref, mim_ref, var_ref, en_ref, eps_ref,
    w1re_ref, w1im_ref, twre_ref, twim_ref, w2re_ref, w2im_ref,
    out_ref, stat_ref, *, n1: int, scale: float, vh: int, vw: int,
):
    """Stage-2 inverse with the NCC epilogue fused into the final slab:
    divide by sqrt(var * energy), zero degenerate denominators, mask the
    circular-wrap region (rows >= vh or cols >= vw) to -inf. The 16 MB
    correlation plane never round-trips HBM between the inverse and the
    peak search — the strip is finalised in VMEM and written once as the
    masked NCC map (ops/ncc.py ncc_full_masked_from_preps semantics)."""
    a = pl.program_id(2)
    i = pl.program_id(1)
    b = pl.program_id(0)

    @pl.when(a == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
        stat_ref[...] = jnp.zeros(stat_ref.shape, stat_ref.dtype)

    mre = mre_ref[0]
    mim = mim_ref[0]
    w2re = w2re_ref[...]
    w2im = w2im_ref[...]
    dre = (
        jnp.dot(mre, w2re.T, preferred_element_type=jnp.float32, precision=mxufft._PREC)
        - jnp.dot(mim, w2im.T, preferred_element_type=jnp.float32, precision=mxufft._PREC)
    )
    dim = (
        jnp.dot(mre, w2im.T, preferred_element_type=jnp.float32, precision=mxufft._PREC)
        + jnp.dot(mim, w2re.T, preferred_element_type=jnp.float32, precision=mxufft._PREC)
    )
    twre = twre_ref[0]
    twim = twim_ref[0]
    ere = dre * twre - dim * twim
    eim = dre * twim + dim * twre
    for bb in range(n1):
        wre = w1re_ref[a, bb]
        wim = w1im_ref[a, bb]
        sl = slice(bb * _N2, (bb + 1) * _N2)
        out_ref[0, :, sl] += wre * ere - wim * eim

    @pl.when(a == pl.num_programs(2) - 1)
    def _():
        corr = out_ref[...] * scale                      # (1, 128, W)
        h, w = corr.shape[-2], corr.shape[-1]
        var = var_ref[...]                               # (128, W)
        # whole small arrays in SMEM, rows indexed dynamically — (1, 1)
        # blocks of a (B, 1) array violate Mosaic's divisible-or-equal rule
        en = en_ref[b, 0]
        eps = eps_ref[0, 0]                              # runtime (traced)
        denom = jnp.sqrt(var * en)
        safe = denom > eps
        ncc = jnp.where(safe, corr[0] / jnp.where(safe, denom, 1.0), 0.0)
        ri = lax.broadcasted_iota(jnp.int32, (h, w), 0) + i * _N2
        ci = lax.broadcasted_iota(jnp.int32, (h, w), 1)
        valid = (ri < vh) & (ci < vw)
        neg = jnp.float32(-jnp.inf)
        masked = jnp.where(valid, ncc, neg)
        out_ref[...] = masked[None]
        # per-strip peak (max + first-occurrence flat index) so the host
        # argmax never re-reads the 16 MB map: the flat index fits f32
        # exactly (H*W < 2^24). stat row layout: lane 0 = max, lane 1 =
        # flat index within the FULL map (row-major), rest zero.
        m = jnp.max(masked)
        flat = ri * jnp.int32(w) + ci
        big = jnp.int32(h * w * pl.num_programs(1))
        idx = jnp.min(jnp.where(masked == m, flat, big)).astype(jnp.float32)
        lane = lax.broadcasted_iota(jnp.int32, (1, _N2), 1)
        row = jnp.where(
            lane == 0, m, jnp.where(lane == 1, idx, jnp.float32(0.0))
        )
        stat_ref[0, 0, 0:1, :] = row


@lru_cache(maxsize=16)
def _build(B: int, H: int, W: int, interpret: bool):
    """(Fre, Fim, Gre, Gim) -> corr runner for one geometry."""
    n1h, n1w = H // _N2, W // _N2
    ch = _inv_consts(H)
    cw = _inv_consts(W)

    # ---- stage 1: rows inverse of the conj product -> mid planes --------
    strip = pl.BlockSpec(
        (_N2, _N2), lambda j, b, a: (a, j), memory_space=pltpu.VMEM
    )
    gspec = pl.BlockSpec(
        (1, _N2, _N2), lambda j, b, a: (b, a, j), memory_space=pltpu.VMEM
    )
    # whole W1^T in SMEM (small); row a read as scalars in-kernel
    w1col = pl.BlockSpec(
        (n1h, n1h), lambda j, b, a: (0, 0), memory_space=pltpu.SMEM
    )
    twcol = pl.BlockSpec(
        (1, _N2, 1), lambda j, b, a: (a, 0, 0), memory_space=pltpu.VMEM
    )
    whole = pl.BlockSpec(
        (_N2, _N2), lambda j, b, a: (0, 0), memory_space=pltpu.VMEM
    )
    ostrip = pl.BlockSpec(
        (1, H, _N2), lambda j, b, a: (b, 0, j), memory_space=pltpu.VMEM
    )
    stage1 = pl.pallas_call(
        functools.partial(_stage1_kernel, n1=n1h),
        grid=(W // _N2, B, n1h),
        in_specs=[strip, strip, gspec, gspec, w1col, w1col, twcol, twcol,
                  whole, whole],
        out_specs=(ostrip, ostrip),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        ),
        interpret=interpret,
    )

    # ---- stage 2: last-axis inverse, real output -------------------------
    mspec = pl.BlockSpec(
        (1, _N2, _N2), lambda b, i, a: (b, i, a), memory_space=pltpu.VMEM
    )
    w1col2 = pl.BlockSpec(
        (n1w, n1w), lambda b, i, a: (0, 0), memory_space=pltpu.SMEM
    )
    twrow2 = pl.BlockSpec(
        (1, 1, _N2), lambda b, i, a: (a, 0, 0), memory_space=pltpu.VMEM
    )
    whole2 = pl.BlockSpec(
        (_N2, _N2), lambda b, i, a: (0, 0), memory_space=pltpu.VMEM
    )
    orow = pl.BlockSpec(
        (1, _N2, W), lambda b, i, a: (b, i, 0), memory_space=pltpu.VMEM
    )
    stage2 = pl.pallas_call(
        functools.partial(_stage2_kernel, n1=n1w, scale=1.0 / float(H * W)),
        grid=(B, H // _N2, n1w),
        in_specs=[mspec, mspec, w1col2, w1col2, twrow2, twrow2, whole2,
                  whole2],
        out_specs=orow,
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        interpret=interpret,
    )

    def run(Fre, Fim, Gre, Gim):
        mid_re, mid_im = stage1(
            Fre, Fim, Gre, Gim,
            jnp.asarray(ch["w1t_re"]), jnp.asarray(ch["w1t_im"]),
            jnp.asarray(ch["tw_col_re"]), jnp.asarray(ch["tw_col_im"]),
            jnp.asarray(ch["w2_re"]), jnp.asarray(ch["w2_im"]),
        )
        return stage2(
            mid_re, mid_im,
            jnp.asarray(cw["w1t_re"]), jnp.asarray(cw["w1t_im"]),
            jnp.asarray(cw["tw_row_re"]), jnp.asarray(cw["tw_row_im"]),
            jnp.asarray(cw["w2_re"]), jnp.asarray(cw["w2_im"]),
        )

    return run


@lru_cache(maxsize=16)
def _build_ncc(
    B: int, H: int, W: int, vh: int, vw: int, interpret: bool
):
    """(Fre, Fim, Gre, Gim, var_full, energy, eps) -> masked NCC bank
    runner (eps is a runtime SMEM scalar: callers pass it traced)."""
    n1h, n1w = H // _N2, W // _N2
    ch = _inv_consts(H)
    cw = _inv_consts(W)

    # stage 1 is the generic rows inverse — share the same kernel/specs
    strip = pl.BlockSpec(
        (_N2, _N2), lambda j, b, a: (a, j), memory_space=pltpu.VMEM
    )
    gspec = pl.BlockSpec(
        (1, _N2, _N2), lambda j, b, a: (b, a, j), memory_space=pltpu.VMEM
    )
    w1col = pl.BlockSpec(
        (n1h, n1h), lambda j, b, a: (0, 0), memory_space=pltpu.SMEM
    )
    twcol = pl.BlockSpec(
        (1, _N2, 1), lambda j, b, a: (a, 0, 0), memory_space=pltpu.VMEM
    )
    whole = pl.BlockSpec(
        (_N2, _N2), lambda j, b, a: (0, 0), memory_space=pltpu.VMEM
    )
    ostrip = pl.BlockSpec(
        (1, H, _N2), lambda j, b, a: (b, 0, j), memory_space=pltpu.VMEM
    )
    stage1 = pl.pallas_call(
        functools.partial(_stage1_kernel, n1=n1h),
        grid=(W // _N2, B, n1h),
        in_specs=[strip, strip, gspec, gspec, w1col, w1col, twcol, twcol,
                  whole, whole],
        out_specs=(ostrip, ostrip),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        ),
        interpret=interpret,
    )

    mspec = pl.BlockSpec(
        (1, _N2, _N2), lambda b, i, a: (b, i, a), memory_space=pltpu.VMEM
    )
    varspec = pl.BlockSpec(
        (_N2, W), lambda b, i, a: (i, 0), memory_space=pltpu.VMEM
    )
    enspec = pl.BlockSpec(
        (B, 1), lambda b, i, a: (0, 0), memory_space=pltpu.SMEM
    )
    epspec = pl.BlockSpec(
        (1, 1), lambda b, i, a: (0, 0), memory_space=pltpu.SMEM
    )
    w1col2 = pl.BlockSpec(
        (n1w, n1w), lambda b, i, a: (0, 0), memory_space=pltpu.SMEM
    )
    twrow2 = pl.BlockSpec(
        (1, 1, _N2), lambda b, i, a: (a, 0, 0), memory_space=pltpu.VMEM
    )
    whole2 = pl.BlockSpec(
        (_N2, _N2), lambda b, i, a: (0, 0), memory_space=pltpu.VMEM
    )
    orow = pl.BlockSpec(
        (1, _N2, W), lambda b, i, a: (b, i, 0), memory_space=pltpu.VMEM
    )
    # per-strip peak stats: rank-4 (1, 1, 8, 128) blocks satisfy Mosaic's
    # divisible-or-equal rule with static in-block indexing (a (1, 128)
    # block of a (B, G, 128) array would not); rows 1..7 are padding
    statspec = pl.BlockSpec(
        (1, 1, 8, _N2), lambda b, i, a: (b, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    G = H // _N2
    stage2 = pl.pallas_call(
        functools.partial(
            _stage2_ncc_kernel, n1=n1w, scale=1.0 / float(H * W),
            vh=vh, vw=vw,
        ),
        grid=(B, G, n1w),
        in_specs=[mspec, mspec, varspec, enspec, epspec, w1col2, w1col2,
                  twrow2, twrow2, whole2, whole2],
        out_specs=(orow, statspec),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, G, 8, _N2), jnp.float32),
        ),
        interpret=interpret,
    )

    def run(Fre, Fim, Gre, Gim, var_full, energy, eps):
        mid_re, mid_im = stage1(
            Fre, Fim, Gre, Gim,
            jnp.asarray(ch["w1t_re"]), jnp.asarray(ch["w1t_im"]),
            jnp.asarray(ch["tw_col_re"]), jnp.asarray(ch["tw_col_im"]),
            jnp.asarray(ch["w2_re"]), jnp.asarray(ch["w2_im"]),
        )
        maps, stats = stage2(
            mid_re, mid_im, var_full, energy.reshape(B, 1),
            jnp.asarray(eps, jnp.float32).reshape(1, 1),
            jnp.asarray(cw["w1t_re"]), jnp.asarray(cw["w1t_im"]),
            jnp.asarray(cw["tw_row_re"]), jnp.asarray(cw["tw_row_im"]),
            jnp.asarray(cw["w2_re"]), jnp.asarray(cw["w2_im"]),
        )
        # reduce (B, G) strip peaks to one (i, j) per map on the host side
        # of the kernel (tiny): first-occurrence semantics match
        # jnp.argmax over the full map exactly
        maxs = stats[:, :, 0, 0]                    # (B, G)
        idxf = stats[:, :, 0, 1]                    # (B, G) flat f32
        g = jnp.argmax(maxs, axis=1)                # first best strip
        flat = jnp.take_along_axis(idxf, g[:, None], axis=1)[:, 0]
        flat = flat.astype(jnp.int32)
        return maps, flat // W, flat % W

    return run


def ncc_masked_peaks_from_spectra(
    Fre, Fim, Gre, Gim, var_full, energy, *,
    valid_hw: tuple, eps: float = 1e-9, interpret: bool | None = None,
):
    """Masked NCC bank + integer peaks straight from permuted-order
    spectra: the inverse correlation, denominator divide, wrap-region
    -inf mask AND the per-strip peak reduction fused in one kernel — the
    correlation plane is finalised in VMEM and written to HBM exactly
    once, and the host-side argmax reduces a (B, H/128) stat table
    instead of re-reading 16 MB per map. ``var_full`` is the (H, W)
    zero-padded window-variance plane shared by the bank; ``energy`` the
    per-template (B,) energies. Returns (maps, iy, ix) with (iy, ix)
    int32 (B,) equal to jnp.argmax over each masked map
    (first-occurrence, row-major).

    Falls back to the unfused composition (corr kernel/einsum + XLA
    divide/mask/argmax — identical results) when the kernel is
    off/unsupported.
    """
    squeeze = False
    if Gre.ndim == 2:
        Gre, Gim = Gre[None], Gim[None]
        energy = jnp.reshape(energy, (1,))
        squeeze = True
    vh, vw = (int(v) for v in valid_hw)
    use = pallas_fftp_enabled() if interpret is None else True
    if use and supported(Gre.shape) and Fre.dtype == jnp.float32:
        B, H, W = Gre.shape
        out, iy, ix = _build_ncc(
            int(B), int(H), int(W), vh, vw, bool(interpret)
        )(Fre, Fim, Gre, Gim, var_full, energy, eps)
    else:
        corr = corr_from_spectra(Fre, Fim, Gre, Gim, interpret=interpret)
        denom = jnp.sqrt(var_full[None] * energy[:, None, None])
        safe = denom > eps
        ncc = jnp.where(safe, corr / jnp.where(safe, denom, 1.0), 0.0)
        H, W = Fre.shape[-2:]
        ri = lax.broadcasted_iota(jnp.int32, (H, W), 0)
        ci = lax.broadcasted_iota(jnp.int32, (H, W), 1)
        valid = (ri < vh) & (ci < vw)
        out = jnp.where(valid[None], ncc, jnp.asarray(-jnp.inf, ncc.dtype))
        flat = jnp.argmax(out.reshape(out.shape[0], -1), axis=1)
        iy = (flat // W).astype(jnp.int32)
        ix = (flat % W).astype(jnp.int32)
    if squeeze:
        return out[0], iy[0], ix[0]
    return out, iy, ix


def ncc_masked_from_spectra(
    Fre, Fim, Gre, Gim, var_full, energy, *,
    valid_hw: tuple, eps: float = 1e-9, interpret: bool | None = None,
):
    """Masked NCC bank (maps only) — see
    :func:`ncc_masked_peaks_from_spectra`."""
    out, _iy, _ix = ncc_masked_peaks_from_spectra(
        Fre, Fim, Gre, Gim, var_full, energy,
        valid_hw=valid_hw, eps=eps, interpret=interpret,
    )
    return out


def corr_from_spectra(Fre, Fim, Gre, Gim, *, interpret: bool | None = None):
    """Real correlation planes ``ifftp2_real(F * conj(G))`` for a bank of
    permuted-order template spectra ``G`` (B, H, W) against one image
    spectrum ``F`` (H, W).

    Uses the fused Pallas kernel when enabled/supported; falls back to the
    einsum path (identical math) otherwise.
    """
    squeeze = False
    if Gre.ndim == 2:
        Gre, Gim = Gre[None], Gim[None]
        squeeze = True
    use = pallas_fftp_enabled() if interpret is None else True
    if use and supported(Gre.shape) and Fre.dtype == jnp.float32:
        B, H, W = Gre.shape
        out = _build(int(B), int(H), int(W), bool(interpret))(
            Fre, Fim, Gre, Gim
        )
    else:
        pre = Fre[None] * Gre + Fim[None] * Gim
        pim = Fim[None] * Gre - Fre[None] * Gim
        out = mxufft.ifftp2_real(pre, pim)
    return out[0] if squeeze else out
