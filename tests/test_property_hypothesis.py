# SPDX-License-Identifier: CECILL-2.1
"""Hypothesis property tests for the hand-vectorised kernels.

These complement the fixed-seed fuzz loops in test_fuzz_kernels.py with
generated inputs + shrinking: arbitrary shapes, tie-heavy and NaN-laden
payloads, extreme magnitudes. Skipped wholesale if hypothesis is absent
from the image (it is not a declared dependency of the package).
"""
import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from tests.reference_impl import distance_at_fraction as ref_dist  # noqa: E402
from tests.reference_impl import width_at_fraction as ref_width  # noqa: E402

# Shape-polymorphic JAX kernels recompile per generated shape: keep example
# counts moderate and suppress the too-slow health check (compiles, not the
# test body, dominate).
COMMON = dict(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)

finite = st.floats(
    min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
)


@st.composite
def profile_1d(draw, min_n=3, max_n=64):
    n = draw(st.integers(min_n, max_n))
    kind = draw(st.integers(0, 3))
    if kind == 0:  # free-form floats
        return np.asarray(draw(st.lists(finite, min_size=n, max_size=n)))
    if kind == 1:  # tie-heavy small integers
        vals = draw(st.lists(st.integers(-3, 3), min_size=n, max_size=n))
        return np.asarray(vals, dtype=float)
    if kind == 2:  # constant
        return np.full(n, draw(finite))
    # smooth bump with generated width/offset (the geometric common case)
    c = draw(st.floats(0.0, 1.0))
    w = draw(st.floats(0.05, 2.0))
    x = np.linspace(-1, 1, n)
    return np.exp(-(((x - (2 * c - 1)) / w) ** 2))


@given(p=profile_1d(), fraction=st.floats(0.05, 0.95))
@settings(**COMMON)
def test_width_at_fraction_matches_reference(p, fraction):
    from barc4dip_tpu.maths import width_at_fraction

    got_v, got_edge = width_at_fraction(p, fraction=fraction)
    want_v, want_edge = ref_width(p, fraction)
    assert got_edge == want_edge
    assert got_v == pytest.approx(want_v, rel=1e-9, abs=1e-12)


@given(p=profile_1d(), fraction=st.floats(0.05, 0.95), data=st.data())
@settings(**COMMON)
def test_distance_at_fraction_matches_reference(p, fraction, data):
    from barc4dip_tpu.maths import distance_at_fraction_from_peak

    peak_index = data.draw(st.integers(0, p.size - 1))
    got_v, got_edge = distance_at_fraction_from_peak(
        p, fraction=fraction, peak_index=peak_index
    )
    want_v, want_edge = ref_dist(p, fraction, peak_index)
    assert got_edge == want_edge
    assert got_v == pytest.approx(want_v, rel=1e-9, abs=1e-12)


@given(
    xs=st.lists(
        st.one_of(finite, st.just(np.nan)), min_size=2, max_size=400
    ),
    ps=st.lists(st.floats(0.0, 100.0), min_size=1, max_size=4),
)
@settings(**COMMON)
def test_nanpercentiles_exact_matches_numpy(xs, ps):
    from barc4dip_tpu.ops.quantile import nanpercentiles_exact

    x = np.asarray(xs, dtype=float)
    if not np.any(np.isfinite(x)):
        x[0] = 0.0  # all-NaN percentile is undefined in both implementations
    ps = tuple(sorted(ps))
    got = np.asarray(nanpercentiles_exact(jnp.asarray(x), ps))
    want = np.nanpercentile(x, list(ps))
    scale = max(np.nanmax(np.abs(x)), 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9 * scale)


@given(
    ny=st.integers(3, 24),
    nx=st.integers(3, 24),
    seed=st.integers(0, 2**31 - 1),
    ties=st.booleans(),
)
@settings(**COMMON)
def test_median_filter_matches_scipy(ny, nx, seed, ties):
    from scipy.ndimage import median_filter

    from barc4dip_tpu.ops.rank import median_filter2d

    rng = np.random.default_rng(seed)
    z = (
        rng.integers(0, 4, size=(ny, nx)).astype(float)
        if ties
        else rng.normal(size=(ny, nx))
    )
    got = np.asarray(median_filter2d(jnp.asarray(z), size=3))
    want = median_filter(z, size=3, mode="reflect")
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


@given(
    n=st.integers(8, 60),
    m=st.integers(8, 60),
    seed=st.integers(0, 2**31 - 1),
    nan_frac=st.floats(0.0, 0.5),
    scale_exp=st.integers(-6, 8),
)
@settings(**COMMON)
def test_distribution_moments_match_numpy(n, m, seed, nan_frac, scale_exp):
    from barc4dip_tpu.metrics import distribution_moments

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, m)) * 10.0**scale_exp + 3.0
    x[rng.random(size=x.shape) < nan_frac] = np.nan
    if not np.any(np.isfinite(x)):
        x[0, 0] = 1.0
    got = distribution_moments(x, verbose=False)
    flat = x[np.isfinite(x)].astype(np.float64)
    assert got["mean"] == pytest.approx(flat.mean(), rel=1e-9)
    assert got["std"] == pytest.approx(flat.std(ddof=0), rel=1e-9, abs=1e-12)
    assert got["variance"] == pytest.approx(flat.var(ddof=0), rel=1e-9, abs=1e-12)


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    nframes=st.integers(1, 3),
    dtype=st.sampled_from(
        [np.uint16, np.int32, np.float32, np.float64, np.uint8]
    ),
    big_endian=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=20, deadline=None, derandomize=True)
def test_edf_save_read_roundtrip(h, w, nframes, dtype, big_endian, seed):
    """save_edf -> read_edf(index=i) is the identity on values for every
    supported dtype, frame count, and byte order (reference contract:
    io/edf.py:18 reads frame ``index`` of what uti_EdfFile.WriteImage
    wrote; multi-frame files are addressed per frame, not stacked)."""
    import tempfile
    from pathlib import Path

    from barc4dip_tpu.io.edf import read_edf, save_edf

    rng = np.random.default_rng(seed)
    if np.issubdtype(dtype, np.floating):
        data = rng.normal(size=(nframes, h, w)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        data = rng.integers(
            max(info.min, -1000), min(info.max, 1000) + 1, size=(nframes, h, w)
        ).astype(dtype)
    if big_endian:
        data = data.astype(data.dtype.newbyteorder(">"))
    native = data.dtype.newbyteorder("=")
    with tempfile.TemporaryDirectory() as td:
        path = Path(td) / "prop.edf"
        save_edf(data if nframes > 1 else data[0], str(path))
        for i in range(nframes):
            back = read_edf(str(path), index=i, dtype=native)
            np.testing.assert_array_equal(back, data[i].astype(native))


@given(
    dy=st.floats(-0.45, 0.45),
    dx=st.floats(-0.45, 0.45),
    curv_y=st.floats(0.2, 5.0),
    curv_x=st.floats(0.2, 5.0),
    cross=st.floats(-0.3, 0.3),
)
@settings(**COMMON)
def test_subpixel_taylor_recovers_quadratic_optimum(dy, dx, curv_y, curv_x, cross):
    from barc4dip_tpu.ops import phasecorr as pc

    n = 11
    yy = np.arange(n)[:, None] - n // 2
    xx = np.arange(n)[None, :] - n // 2
    # keep the Hessian negative definite so the analytic optimum is (dy, dx)
    hypothesis.assume(cross * cross < curv_y * curv_x)
    corr = (
        1.0
        - curv_y * (yy - dy) ** 2
        - curv_x * (xx - dx) ** 2
        + cross * (yy - dy) * (xx - dx)
    )
    i, j = pc.argmax2d(jnp.asarray(corr))
    di, dj = pc.subpixel_taylor(jnp.asarray(corr), i, j, convention="newton")
    assert float(i) + float(di) == pytest.approx(n // 2 + dy, abs=1e-5)
    assert float(j) + float(dj) == pytest.approx(n // 2 + dx, abs=1e-5)


@given(
    h=st.integers(1, 200),
    w=st.integers(1, 200),
    cy=st.integers(-50, 250),
    cx=st.integers(-50, 250),
    side=st.integers(1, 99),
)
@settings(**COMMON)
def test_roi_slices_clip_invariants(h, w, cy, cx, side):
    """Clipped ROI slices always stay in-bounds, keep odd extents when they
    fit, and always contain the clipped center."""
    from barc4dip_tpu.geometry import odd_size, roi_slices

    size = odd_size(side)
    sy, sx = roi_slices((h, w), (size, size), center_yx=(cy, cx), clip=True)
    assert 0 <= sy.start <= sy.stop <= h
    assert 0 <= sx.start <= sx.stop <= w
    assert sy.stop - sy.start <= size
    assert sx.stop - sx.start <= size
    # a fully in-bounds ROI is never shrunk
    if 0 <= cy - size // 2 and cy + size // 2 < h:
        assert sy.stop - sy.start == size
    if 0 <= cx - size // 2 and cx + size // 2 < w:
        assert sx.stop - sx.start == size


@given(
    ny=st.integers(8, 48),
    nx=st.integers(8, 48),
    seed=st.integers(0, 2**31 - 1),
    dx=st.floats(0.1, 10.0),
    dy=st.floats(0.1, 10.0),
)
@settings(**COMMON)
def test_psd_parseval_and_autocorr_invariants(ny, nx, seed, dx, dy):
    """Physics invariants of the Fourier layer on arbitrary real fields:

    - Parseval: sum(PSD(scale=False)) == N * sum(x²) for mean-kept input;
    - the autocorrelation of a real field peaks at zero lag with value 1
      (peak normalization) and is centro-symmetric.
    """
    from barc4dip_tpu.signal import autocorr2d, psd2d

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(ny, nx))

    P, _, _ = psd2d(x, dx=dx, dy=dy, scale=False)
    P = np.asarray(P)
    np.testing.assert_allclose(
        P.sum(), ny * nx * np.sum(x * x), rtol=1e-8, atol=1e-6
    )

    ac, xl, yl = autocorr2d(x)
    ac = np.asarray(ac)
    iy0, ix0 = ny // 2, nx // 2
    assert float(xl[ix0]) == 0.0 and float(yl[iy0]) == 0.0
    assert ac[iy0, ix0] == pytest.approx(1.0, abs=1e-9)  # peak-normalized
    assert np.nanmax(np.abs(ac)) <= 1.0 + 1e-9
    assert np.unravel_index(np.argmax(ac), ac.shape) == (iy0, ix0)


@given(
    n=st.integers(16, 96),
    shift=st.integers(-5, 5),
    seed=st.integers(0, 2**31 - 1),
)
@settings(**COMMON)
def test_xcorr_shift_theorem(n, shift, seed):
    """Circular cross-correlation of a signal with its roll peaks at the
    roll distance (reference lag convention: centered axis)."""
    from barc4dip_tpu.signal import xcorr1d

    rng = np.random.default_rng(seed)
    a = rng.normal(size=n)
    b = np.roll(a, shift)
    corr, lags = xcorr1d(b, a, normalize="peak")
    corr = np.asarray(corr)
    k = int(np.argmax(np.abs(corr)))
    assert float(lags[k]) == float(shift)


def _byte_offset_encode(values):
    out = bytearray()
    prev = 0
    for v in values:
        d = int(v) - prev
        prev = int(v)
        if -127 <= d <= 127:
            out += d.to_bytes(1, "little", signed=True)
        elif -32767 <= d <= 32767:
            out += b"\x80" + d.to_bytes(2, "little", signed=True)
        else:
            out += b"\x80\x00\x80" + d.to_bytes(4, "little", signed=True)
    return bytes(out)


@given(
    # values bounded so consecutive DELTAS stay within the int32 escape
    # level (the format's deepest level this decoder implements — same as
    # the reference's PyMca reader; Pilatus counts are int32 pixels)
    st.lists(
        st.integers(min_value=-(2**30), max_value=2**30 - 1),
        min_size=1, max_size=300,
    ).filter(
        lambda vs: all(
            -(2**31) <= b - a < 2**31
            for a, b in zip([0] + vs, vs)
        )
    ),
    st.binary(max_size=16),
)
@settings(max_examples=200, deadline=None)
def test_cbf_byte_offset_roundtrip(values, trailing_junk):
    """encode -> decode is the identity, with arbitrary trailing bytes
    (CBF footers/padding) after the payload left untouched."""
    from barc4dip_tpu.io.edf import _byte_offset_decode

    raw = _byte_offset_encode(values) + trailing_junk
    out = _byte_offset_decode(raw, len(values))
    np.testing.assert_array_equal(out, np.asarray(values, dtype=np.int64))


@given(st.integers(min_value=1, max_value=64), st.data())
@settings(max_examples=50, deadline=None)
def test_cbf_decode_truncated_raises(n_vals, data):
    """A stream cut anywhere inside the payload raises, never hangs or
    returns short."""
    from barc4dip_tpu.io.edf import _byte_offset_decode

    values = data.draw(
        st.lists(
            st.integers(min_value=-(2**20), max_value=2**20),
            min_size=n_vals, max_size=n_vals,
        )
    )
    raw = _byte_offset_encode(values)
    cut = data.draw(st.integers(min_value=0, max_value=max(0, len(raw) - 1)))
    try:
        out = _byte_offset_decode(raw[:cut], n_vals)
    except ValueError:
        return  # truncation detected
    # a truncated stream may still "decode" when the cut turns payload
    # bytes into plausible deltas (byte-offset is not self-synchronising),
    # so the sound property is: no hang, no crash, full-length output
    assert out.shape == (n_vals,)


@given(
    st.integers(min_value=-30, max_value=30),
    st.integers(min_value=-30, max_value=30),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(**COMMON)
def test_register_stack_roll_roundtrip_property(dy, dx, seed):
    """register_stack recovers ANY integer roll exactly in roll mode
    (wrap ambiguity aside: |shift| < N/2 keeps the measurement unique)."""
    from barc4dip_tpu.preprocessing import register_stack

    rng = np.random.default_rng(seed)
    ref = (rng.random((64, 64)).astype(np.float32) + 0.25) * 100.0
    stack = np.stack([ref, np.roll(ref, (dy, dx), axis=(0, 1))])
    aligned, shifts = register_stack(
        stack, subpixel=False, shift_mode="roll", frame_chunk=2
    )
    assert shifts["dy"][1] == dy and shifts["dx"][1] == dx
    np.testing.assert_array_equal(aligned[1], ref)


@given(
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(**COMMON)
def test_visibility_map_matches_brute_force_property(window, stride, seed):
    """Dense visibility equals the per-window std/mean for arbitrary
    window/stride/content (incl. zero-mean windows -> NaN)."""
    from barc4dip_tpu.metrics import visibility_map

    rng = np.random.default_rng(seed)
    img = rng.random((window + 11, window + 7)).astype(np.float32) * 50.0
    img[: window // 2] = 0.0  # force some zero-mean windows
    got = visibility_map(img, window=window, stride=stride)
    img64 = img.astype(np.float64)
    for i in range(got.shape[0]):
        for j in range(got.shape[1]):
            p = img64[i * stride : i * stride + window,
                      j * stride : j * stride + window]
            m = p.mean()
            want = p.std() / m if m > 0 else np.nan
            np.testing.assert_allclose(got[i, j], want, rtol=5e-4,
                                       atol=1e-7, equal_nan=True)
