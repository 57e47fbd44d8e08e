#!/usr/bin/env python
# SPDX-License-Identifier: CECILL-2.1
"""Full SURVEY §6 benchmark sweep: Configs A-E, TPU vs the CPU reference.

``bench.py`` is the driver's single-line north-star (Config D); this script
measures every config and writes BENCH_DETAILS.json. Each config runs the
same workload through both implementations (reference imported from
/root/reference/src, OpenCV tracking backend).

Usage: python bench_configs.py [--skip-cpu]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from bench import make_stack  # noqa: E402

SIDE = 2048
REPEATS = 3


def _timeit(fn, repeats=REPEATS, warmup=True):
    if warmup:  # compiles on the TPU side; pure waste for the CPU reference
        fn()
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _make_flat(shape):
    """The synthetic flat-field used by config E on BOTH sides — one
    definition so the comparison stays like-for-like."""
    return np.random.default_rng(0).normal(2000, 50, size=shape).astype(np.float32)


def bench_tpu(field2d, stack):
    import barc4dip_tpu as dip
    from barc4dip_tpu.ops import uploadcache as _uc
    from barc4dip_tpu.preprocessing import deconvolve_psf, flat_field_correction

    out = {}

    def _cold(fn):
        """Fresh-session semantics: the content-addressed upload cache is
        cleared before every measured run, so cross-repeat dedup of the
        benchmark's (necessarily identical) frame cannot flatter the
        numbers. Within-run dedup (one frame feeding several calls) is the
        real user pattern and stays."""
        def wrapped():
            _uc.cache_clear()
            fn()
        return wrapped

    out["A_sharpness_stats_2k"] = _timeit(_cold(
        lambda: dip.logbook_report(dip.sharpness_stats(field2d, verbose=False))
    ))
    out["B_speckle_stats_2k"] = _timeit(_cold(
        lambda: dip.speckle_stats(field2d, metrics="all", tiles=True, verbose=False)
    ))

    def config_c():
        # the documented ex_03 front door (MIGRATION.md, examples/ex_03):
        # the whole quick-look as ONE fused program — radial curves and
        # axes land on host, the two big maps stay device-resident under
        # the package's lazy-leaf residence rule (materialise on demand
        # via pull_centrosymmetric)
        dip.signal.spectral_summary(field2d)

    out["C_fourier_radial_2k"] = _timeit(_cold(config_c))

    def config_c_composed():
        # the reference's literal call pattern: separate public calls with
        # both full maps pulled to host. Upload dedup ships the frame once;
        # the pulls (~17 MB over the ~30-45 MB/s tunnel) dominate — kept
        # for transparency as the worst-case migration path
        P, fx, fy = dip.signal.psd2d(field2d)
        ac, xl, yl = dip.signal.autocorr2d(field2d)
        rb, _ = dip.maths.radial_mean_binned(ac)
        ri, _ = dip.maths.radial_mean_interpolated(ac)
        dip.signal.pull_centrosymmetric(P)
        dip.signal.pull_centrosymmetric(ac)
        np.asarray(rb); np.asarray(ri)

    out["C_composed_pull_2k"] = _timeit(_cold(config_c_composed))

    def config_c_quantized():
        # same workload, maps shipped as u16 codes (display/transport
        # grade, ~1.5e-5 worst-case abs error on peak-normalised maps)
        P, fx, fy = dip.signal.psd2d(field2d)
        ac, xl, yl = dip.signal.autocorr2d(field2d)
        rb, _ = dip.maths.radial_mean_binned(ac)
        ri, _ = dip.maths.radial_mean_interpolated(ac)
        dip.signal.pull_centrosymmetric(P, quantize="u16")
        dip.signal.pull_centrosymmetric(ac, quantize="u16")
        np.asarray(rb); np.asarray(ri)

    out["C_quantized_pull_2k"] = _timeit(_cold(config_c_quantized))

    def config_c_device():
        # the reference's composed call pattern consumed on device: four
        # public calls, maps stay chip-resident, only the radial curves
        # land on host. Expected SLOWER than the one-program front door by
        # the extra program launches on a backend with a measured 30-60 ms
        # serialized per-dispatch floor — quantified in the
        # C_dispatch_floor note (a launch-count story, not a compute or
        # wire one).
        P, fx, fy = dip.signal.psd2d(field2d)
        ac, xl, yl = dip.signal.autocorr2d(field2d)
        rb, _ = dip.maths.radial_mean_binned(ac)
        ri, _ = dip.maths.radial_mean_interpolated(ac)
        np.asarray(rb); np.asarray(ri)

    out["C_device_resident_2k"] = _timeit(_cold(config_c_device))

    T = stack.shape[0]

    def config_c_series():
        # the realistic scan-series usage of the quick-look: per-frame
        # radial curves of the whole stack through ONE chunked program
        # chain (prefetch-overlapped uploads; the per-frame maps never
        # materialize) — the fixed dispatch tax amortizes over T frames
        dip.signal.spectral_summary_stack(stack, frame_chunk=8)

    out["C_scan_series_per_frame"] = _timeit(
        _cold(config_c_series), repeats=2) / T

    import jax as _jax
    import jax.numpy as _jnp

    dev_stack_c = _jnp.asarray(stack)
    _jax.device_get(_jax.jit(_jnp.sum)(dev_stack_c))  # force residency

    def config_c_series_resident():
        # serving pattern: frames already chip-resident (produced by an
        # on-device preprocessing chain) — pure compute + curve pulls
        dip.signal.spectral_summary_stack(dev_stack_c, frame_chunk=8)

    out["C_series_resident_per_frame"] = _timeit(
        config_c_series_resident, repeats=2) / T
    del dev_stack_c

    def config_d():
        dip.speckle_stack_stats(
            stack, metrics="all", tiles=True, tracking_backend="opencv",
            verbose=False, frame_chunk=4,
        )

    out["D_stack_pipeline_per_frame"] = _timeit(_cold(config_d), repeats=2) / T

    def config_d_resident():
        # serving pattern for stacks: frames already chip-resident (e.g.
        # produced by an on-device preprocessing chain, or re-analyzed with
        # different parameters) — takes the few-dispatch superchunk path
        # (metrics lax.map + tracking lax.scan, stack_fused._run_resident_stack)
        # instead of the upload-overlapped chunk loop
        dip.speckle_stack_stats(
            dev_stack, metrics="all", tiles=True, tracking_backend="opencv",
            verbose=False, frame_chunk=4,
        )

    import jax
    import jax.numpy as jnp

    dev_stack = jnp.asarray(stack)
    jax.device_get(jax.jit(jnp.sum)(dev_stack))  # force residency (deferred puts)
    out["D_stack_resident_per_frame"] = _timeit(config_d_resident, repeats=2) / T
    del dev_stack

    flat = _make_flat(field2d.shape)

    def config_e_parity():
        # like-for-like with the CPU baseline (which cannot run skimage
        # deconvolution here): flat-field -> stats -> report
        corrected = flat_field_correction(field2d.astype(np.float32), flats=flat)
        stats = dip.speckle_stats(corrected, metrics=("amplitude", "grain", "stats"), verbose=False)
        dip.logbook_report(stats)

    out["E_preprocess_report_2k"] = _timeit(_cold(config_e_parity), repeats=2)

    def config_e_full():
        corrected = flat_field_correction(field2d.astype(np.float32), flats=flat)
        deconvolved = deconvolve_psf(corrected, sigma=1.5, method="wiener")
        stats = dip.speckle_stats(deconvolved, metrics=("amplitude", "grain", "stats"), verbose=False)
        dip.logbook_report(stats)

    out["E_full_with_deconv_2k"] = _timeit(_cold(config_e_full), repeats=2)

    def config_e_chained():
        # device-resident chaining: the raw uint16 frame uploads once (half
        # the bytes of float32), then flat-field -> metrics stay on-chip
        # (device in -> device out is the default residence rule)
        import jax.numpy as jnp

        dev = jnp.asarray(field2d)  # uint16 on the wire
        corrected = flat_field_correction(dev.astype(jnp.float32), flats=flat)
        stats = dip.speckle_stats(
            corrected, metrics=("amplitude", "grain", "stats"), verbose=False
        )
        dip.logbook_report(stats)

    out["E_device_chained_2k"] = _timeit(_cold(config_e_chained), repeats=2)

    def config_e_full_chained():
        # full preprocessing chain on-chip: flat-field -> Wiener deconvolve
        # -> metrics, one upload, scalar-only downlink
        import jax.numpy as jnp

        dev = jnp.asarray(field2d)
        corrected = flat_field_correction(dev.astype(jnp.float32), flats=flat)
        deconvolved = deconvolve_psf(corrected, sigma=1.5, method="wiener")
        stats = dip.speckle_stats(
            deconvolved, metrics=("amplitude", "grain", "stats"), verbose=False
        )
        dip.logbook_report(stats)

    out["E_full_chained_2k"] = _timeit(_cold(config_e_full_chained), repeats=2)

    def config_e_serving():
        # production serving pattern: many frames, ONE calibration flat —
        # the flat rides the content-addressed device cache across frames
        # (not cleared here, by design); every frame still ships
        import jax.numpy as jnp

        dev = jnp.asarray(field2d)  # uint16 on the wire, every frame
        corrected = flat_field_correction(dev.astype(jnp.float32), flats=flat)
        stats = dip.speckle_stats(
            corrected, metrics=("amplitude", "grain", "stats"), verbose=False
        )
        dip.logbook_report(stats)

    _uc.cache_clear()
    out["E_warm_calibration_2k"] = _timeit(config_e_serving, repeats=2)

    def config_f():
        # extension workload: dense XST displacement field (Pallas kernel)
        dip.signal.track_displacement_field(
            stack[1], field2d, tile_size=33, step=16, search_radius=10
        )

    out["F_xst_dense_track_2k"] = _timeit(_cold(config_f), repeats=2)
    return out


def bench_cpu(field2d, stack):
    sys.path.insert(0, "/root/reference/src")
    import barc4dip as ref

    out = {}
    f64 = field2d.astype(np.float64)

    out["A_sharpness_stats_2k"] = _timeit(
        lambda: ref.logbook_report(ref.sharpness_stats(f64, verbose=False)), repeats=1, warmup=False
    )
    out["B_speckle_stats_2k"] = _timeit(
        lambda: ref.speckle_stats(f64, metrics="all", tiles=True, verbose=False),
        repeats=1, warmup=False,
    )

    def config_c():
        P, fx, fy = ref.signal.psd2d(f64)
        ac, xl, yl = ref.signal.autocorr2d(f64)
        ref.maths.radial.radial_mean_binned(ac)
        ref.maths.radial.radial_mean_interpolated(ac)

    out["C_fourier_radial_2k"] = _timeit(config_c, repeats=1, warmup=False)

    cpu_T = min(2, stack.shape[0])
    def config_d():
        ref.speckle_stack_stats(
            stack[:cpu_T], metrics="all", tiles=True, tracking_backend="opencv",
            verbose=False, parallel=True, n_jobs=-1,
        )

    out["D_stack_pipeline_per_frame"] = _timeit(config_d, repeats=1, warmup=False) / cpu_T

    flat = _make_flat(field2d.shape)
    # reference deconvolution requires scikit-image (absent here); Config E
    # baseline covers flat-field + stats + report only; noted in output.
    def config_e():
        corrected = ref.preprocessing.flat_field_correction(
            field2d.astype(np.float32), flats=flat
        )
        stats = ref.speckle_stats(
            corrected, metrics=("amplitude", "grain", "stats"), verbose=False
        )
        ref.logbook_report(stats)

    out["E_preprocess_report_2k"] = _timeit(config_e, repeats=2, warmup=False)

    def _numpy_wiener_deconv(img, sigma=1.5, balance=0.01):
        """CPU proxy for the reference's skimage.restoration.wiener chain
        (reference preprocessing/filters.py:233-289): Gaussian PSF
        odd(max(5, ceil(6*sigma))), reflect pad by the half kernel,
        max-normalise, Wiener-Hunt with Laplacian regularisation, rescale,
        crop. scikit-image is not installed in this environment, so this
        float64 NumPy equivalent of the identical closed form anchors the
        E_full_with_deconv comparison (noted in output)."""
        k = int(np.ceil(6.0 * sigma))
        k = max(5, k) | 1
        ax = np.arange(k) - (k - 1) / 2.0
        psf = np.exp(-0.5 * ((ax[:, None] / sigma) ** 2 + (ax[None, :] / sigma) ** 2))
        psf /= psf.sum()
        h = k // 2
        padded = np.pad(img.astype(np.float64), h, mode="reflect")
        scale = np.nanmax(np.abs(padded)) or 1.0
        work = padded / scale
        shape = work.shape
        ir = np.zeros(shape)
        ir[:k, :k] = psf
        ir = np.roll(ir, (-h, -h), axis=(0, 1))
        H = np.fft.rfft2(ir)
        lap = np.zeros(shape)
        lap[:3, :3] = [[0, -1, 0], [-1, 4, -1], [0, -1, 0]]
        lap = np.roll(lap, (-1, -1), axis=(0, 1))
        L = np.fft.rfft2(lap)
        Y = np.fft.rfft2(work)
        x = np.fft.irfft2(np.conj(H) * Y / (np.abs(H) ** 2 + balance * np.abs(L) ** 2),
                          s=shape)
        x = np.clip(x, -1.0, 1.0) * scale
        return x[h : h + img.shape[0], h : h + img.shape[1]]

    def config_e_full():
        corrected = ref.preprocessing.flat_field_correction(
            field2d.astype(np.float32), flats=flat
        )
        deconvolved = _numpy_wiener_deconv(corrected, sigma=1.5)
        stats = ref.speckle_stats(
            deconvolved, metrics=("amplitude", "grain", "stats"), verbose=False
        )
        ref.logbook_report(stats)

    out["E_full_with_deconv_2k"] = _timeit(config_e_full, repeats=1, warmup=False)

    def config_f():
        # no reference counterpart (extension): an equivalent, well-
        # vectorised NumPy implementation of the same dense windowed ZNCC
        # (batched rfft2 numerator + cumsum integral-image window sums)
        img = field2d.astype(np.float64)
        ref_img = stack[1].astype(np.float64)
        s, r, step = 33, 10, 16
        w = s + 2 * r
        y0s = np.arange(r, SIDE - s - r + 1, step)
        x0s = y0s
        ty = y0s[:, None] + np.arange(s)
        wy = y0s[:, None] - r + np.arange(w)
        tiles = ref_img[ty[:, None, :, None], ty[None, :, None, :]]
        wins = img[wy[:, None, :, None], wy[None, :, None, :]]
        N = len(y0s) * len(x0s)
        t = tiles.reshape(N, s, s)
        t = t - t.mean(axis=(1, 2), keepdims=True)
        energy = np.sum(t * t, axis=(1, 2))
        win = wins.reshape(N, w, w)
        Ft = np.fft.rfft2(t, s=(w, w))
        num = np.fft.irfft2(np.fft.rfft2(win) * np.conj(Ft), s=(w, w))[
            :, : 2 * r + 1, : 2 * r + 1
        ]
        ii = np.pad(np.cumsum(np.cumsum(win, axis=1), axis=2), ((0, 0), (1, 0), (1, 0)))
        s1 = ii[:, s:, s:] - ii[:, :-s, s:] - ii[:, s:, :-s] + ii[:, :-s, :-s]
        ii2 = np.pad(np.cumsum(np.cumsum(win * win, axis=1), axis=2), ((0, 0), (1, 0), (1, 0)))
        s2 = ii2[:, s:, s:] - ii2[:, :-s, s:] - ii2[:, s:, :-s] + ii2[:, :-s, :-s]
        var = np.maximum(s2 - s1 * s1 / (s * s), 0.0)
        corr = num / np.sqrt(var * energy[:, None, None] + 1e-9)
        k = corr.reshape(N, -1).argmax(axis=1)
        return k

    out["F_xst_dense_track_2k"] = _timeit(config_f, repeats=1, warmup=False)
    return out


def measure_dispatch_floor_ms(n: int = 10) -> float:
    """Measured serialized per-dispatch wall-clock floor of the backend: a
    trivial cached program executed n times, each forced by a scalar pull
    (block_until_ready does not force execution on this backend —
    docs/AXON_BACKEND_NOTES.md §3). This is the launch tax every COMPOSED
    public-call chain pays per call, and what fused one-program front
    doors exist to avoid."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x.sum())
    x = jnp.ones((128, 128), jnp.float32)
    float(f(x))  # compile + claim
    t0 = time.perf_counter()
    for _ in range(n):
        float(f(x))
    return (time.perf_counter() - t0) / n * 1e3


def _c_floor_note(results: dict) -> str:
    """The quantified launch-floor argument for Config C (VERDICT r4 item
    4, the Config-E treatment): the single-frame quick-look is bound by
    one frame upload + program round trips, so model each variant as
    upload + N round trips x the measured dispatch floor and compare."""
    link = results.get("link") or {}
    up = link.get("up_MBps")
    disp_ms = results.get("dispatch_floor_ms")
    if not up or not disp_ms:
        return "link/dispatch probe unavailable; C floor not computed"
    tpu = results["tpu_seconds"]
    frame_mb = SIDE * SIDE * 2 / 1e6  # uint16 frame on the wire
    up_s = frame_mb / up
    d = disp_ms / 1e3

    def model(n_rt):
        return up_s + n_rt * d

    front = tpu.get("C_fourier_radial_2k")
    composed = tpu.get("C_device_resident_2k")
    cpu_c = (results.get("cpu_seconds") or {}).get("C_fourier_radial_2k")
    lines = [
        f"Single-frame quick-look floor arithmetic at this sweep's link "
        f"(up {up:.1f} MB/s, measured dispatch floor {disp_ms:.0f} ms): "
        f"frame upload {up_s:.2f} s.",
        f"Front door (1 program + 2 curve pulls = 3 round trips): modeled "
        f"{model(3):.2f} s vs {front:.2f} s measured." if front else "",
        f"Composed device-consumed chain (4 programs + 2 pulls = 6 round "
        f"trips): modeled {model(6):.2f} s vs {composed:.2f} s measured — "
        f"the composed variant losing to the front door is the launch "
        f"tax, by construction." if composed else "",
    ]
    if cpu_c and front:
        cap = cpu_c / up_s
        lines.append(
            f"Upper bound for ANY single-frame numpy-in variant at this "
            f"link: CPU {cpu_c:.2f} s / upload floor {up_s:.2f} s = "
            f"{cap:.1f}x — the 10x bar is unreachable for ANY numpy-in "
            f"form at this wire (C_scan_series_per_frame amortizes the "
            f"dispatch tax but pays the same per-frame upload, landing at "
            f"~the same cap); C_series_resident_per_frame is the "
            f"production shape that escapes the wire entirely (pure "
            f"device compute + curve pulls)."
        )
    return " ".join(s for s in lines if s)


def _wire_floor_note(results: dict) -> str:
    """The quantified roofline argument for the cold numpy-in/numpy-out
    Config E chain (VERDICT r3 item 4): bytes moved x measured wire = the
    floor no code change can beat while honouring the numpy-out contract."""
    link = results.get("link") or {}
    up, down = link.get("up_MBps"), link.get("down_MBps")
    if not up or not down:
        return "link probe unavailable; wire floor not computed this sweep"
    frame_mb = SIDE * SIDE * 4 / 1e6  # 2048^2 float32 = 16.78 MB
    floor_s = 2 * frame_mb / up + frame_mb / down
    meas = results["tpu_seconds"].get("E_preprocess_report_2k")
    pct = 100.0 * floor_s / meas if meas else float("nan")
    verdict = (
        "the measured time is AT or BELOW the serial wire floor — fully "
        "wire-bound, transfers overlapping compute"
        if pct >= 95.0
        else f"wire explains {pct:.0f}% of the runtime"
    )
    full_meas = results["tpu_seconds"].get("E_full_with_deconv_2k")
    cpu_full = (results.get("cpu_seconds") or {}).get("E_full_with_deconv_2k")
    full_note = ""
    if full_meas and cpu_full:
        # same bytes as the preprocess chain (the deconvolved frame rides
        # down instead of the corrected one); the deconvolution adds only
        # device FFT time, not wire
        cap = cpu_full / floor_s
        full_note = (
            f" E_full_with_deconv_2k moves the same {3 * frame_mb:.1f} MB, "
            f"so its numpy-out speedup is capped at CPU {cpu_full:.2f} s / "
            f"floor {floor_s:.2f} s = {cap:.1f}x at this link — a 10x bar "
            f"is unreachable for ANY numpy-out deconvolution chain on this "
            f"wire; E_full_chained_2k (one u16 upload, scalar-only "
            f"downlink) is the documented escape."
        )
    return (
        f"E_preprocess_report_2k (cold, numpy in -> numpy out) moves "
        f"{3 * frame_mb:.1f} MB: up frame f32 + up flat f32 ({2 * frame_mb:.1f} MB), "
        f"down corrected f32 ({frame_mb:.1f} MB). The zeros-dark upload and the "
        f"corrected-frame re-upload are eliminated (scalar dark broadcast; "
        f"register_pair redeems the device copy in speckle_stats). At the "
        f"link measured THIS sweep (up {up:.1f} / down {down:.1f} MB/s) the "
        f"serial wire floor is {floor_s:.2f} s vs {meas:.2f} s measured "
        f"({pct:.0f}%): {verdict}. Residual budget: device compute ~0.05 s "
        f"+ report formatting. Device-resident variants (E_device_chained_2k, "
        f"E_warm_calibration_2k) are the documented escape from this floor."
        + full_note
    )


def main() -> int:
    skip_cpu = "--skip-cpu" in sys.argv

    stack = make_stack(8, SIDE)
    field2d = stack[0]

    results = {"frame": f"{SIDE}x{SIDE}", "dtype": "uint16"}
    from bench import measure_link_mbps

    try:
        results["link"] = measure_link_mbps()
    except Exception as exc:  # probe is context, not a measurement
        print(f"# link probe failed: {exc!r}", file=sys.stderr)
        results["link"] = None
    try:
        results["dispatch_floor_ms"] = round(measure_dispatch_floor_ms(), 1)
    except Exception as exc:
        print(f"# dispatch floor probe failed: {exc!r}", file=sys.stderr)
        results["dispatch_floor_ms"] = None
    results["tpu_seconds"] = bench_tpu(field2d, stack)
    if skip_cpu:
        # reuse the previous sweep's CPU baseline (the reference's CPU time
        # does not change run to run the way the hosted TPU tunnel does)
        prev = REPO / "BENCH_DETAILS.json"
        if prev.exists():
            try:
                cached = json.loads(prev.read_text()).get("cpu_seconds")
                if cached:
                    results["cpu_seconds"] = cached
                    results["cpu_baseline"] = "cached from previous sweep"
                    skip_cpu = False  # compute speedups below
            except Exception:
                pass
    if not skip_cpu and "cpu_seconds" not in results:
        results["cpu_seconds"] = bench_cpu(field2d, stack)
    if "cpu_seconds" in results:
        results["speedup"] = {
            k: round(results["cpu_seconds"][k] / v, 2)
            for k, v in results["tpu_seconds"].items()
            if k in results["cpu_seconds"] and v > 0
        }
        # variants without a same-named CPU run compare against the CPU
        # config doing the same-or-less work
        for tpu_key, cpu_key in (
            ("E_device_chained_2k", "E_preprocess_report_2k"),
            ("E_full_chained_2k", "E_preprocess_report_2k"),
            ("E_warm_calibration_2k", "E_preprocess_report_2k"),
            ("C_composed_pull_2k", "C_fourier_radial_2k"),
            ("C_quantized_pull_2k", "C_fourier_radial_2k"),
            ("C_device_resident_2k", "C_fourier_radial_2k"),
            ("C_scan_series_per_frame", "C_fourier_radial_2k"),
            ("C_series_resident_per_frame", "C_fourier_radial_2k"),
            ("D_stack_resident_per_frame", "D_stack_pipeline_per_frame"),
        ):
            if tpu_key in results["tpu_seconds"] and cpu_key in results["cpu_seconds"]:
                results["speedup"][tpu_key] = round(
                    results["cpu_seconds"][cpu_key]
                    / results["tpu_seconds"][tpu_key],
                    2,
                )
        results["notes"] = {
            "C": "C_fourier_radial_2k is the documented front door "
                 "(signal.spectral_summary, examples/ex_03): radial curves "
                 "host-side, maps device-resident like every lazy stats "
                 "leaf. C_composed_pull_2k is the reference's literal "
                 "composition with both full maps pulled (wire-bound). "
                 "C_scan_series_per_frame / C_series_resident_per_frame "
                 "are the scan-series forms (spectral_summary_stack): "
                 "per-frame radial curves of a whole stack through one "
                 "chunked program chain, numpy-in and device-resident "
                 "respectively. All C variants compare against the CPU "
                 "composed run per frame (the reference's only "
                 "formulation).",
            "E": "E_preprocess_report_2k is like-for-like without "
                 "deconvolution; E_full_with_deconv_2k compares the full "
                 "chain, with the CPU side's skimage wiener (absent in this "
                 "environment) replaced by a documented float64 NumPy "
                 "equivalent of the same closed form. "
                 "E_warm_calibration_2k is the serving pattern: many "
                 "frames, one cached calibration flat.",
            "C_dispatch_floor": _c_floor_note(results),
            "E_wire_floor": _wire_floor_note(results),
            "F": "extension workload (no reference counterpart): dense XST "
                 "displacement field, 15.6k windowed ZNCCs at 2048². CPU "
                 "side is an equivalent vectorised NumPy implementation "
                 "(batched FFT numerator + integral-image sums, argmax "
                 "only); TPU side includes subpixel refinement.",
        }

    (REPO / "BENCH_DETAILS.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
