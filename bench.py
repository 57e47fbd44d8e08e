#!/usr/bin/env python
# SPDX-License-Identifier: CECILL-2.1
"""North-star benchmark: full speckle-stack pipeline throughput per chip.

Config D (SURVEY §6): ``speckle_stack_stats`` over a synthetic detector
stack — per-frame speckle metrics (all groups, full + tiles) plus abs/inc
translation tracking. The same call is measured on the CPU reference
(mounted at /root/reference, tracking backend "opencv") to produce
``vs_baseline``; the CPU number is cached in .bench_baseline.json because it
is orders of magnitude slower.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "MP/s/chip", "vs_baseline": N}

Environment knobs: BENCH_T (TPU frames, default 16), BENCH_SIZE (frame side,
default 2048), BENCH_CHUNK (frames per device chunk, default 4 — the
measured optimum with prefetch-overlapped uploads), BENCH_CPU_T (baseline
frames, default 2), BENCH_FORCE_BASELINE=1 re-measures the CPU baseline.

The run FAILS (exit 1, "gate_failed": true in the JSON) when the tracking
error against the known synthetic motion exceeds 0.05 px — a throughput
number from numerically wrong hardware output must not read as a win.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
BASELINE_CACHE = REPO / ".bench_baseline.json"


def make_stack(T: int, side: int, grain_px: float = 8.0) -> np.ndarray:
    """Synthetic speckle stack with spiral motion (ex_04-style workload).

    Detector-realistic uint16 counts (what beamline cameras emit); both
    implementations cast to float internally, and the TPU path ships half
    the bytes per frame over the host->device link. Same generator as the
    public ``barc4dip_tpu.utils.speckle_stack`` (fixed seed: the cached
    CPU baseline is keyed to this data).
    """
    from barc4dip_tpu.utils import speckle_stack

    return speckle_stack(
        T, (side, side), grain_px=grain_px, mean_counts=8000.0,
        seed=np.random.default_rng(1234), dtype=np.uint16,
    )


def measure_link_mbps(nbytes: int = 8 << 20, down_nbytes: int = 2 << 20) -> dict:
    """Measure effective host<->device link bandwidth (MB/s, one round).

    The hosted chip's HTTP tunnel fluctuates run to run (observed 10-50
    MB/s); reporting it alongside throughput makes vs_baseline swings
    attributable to link state rather than code.

    Transfers on this backend are DEFERRED: ``device_put`` (and even
    ``block_until_ready`` on an idle device) can return before the bytes
    moved, so a naive probe reads 200+ MB/s while the pipeline's true wire
    rate is ~40-50 MB/s. The probe therefore times upload-until-CONSUMED
    (a jitted sum whose result is pulled forces residency; the sum itself
    is sub-ms). The downlink probe uses a small buffer on purpose: the
    link has been seen collapsed to ~0.1 MB/s, where an 8 MB probe would
    stall the benchmark for minutes (and the pipeline itself no longer
    pulls anything big)."""
    import jax
    import jax.numpy as jnp

    consume = jax.jit(lambda x: x.astype(jnp.uint32).sum())
    # incompressible payload: an all-zeros buffer would let any compression
    # in the HTTP tunnel report fantasy bandwidth vs the real speckle data
    buf = np.random.default_rng(0).integers(0, 256, nbytes).astype(np.uint8)
    float(consume(jnp.asarray(buf)))  # warm: wire + compile at probe shape
    t0 = time.perf_counter()
    dev = jnp.asarray(buf)
    float(consume(dev))
    up = nbytes / (time.perf_counter() - t0) / 1e6

    small = jnp.asarray(buf[:down_nbytes])
    float(consume(small))  # ensure the buffer is genuinely device-resident
    t0 = time.perf_counter()
    np.asarray(small)
    down = down_nbytes / (time.perf_counter() - t0) / 1e6
    return {"up_MBps": round(up, 1), "down_MBps": round(down, 1)}


def run_pipeline_tpu(
    stack: np.ndarray, frame_chunk: int
) -> tuple[float, float, dict]:
    """Run the full pipeline; returns (elapsed seconds post-warmup,
    max tracking error in px vs the known synthetic motion, per-stage
    attribution of where the wall-clock went)."""
    import barc4dip_tpu as dip
    from barc4dip_tpu.metrics import stack_fused

    kwargs = dict(
        metrics="all",
        tiles=True,
        tracking_method="template",
        tracking_backend="opencv",
        verbose=False,
        frame_chunk=frame_chunk,
    )

    # Warmup on a ramp-triggering slice: compiles every program shape the
    # real run uses — the ramped schedule adds 2-frame chunk programs on
    # top of the frame_chunk-wide ones (the tracking ROI derives from
    # frame-0 grain, so shapes match the real run). When the real run
    # cannot ramp (T <= 2*frame_chunk) one chunk suffices.
    T_all = stack.shape[0]
    if T_all > 2 * frame_chunk:
        warm_T = min(T_all, 2 * frame_chunk + 1)
    else:
        warm_T = min(T_all, max(2, frame_chunk))
    dip.speckle_stack_stats(stack[:warm_T], **kwargs)

    # best of two timed runs: a few seconds each now, and the shared
    # host/tunnel can hiccup mid-run — one retry de-noises the record
    elapsed = np.inf
    perf: dict = {}
    for _ in range(2):
        t0 = time.perf_counter()
        out = dip.speckle_stack_stats(stack, **kwargs)
        dt = time.perf_counter() - t0
        if dt < elapsed:
            # Per-stage attribution of the best run (upload / dispatch /
            # wait): makes a throughput swing self-explaining.
            elapsed = dt
            perf = dict(stack_fused.LAST_RUN_PERF)
    stages = {
        "upload_s": round(perf.get("upload_s", 0.0), 3),
        "upload_io_s": round(perf.get("upload_io_s", 0.0), 3),
        "dispatch_s": round(perf.get("dispatch_s", 0.0), 3),
        "pull_wait_s": round(perf.get("pull_wait_s", 0.0), 3),
        "other_s": round(
            elapsed
            - perf.get("upload_s", 0.0)
            - perf.get("dispatch_s", 0.0)
            - perf.get("pull_wait_s", 0.0),
            3,
        ),
        "upload_MB": round(perf.get("upload_bytes", 0) / 1e6, 1),
        "pull_MB": round(perf.get("pull_bytes", 0) / 1e6, 3),
    }
    if perf.get("upload_io_s"):
        stages["upload_eff_MBps"] = round(
            perf["upload_bytes"] / 1e6 / perf["upload_io_s"], 1
        )
    # JAX dispatch is asynchronous: upload_s/dispatch_s measure the
    # (mostly synchronous-transfer) enqueue side, while device COMPUTE time
    # is realised inside pull_wait_s when results are fetched. The split
    # distinguishes link-bound (upload_s or upload_eff_MBps collapse) from
    # compute-bound (pull_wait_s dominates with tiny pull_MB) regimes.
    stages["note"] = (
        "pull_wait_s includes device compute (async dispatch); upload_s is "
        "the residual blocking wait (transfers run on a prefetch thread, "
        "actual wire time = upload_io_s)"
    )

    # hardware-level correctness gate: the synthetic stack's motion is known
    T = stack.shape[0]
    ts = np.arange(T)
    dys = 0.35 * ts * np.cos(ts * 0.7)
    dxs = 0.35 * ts * np.sin(ts * 0.7)
    err = np.hypot(
        out["temporal"]["abs"]["dy"] - dys, out["temporal"]["abs"]["dx"] - dxs
    )
    return elapsed, float(np.nanmax(err)), stages


def measure_device_compute(stack: np.ndarray, frame_chunk: int) -> dict | None:
    """Wire-independent device-compute throughput of the fused programs
    (frames pre-uploaded): what the chip could sustain on a healthy link.
    Best-effort — the headline metric never depends on it."""
    try:
        from barc4dip_tpu.metrics.common import choose_tiling_mode, normalize_groups
        from barc4dip_tpu.metrics.speckles import (
            _ALL_SPECKLE_GROUPS,
            tracking_grid_from_frame0,
        )
        from barc4dip_tpu.metrics.stack_fused import device_compute_probe

        T, H, W = stack.shape
        groups = normalize_groups(
            "all", all_groups=_ALL_SPECKLE_GROUPS, context="speckles",
            param_name="metrics",
        )
        mode, _ = choose_tiling_mode(H, W, tiles=True, min_tile_px=128)
        grid_slices, _labels, _roi, _step, _g0 = tracking_grid_from_frame0(stack)
        probe = device_compute_probe(
            stack, grid_slices, groups=groups, mode=mode, sat=65535.0,
            eps=1e-6, flip=True, method="template", subpixel=True,
            frame_chunk=frame_chunk,
        )
        return {
            "compute_mpix_s": round(probe["mpix_s"], 2),
            "compute_s_total": round(probe["elapsed_s"], 3),
            "metrics_only_s": round(probe["metrics_only_s"], 3),
            "tracking_only_s": round(probe["tracking_only_s"], 3),
            "note": "frames pre-uploaded; fused metrics+tracking programs "
                    "+ scalar pulls only (the wire-independent chip rate)",
        }
    except Exception as exc:  # pragma: no cover - probe must never gate
        print(f"# device-compute probe failed: {exc!r}", file=sys.stderr)
        return None


def measure_cpu_baseline(side: int, cpu_T: int) -> float:
    """Per-frame seconds of the reference pipeline on CPU."""
    sys.path.insert(0, "/root/reference/src")
    import barc4dip as ref

    stack = make_stack(cpu_T, side)
    t0 = time.perf_counter()
    ref.speckle_stack_stats(
        stack,
        metrics="all",
        tiles=True,
        tracking_backend="opencv",
        verbose=False,
        parallel=True,
        n_jobs=-1,
    )
    elapsed = time.perf_counter() - t0
    return elapsed / cpu_T


def get_cpu_baseline(side: int, cpu_T: int) -> float | None:
    key = f"{side}x{side}-u16"
    force = os.environ.get("BENCH_FORCE_BASELINE") == "1"
    if BASELINE_CACHE.exists() and not force:
        try:
            cache = json.loads(BASELINE_CACHE.read_text())
            if key in cache:
                return float(cache[key]["sec_per_frame"])
        except Exception:
            pass
    try:
        sec_per_frame = measure_cpu_baseline(side, cpu_T)
    except Exception as exc:  # baseline is best-effort
        print(f"# baseline measurement failed: {exc!r}", file=sys.stderr)
        return None
    cache = {}
    if BASELINE_CACHE.exists():
        try:
            cache = json.loads(BASELINE_CACHE.read_text())
        except Exception:
            cache = {}
    cache[key] = {
        "sec_per_frame": sec_per_frame,
        "frames_measured": cpu_T,
        "backend": "cpu reference (joblib threads, opencv tracking)",
    }
    BASELINE_CACHE.write_text(json.dumps(cache, indent=2))
    return sec_per_frame


def main() -> int:
    T = int(os.environ.get("BENCH_T", 16))
    side = int(os.environ.get("BENCH_SIZE", 2048))
    cpu_T = int(os.environ.get("BENCH_CPU_T", 2))
    # 4-frame chunks measured fastest with prefetch-overlapped uploads
    # (finer chunks overlap transfers with compute better than the launch
    # floor costs); also matches the 4-frame tracker sub-program cap
    # (metrics/stack_fused.py backend note)
    frame_chunk = int(os.environ.get("BENCH_CHUNK", 4))

    stack = make_stack(T, side)

    try:
        link = measure_link_mbps()
    except Exception:  # link probe is best-effort
        link = None
    elapsed, track_err, stages = run_pipeline_tpu(stack, frame_chunk)
    mpix_total = T * side * side / 1e6
    tpu_mpix_s = mpix_total / elapsed
    device_compute = measure_device_compute(stack, frame_chunk)

    cpu_sec_per_frame = get_cpu_baseline(side, cpu_T)
    if cpu_sec_per_frame and cpu_sec_per_frame > 0:
        cpu_mpix_s = (side * side / 1e6) / cpu_sec_per_frame
        vs_baseline = tpu_mpix_s / cpu_mpix_s
    else:
        vs_baseline = float("nan")

    gate_failed = not (track_err <= 0.05)  # NaN also fails
    print(
        json.dumps(
            {
                "metric": "speckle_stack_pipeline_throughput",
                "gate_failed": gate_failed,
                "value": round(tpu_mpix_s, 3),
                "unit": "MP/s/chip",
                "vs_baseline": round(vs_baseline, 3)
                if np.isfinite(vs_baseline)
                else None,
                "detail": {
                    "frames": T,
                    "frame": f"{side}x{side}",
                    "tpu_elapsed_s": round(elapsed, 3),
                    "tpu_ms_per_frame": round(1e3 * elapsed / T, 1),
                    "cpu_ref_s_per_frame": round(cpu_sec_per_frame, 3)
                    if cpu_sec_per_frame
                    else None,
                    "tracking_max_err_px": round(track_err, 4),
                    "stages": stages,
                    "link": link,
                    # upload-wire roofline: with every other stage hidden, the
                    # run cannot beat total_bytes / wire_rate — how close the
                    # pipeline gets tells whether remaining headroom is code
                    # or link
                    "upload_roofline_mpix_s": round(
                        mpix_total / stages["upload_io_s"], 2
                    )
                    if stages.get("upload_io_s")
                    else None,
                    "device_compute": device_compute,
                    "pipeline": "speckle_stack_stats: all metric groups + tiles + abs/inc tracking",
                },
            }
        )
    )
    return 1 if gate_failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
