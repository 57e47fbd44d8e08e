# SPDX-License-Identifier: CECILL-2.1
"""Repro §3: vmapping the 18-correlation tracker over MORE than 4 frames of
2048x2048 in one executable silently corrupts the shift outputs on the
hosted axon TPU backend; 4-frame programs are repeatedly clean, and the CPU
backend is clean at any width.  Same buffer-assignment bug family as the
metrics+tracking fusion (fused_tracking.py).

Two variants, both on frames shifted by known offsets (np.roll):

- ``simplified``: a self-contained NCC-argmax tracker (no subpixel, no
  z-scored prep, plain vmap).  Measured 2026-08-16: does NOT trigger the
  bug on the current backend — kept because it bounds the trigger from
  below (the plain FFT-correlation core is fine at any width).
- ``package`` (default): the production tracker program
  (barc4dip_tpu.metrics.stack_fused._track_chunk_program — z-scored
  integral-image NCC prep, in-program frame-0 template bank, Newton
  subpixel) jitted at width 4 (two sub-programs) vs width 8 (one program).
  Measured 2026-08-16: PASSES standalone on fresh float32 inputs
  (0.007 px at width 8) — yet the SAME program at width 8 inside the full
  pipeline (uint16 chunk shared with the metrics executable,
  device-resident prev tail) corrupts shifts by ~318 px.  The
  authoritative in-context repro is therefore: set
  ``barc4dip_tpu.metrics.stack_fused._TRACK_SUB = 8`` and run
  ``python bench.py`` (gate reads ~317 px; =4 reads 0.0125 px).

Expected: both variants PASS standalone on CPU and (as of 2026-08-16)
on axon; the pipeline-context A/B above still FAILs on axon.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

SIDE = 2048
ROI = 41


def window_sums(image, h, w):
    ii = jnp.cumsum(jnp.cumsum(image, axis=-2), axis=-1)
    ii = jnp.pad(ii, ((1, 0), (1, 0)))
    return ii[h:, w:] - ii[:-h, w:] - ii[h:, :-w] + ii[:-h, :-w]


def build(H, W, s, starts):
    def track_frame(img, prev, tF0, tE0):
        """abs (frame-0 bank) + inc (frame t-1 tiles): 18 correlations."""
        F = jnp.fft.rfft2(img)
        s1 = window_sums(img, s, s)
        var = jnp.maximum(window_sums(img * img, s, s) - s1 * s1 / (s * s), 0.0)

        def corr_peak(Ft, en):
            corr = jnp.fft.irfft2(F * jnp.conj(Ft), s=(H, W))
            corr = corr[: H - s + 1, : W - s + 1] / jnp.sqrt(var * en + 1e-9)
            k = jnp.argmax(corr)
            return k // (W - s + 1), k % (W - s + 1)

        tiles_p = jnp.stack([prev[y0 : y0 + s, x0 : x0 + s] for y0, x0 in starts])
        tp = tiles_p - tiles_p.mean(axis=(-2, -1), keepdims=True)
        Fp = jnp.fft.rfft2(jnp.pad(tp, ((0, 0), (0, H - s), (0, W - s))))
        Ep = jnp.sum(tp * tp, axis=(-2, -1))

        ya, xa = jax.vmap(corr_peak)(tF0, tE0)
        yi, xi = jax.vmap(corr_peak)(Fp, Ep)
        return ya, xa, yi, xi

    def prep0(frame0):
        tiles = jnp.stack([frame0[y0 : y0 + s, x0 : x0 + s] for y0, x0 in starts])
        t = tiles - tiles.mean(axis=(-2, -1), keepdims=True)
        return (
            jnp.fft.rfft2(jnp.pad(t, ((0, 0), (0, H - s), (0, W - s)))),
            jnp.sum(t * t, axis=(-2, -1)),
        )

    @jax.jit
    def chunk(frames, prevs, frame0):
        tF0, tE0 = prep0(frame0)
        return jax.vmap(lambda im, pr: track_frame(im, pr, tF0, tE0))(
            frames, prevs
        )

    return chunk


def _make_frames():
    rng = np.random.default_rng(0)
    base = rng.normal(size=(SIDE, SIDE)).astype(np.float32)
    shifts = [(0, 0), (2, -1), (-3, 2), (5, 0), (-1, -4), (4, 3), (0, 6), (-6, -2)]
    frames = np.stack([np.roll(base, sh, axis=(0, 1)) for sh in shifts]).astype(
        np.float32
    )
    prevs = np.concatenate([frames[:1], frames[:-1]], axis=0)
    return frames, prevs, shifts


def run_simplified() -> int:
    H = W = SIDE
    s = ROI
    frames, prevs, shifts = _make_frames()
    g = H // 2 - s // 2
    starts = [(g + dy * s, g + dx * s) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    chunk = build(H, W, s, starts)

    f0 = jnp.asarray(frames[0])
    outs4 = [
        jax.device_get(chunk(jnp.asarray(frames[k : k + 4]), jnp.asarray(prevs[k : k + 4]), f0))
        for k in (0, 4)
    ]
    ya4 = np.concatenate([o[0] for o in outs4])
    xa4 = np.concatenate([o[1] for o in outs4])
    ya8, xa8, yi8, xi8 = jax.device_get(
        chunk(jnp.asarray(frames), jnp.asarray(prevs), f0)
    )

    want_y = np.asarray([[y0 + sh[0] for y0, _ in starts] for sh in shifts])
    want_x = np.asarray([[x0 + sh[1] for _, x0 in starts] for sh in shifts])
    err4 = max(np.abs(ya4 - want_y).max(), np.abs(xa4 - want_x).max())
    err8 = max(np.abs(ya8 - want_y).max(), np.abs(xa8 - want_x).max())
    print(f"[simplified] width-4 sub-programs: max |abs-shift err| = {err4:.1f} px")
    print(f"[simplified] width-8 one program:  max |abs-shift err| = {err8:.1f} px")
    ok = err4 == 0 and err8 == 0
    print("PASS" if ok else "FAIL: >4-frame tracker executable corrupts shifts")
    return 0 if ok else 1


def run_package() -> int:
    """Drive the production tracker program at width 4 vs width 8."""
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[2]))
    from barc4dip_tpu.metrics.stack_fused import _track_chunk_program

    H = W = SIDE
    s = ROI
    frames, prevs, shifts = _make_frames()
    g = H // 2 - s // 2
    starts_key = tuple(
        int(v)
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
        for v in (g + dy * s, g + dx * s)
    )
    prog = _track_chunk_program("template", True, H, W, s, starts_key)
    f0 = jnp.asarray(frames[0])
    eps = jnp.asarray(1e-9, jnp.float32)

    def widths(ws):
        dys, dxs = [], []
        for k in range(0, 8, ws):
            out, _tail = prog(
                jnp.asarray(frames[k : k + ws]), jnp.asarray(prevs[k]), f0, eps
            )
            out = jax.device_get(out)
            dys.append(out["dy_a"])
            dxs.append(out["dx_a"])
        return np.concatenate(dys), np.concatenate(dxs)

    want_y = np.asarray([[sh[0]] * 9 for sh in shifts], np.float64)
    want_x = np.asarray([[sh[1]] * 9 for sh in shifts], np.float64)
    errs = {}
    for ws in (4, 8):
        dy, dx = widths(ws)
        errs[ws] = max(
            np.abs(dy - want_y).max(), np.abs(dx - want_x).max()
        )
        print(f"[package] width-{ws}: max |abs-shift err| = {errs[ws]:.4f} px")
    ok = errs[4] < 0.05 and errs[8] < 0.05
    print("PASS" if ok else "FAIL: >4-frame tracker executable corrupts shifts")
    return 0 if ok else 1


if __name__ == "__main__":
    if "--simplified" in sys.argv:
        print(f"backend: {jax.devices()[0].platform} ({jax.devices()[0]})")
        sys.exit(run_simplified())
    print(f"backend: {jax.devices()[0].platform} ({jax.devices()[0]})")
    sys.exit(run_package())
