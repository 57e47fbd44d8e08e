# SPDX-License-Identifier: CECILL-2.1
"""Repro §2: per-frame metrics + a multi-template NCC tracker fused into ONE
jitted program corrupt the tracking outputs on the hosted axon TPU backend,
while the metric outputs stay correct.  Running the SAME two pieces as two
programs over the same device-resident frames is correct; CPU is correct in
both structures.

Self-contained: synthetic speckle frames shifted by known integer offsets
(np.roll) so argmax tracking has an exact ground truth.

Measured 2026-08-16: this SIMPLIFIED fusion passes on the current backend
(the trigger needs more of the production program's structure — z-scored
prep, Newton subpixel, tile bucketing; see wide_tracker.py, whose package
variant still reproduces its sibling bug). Kept as the lower bound of the
trigger; the production pipeline keeps the two-program split, which is
also measured faster on this backend.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

SIDE = 1024
ROI = 33
B = 4  # stay under the separate >4-frame tracker bug (wide_tracker.py)


def window_sums(image, h, w):
    ii = jnp.cumsum(jnp.cumsum(image, axis=-2), axis=-1)
    ii = jnp.pad(ii, ((1, 0), (1, 0)))
    return ii[h:, w:] - ii[:-h, w:] - ii[h:, :-w] + ii[:-h, :-w]


def make_tracker(H, W, s, starts):
    """9-template zero-normalised cross-correlation argmax per frame."""

    def tiles_of(frame):
        return jnp.stack([frame[y0 : y0 + s, x0 : x0 + s] for y0, x0 in starts])

    def track_frame(img, tpl_bank_F, tpl_energy):
        F = jnp.fft.rfft2(img)
        s1 = window_sums(img, s, s)
        var = jnp.maximum(window_sums(img * img, s, s) - s1 * s1 / (s * s), 0.0)

        def one(Ft, en):
            corr = jnp.fft.irfft2(F * jnp.conj(Ft), s=(H, W))
            corr = corr[: H - s + 1, : W - s + 1] / jnp.sqrt(var * en + 1e-9)
            k = jnp.argmax(corr)
            return k // (W - s + 1), k % (W - s + 1)

        py, px = jax.vmap(one)(tpl_bank_F, tpl_energy)
        return py, px

    def prep_templates(frame0):
        tiles = tiles_of(frame0)
        t = tiles - tiles.mean(axis=(-2, -1), keepdims=True)
        pad = jnp.pad(t, ((0, 0), (0, H - s), (0, W - s)))
        return jnp.fft.rfft2(pad), jnp.sum(t * t, axis=(-2, -1))

    return track_frame, prep_templates


def metrics_frame(img):
    """Stand-in per-frame metric body (FFT + reductions, like the real one)."""
    z = img - img.mean()
    psd = jnp.abs(jnp.fft.rfft2(z)) ** 2
    return {
        "mean": img.mean(),
        "std": img.std(),
        "spec_sum": psd.sum(),
        "spec_max": psd.max(),
    }


def main() -> int:
    print(f"backend: {jax.devices()[0].platform} ({jax.devices()[0]})")
    H = W = SIDE
    s = ROI
    rng = np.random.default_rng(0)
    base = rng.normal(size=(H, W)).astype(np.float32)
    shifts = [(0, 0), (3, -2), (-5, 4), (7, 1)][:B]
    frames = np.stack(
        [np.roll(base, sh, axis=(0, 1)) for sh in shifts]
    ).astype(np.float32)

    g = H // 2 - s // 2
    step = s
    starts = [
        (g + dy * step, g + dx * step) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
    ]
    track_frame, prep_templates = make_tracker(H, W, s, starts)

    @jax.jit
    def fused(frames):
        tF, tE = prep_templates(frames[0])
        mets = jax.vmap(metrics_frame)(frames)
        py, px = jax.vmap(lambda im: track_frame(im, tF, tE))(frames)
        return mets, py, px

    @jax.jit
    def track_only(frames):
        tF, tE = prep_templates(frames[0])
        return jax.vmap(lambda im: track_frame(im, tF, tE))(frames)

    dev = jnp.asarray(frames)
    mets, py_f, px_f = jax.device_get(fused(dev))
    py_s, px_s = jax.device_get(track_only(dev))

    want_y = np.asarray([[y0 + sh[0] for y0, _ in starts] for sh in shifts])
    want_x = np.asarray([[x0 + sh[1] for _, x0 in starts] for sh in shifts])
    err_fused = max(
        np.abs(py_f - want_y).max(), np.abs(px_f - want_x).max()
    )
    err_split = max(
        np.abs(py_s - want_y).max(), np.abs(px_s - want_x).max()
    )
    print(f"tracker-only program: max |shift err| = {err_split:.1f} px")
    print(f"metrics+tracker fused: max |shift err| = {err_fused:.1f} px")
    print(f"metrics finite: {np.isfinite(mets['spec_sum']).all()}")
    ok = err_fused == 0 and err_split == 0
    print("PASS" if ok else "FAIL: fused program corrupts tracking outputs")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
