# SPDX-License-Identifier: CECILL-2.1
"""ex_05 — preprocessing chain: PSF deconvolution, CLAHE, distortion
correction (Config E pipeline; distortion correction is an extension — the
reference declares it but ships an empty stub).

Run: python examples/ex_05_preprocessing.py [out_dir]
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
from scipy.ndimage import gaussian_filter

import barc4dip_tpu as dip

# CI/smoke-test knob: shrink the workload so every example runs in seconds
FAST = bool(os.environ.get("BARC4DIP_EX_FAST"))
from barc4dip_tpu.preprocessing.distortion import correct_distortion
from barc4dip_tpu.preprocessing.enhancement import clahe


def main(out_dir=None):
    rng = np.random.default_rng(4)
    side = 256 if FAST else 512
    a = rng.normal(size=(side, side)) + 1j * rng.normal(size=(side, side))
    f = np.fft.fftfreq(side)
    H = np.exp(-(f[None, :] ** 2 + f[:, None] ** 2) / (2 * (1 / (2 * np.pi * 4 / 2.355)) ** 2))
    sharp = np.abs(np.fft.ifft2(np.fft.fft2(a) * H)) ** 2
    sharp = (sharp / sharp.max()).astype(np.float32)

    # detector blur -> deconvolution
    sigma = 1.8
    blurred = gaussian_filter(sharp, sigma).astype(np.float32)
    for method in ("wiener", "rl", "uw"):
        restored = dip.preprocessing.deconvolve_psf(blurred, sigma=sigma, method=method)
        mse_b = float(np.mean((blurred - sharp) ** 2))
        mse_r = float(np.mean((restored - sharp) ** 2))
        print(f"deconv {method:6s}: blur MSE {mse_b:.3e} -> restored {mse_r:.3e}")

    # contrast enhancement on a dim detector image
    dim = (sharp * 8000 + 20000).astype(np.uint16)
    enhanced = clahe(dim, clip_limit=3.0, tile_grid_size=(8, 8))
    print(f"clahe: std {dim.std():.0f} -> {enhanced.std():.0f}")

    # optics distortion removal (barrel, k1 > 0)
    undistorted = np.asarray(correct_distortion(sharp, k1=0.08))
    print(f"distortion correction: center preserved "
          f"({sharp[side//2, side//2]:.4f} -> {undistorted[side//2, side//2]:.4f})")

    # stack registration (extension): remove a known drift, then verify the
    # residual with the drift measurement itself
    T = 4 if FAST else 8
    fy = np.fft.fftfreq(side)[:, None]
    fx = np.fft.fftfreq(side)[None, :]
    F = np.fft.fft2(sharp)
    ts = np.arange(T)
    dys, dxs = 1.3 * ts, -0.8 * ts
    drifting = np.stack([
        np.fft.ifft2(F * np.exp(-2j * np.pi * (fy * dy + fx * dx))).real
        for dy, dx in zip(dys, dxs)
    ]).astype(np.float32)
    aligned, shifts = dip.preprocessing.register_stack(drifting)
    _, residual = dip.preprocessing.register_stack(aligned)
    print(f"register_stack: measured {np.hypot(shifts['dy'], shifts['dx']).max():.2f} px "
          f"max drift; residual after alignment "
          f"{np.hypot(residual['dy'], residual['dx']).max():.3f} px")

    # dense per-pixel speckle contrast (extension): the tile metrics at
    # full spatial resolution
    vis = dip.metrics.visibility_map((sharp * 1000 + 50).astype(np.float32),
                                     window=16)
    print(f"visibility_map: {vis.shape} map, contrast "
          f"{np.nanmin(vis):.3f}..{np.nanmax(vis):.3f}")

    # achieved-resolution estimation from two acquisitions (extension):
    # FRC of two independently-noisy copies of the same field
    noise = sharp.std() * 0.08
    acq = [sharp + rng.normal(size=sharp.shape).astype(np.float32) * noise
           for _ in range(2)]
    frc = dip.metrics.fourier_ring_correlation(acq[0], acq[1])
    print(f"fourier_ring_correlation: resolution "
          f"{frc['resolution_cyc_per_px']:.4f} cyc/px "
          f"({frc['resolution_px']:.2f} px) at threshold {frc['threshold']}")

    if out_dir:
        from barc4dip_tpu.plotting import plt_image, savefig

        savefig(plt_image(enhanced, "CLAHE", cmap="gray"), f"{out_dir}/ex05_clahe.png")
        print(f"wrote plots to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
