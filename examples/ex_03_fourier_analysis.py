# SPDX-License-Identifier: CECILL-2.1
"""ex_03 — FFT / PSD / autocorrelation analysis of a speckle field
(reference ex_03 workflow): spectra, radial means, spectral plots.

Run: python examples/ex_03_fourier_analysis.py [out_dir]
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import barc4dip_tpu as dip

# CI/smoke-test knob: shrink the workload so every example runs in seconds
FAST = bool(os.environ.get("BARC4DIP_EX_FAST"))


def main(out_dir=None):
    rng = np.random.default_rng(2)
    side, pixel_um = (256 if FAST else 1024), 0.65
    a = rng.normal(size=(side, side)) + 1j * rng.normal(size=(side, side))
    f = np.fft.fftfreq(side)
    H = np.exp(-(f[None, :] ** 2 + f[:, None] ** 2) / (2 * (1 / (2 * np.pi * 8 / 2.355)) ** 2))
    field = np.abs(np.fft.ifft2(np.fft.fft2(a) * H)) ** 2
    field = (field / field.mean() * 1000).astype(np.float32)

    # physically calibrated spectra (cycles/um): the whole quick-look runs
    # as ONE device program — PSD, autocorrelation and both radial means
    # from a single upload (the front door for this workflow; the separate
    # psd2d/autocorr2d/radial_mean_* calls remain available and identical)
    summary = dip.signal.spectral_summary(field, dx=pixel_um, dy=pixel_um, scale=True)
    P, fx, fy = summary["psd"], summary["fx"], summary["fy"]
    rad_i, r_i = summary["radial_interpolated"], summary["r_interpolated"]

    # the maps are device-resident; materialise via the half-transfer pull
    ac = dip.signal.pull_centrosymmetric(summary["autocorr"])

    w, hit = dip.maths.width_at_fraction(ac[side // 2, :], fraction=1 / np.e)
    print(f"autocorr 1/e full width: {w * pixel_um:.2f} um ({w:.2f} px), hit_edge={hit}")
    d, _ = dip.maths.distance_at_fraction_from_peak(np.asarray(rad_i), fraction=1 / np.e)
    print(f"radial 1/e radius: {d:.2f} px -> leq = {2 * d * (r_i[1] - r_i[0]):.2f} px")

    # scan-series form: per-frame radial profiles through the chunked
    # pipeline (radial curves only — the per-frame maps never ride the wire)
    scan = np.stack([field * (1 + 0.05 * t) for t in range(4)])
    series = dip.signal.spectral_summary_stack(scan, dx=pixel_um, dy=pixel_um)
    print(f"scan radial profiles: {series['radial_interpolated'].shape}")

    if out_dir:
        from barc4dip_tpu.plotting import (
            plt_radial_waterfall, plt_spectrum1d, plt_spectrum2d, savefig,
        )

        savefig(plt_radial_waterfall(series, zlabel="autocorr"),
                f"{out_dir}/ex03_radial_waterfall.png")

        P_host = dip.signal.pull_centrosymmetric(P)  # half the wire bytes
        figs = plt_spectrum2d(P_host, x=fx, y=fy, log_intensity=True,
                              mask_center=True, xlabel="fx (1/um)", ylabel="fy (1/um)")
        savefig(figs["intensity"], f"{out_dir}/ex03_psd.png")
        fig = plt_spectrum1d(np.asarray(rad_i), np.asarray(r_i), logy=True,
                             cumulative=True, xlabel="r (px)", ylabel="autocorr")
        savefig(fig, f"{out_dir}/ex03_radial.png")
        print(f"wrote plots to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
