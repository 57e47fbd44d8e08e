# SPDX-License-Identifier: CECILL-2.1
"""ex_02 — flat-field correction + speckle statistics + logbook report
(reference ex_02 workflow).

Run: python examples/ex_02_speckle_statistics.py [out_dir]
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
    rng = np.random.default_rng(1)
    side = 384 if FAST else 1200
    a = rng.normal(size=(side, side)) + 1j * rng.normal(size=(side, side))
    f = np.fft.fftfreq(side)
    H = np.exp(-(f[None, :] ** 2 + f[:, None] ** 2) / (2 * (1 / (2 * np.pi * 6 / 2.355)) ** 2))
    raw = np.abs(np.fft.ifft2(np.fft.fft2(a) * H)) ** 2
    raw = (raw / raw.mean() * 8000).astype(np.float32)

    # synthetic detector gain + offset
    flat = rng.normal(2.0, 0.05, size=(side, side)).astype(np.float32)
    dark = rng.normal(100.0, 2.0, size=(side, side)).astype(np.float32)
    measured = raw * flat + dark

    corrected = dip.preprocessing.flat_field_correction(
        measured, flats=flat * 4000 + dark, darks=dark, scale="flat_median"
    )

    stats = dip.speckle_stats(corrected, metrics="all", tiles=True, verbose=False)
    text = dip.logbook_report(stats, complete=True, notes=True)
    print(text)

    if out_dir:
        from barc4dip_tpu.plotting import plt_histogram, plt_image, plt_tiles_metric, savefig

        savefig(plt_image(corrected, "corrected speckles", cmap="srw"), f"{out_dir}/ex02_image.png")
        savefig(plt_tiles_metric(corrected, stats, "grain.lx"), f"{out_dir}/ex02_tiles_lx.png")
        savefig(
            plt_histogram(corrected.astype(np.uint16), logy=True, cumulative=True),
            f"{out_dir}/ex02_histogram.png",
        )
        print(f"wrote plots to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
