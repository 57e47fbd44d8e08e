# SPDX-License-Identifier: CECILL-2.1
"""ex_06 — production batch workflow: stream a mixed EDF/TIFF scan series
out-of-core through the speckle pipeline with checkpoint/resume, then emit
the JSON summary + markdown report via the barc4dip-batch CLI (extension
beyond the reference, which has no batch entry point).

Run: python examples/ex_06_batch_streaming.py [out_dir]
"""
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def make_frames(out_dir: Path, T=8, side=256, grain_px=6.0):
    """Write a synthetic drifting speckle scan as alternating EDF/TIFF."""
    from PIL import Image

    from barc4dip_tpu.io import save_edf

    rng = np.random.default_rng(6)
    a = rng.normal(size=(side, side)) + 1j * rng.normal(size=(side, side))
    f = np.fft.fftfreq(side)
    sigma_f = 1.0 / (2.0 * np.pi * (grain_px / 2.355))
    base_F = np.fft.fft2(a) * np.exp(
        -(f[None, :] ** 2 + f[:, None] ** 2) / (2 * sigma_f**2)
    )
    fy, fx = f[:, None], f[None, :]

    paths = []
    for t in range(T):
        dy, dx = 0.2 * t, -0.15 * t
        field = np.abs(np.fft.ifft2(base_F * np.exp(-2j * np.pi * (fy * dy + fx * dx)))) ** 2
        frame = np.clip(field / field.mean() * 8000.0, 0, 65535).astype(np.uint16)
        if t % 2 == 0:
            p = out_dir / f"scan_{t:04d}.edf"
            save_edf(frame, p)
        else:
            p = out_dir / f"scan_{t:04d}.tif"
            Image.fromarray(frame).save(p)
        paths.append(str(p))
    return paths


def main(out_dir=None) -> int:
    if out_dir is None:
        out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp())
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = make_frames(out_dir)
    print(f"> wrote {len(paths)} frames under {out_dir}")

    # Python API: streaming pipeline with chunk-level checkpoint/resume
    from barc4dip_tpu.models import SpeckleStackPipeline

    pipe = SpeckleStackPipeline(metrics="amplitude,stats", tiles=False, frame_chunk=4)
    out = pipe.run_files(paths, checkpoint_dir=out_dir / "ckpt")
    r = out["temporal"]["abs"]["r"]
    print(f"> tracked drift: r[final] = {float(r[-1]):.2f} px over {len(r)} frames")

    # CLI surface: same run through barc4dip-batch (resumes from checkpoints)
    from barc4dip_tpu.report.batch_cli import main as batch_main

    rc = batch_main([
        str(out_dir / "scan_*.edf"), str(out_dir / "scan_*.tif"),
        "--metrics", "amplitude,stats", "--no-tiles", "--frame-chunk", "4",
        "--checkpoint-dir", str(out_dir / "ckpt"),
        "--out", str(out_dir / "summary.json"),
        "--report", str(out_dir / "report.md"),
    ])
    print(f"> barc4dip-batch rc={rc}; summary + report in {out_dir}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
