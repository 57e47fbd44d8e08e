# SPDX-License-Identifier: CECILL-2.1
"""A/B the DFT matmul precision on the real chip: speed vs tracking gate.

Runs the production tracking chunk program (and the metrics program) on a
16-frame synthetic spiral stack at the precision selected by
BARC4DIP_TPU_DFT_PRECISION, reporting device time and the max tracking
error against the known motion. Launch once per precision:

    BARC4DIP_TPU_DFT_PRECISION=highest python docs/profile_dft_precision.py
    BARC4DIP_TPU_DFT_PRECISION=high    python docs/profile_dft_precision.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from bench import make_stack


def main():
    prec = os.environ.get("BARC4DIP_TPU_DFT_PRECISION", "highest")
    T = int(os.environ.get("T", 16))
    side = int(os.environ.get("SIDE", 2048))
    stack = make_stack(T, side)

    from barc4dip_tpu.metrics.common import choose_tiling_mode, normalize_groups
    from barc4dip_tpu.metrics.speckles import (
        _ALL_SPECKLE_GROUPS,
        tracking_grid_from_frame0,
    )
    from barc4dip_tpu.metrics.stack_fused import device_compute_probe

    groups = normalize_groups(
        "all", all_groups=_ALL_SPECKLE_GROUPS, context="speckles",
        param_name="metrics",
    )
    mode, _ = choose_tiling_mode(side, side, tiles=True, min_tile_px=128)
    grid_slices, _labels, _roi, _step, _g0 = tracking_grid_from_frame0(stack)

    t0 = time.perf_counter()
    probe = device_compute_probe(
        stack, grid_slices, groups=groups, mode=mode, sat=65535.0,
        eps=1e-6, flip=True, method="template", subpixel=True, frame_chunk=4,
    )
    print(f"precision={prec}: compute {probe['mpix_s']:.1f} MP/s "
          f"(metrics {probe['metrics_only_s']:.3f}s, "
          f"tracking {probe['tracking_only_s']:.3f}s / {probe['frames']}f; "
          f"total wall {time.perf_counter() - t0:.0f}s)")

    # gate: full pipeline on the same stack
    import barc4dip_tpu as dip

    out = dip.speckle_stack_stats(
        stack, metrics="all", tiles=True, tracking_method="template",
        tracking_backend="opencv", verbose=False, frame_chunk=4,
    )
    ts = np.arange(T)
    dys = 0.35 * ts * np.cos(ts * 0.7)
    dxs = 0.35 * ts * np.sin(ts * 0.7)
    err = np.hypot(
        out["temporal"]["abs"]["dy"] - dys, out["temporal"]["abs"]["dx"] - dxs
    )
    print(f"precision={prec}: tracking max err {float(np.nanmax(err)):.4f} px")


if __name__ == "__main__":
    main()
