# SPDX-License-Identifier: CECILL-2.1
"""Measure the per-execution floor of the tunneled backend and how chunk
width amortizes it in the PRODUCTION metrics program.

Three measurements on pre-uploaded data (no wire in the timed region):
  1. a trivial program (sum of a 4-frame chunk -> scalar): the pure
     dispatch+sync floor of one execution;
  2. the all-groups+tiles metrics chunk program at B in {4, 8, 16}:
     ms/frame vs width (floor amortization + any width-scaling effects);
  3. the production tracker sub-program at width 4 (its floor share).

Run on the real chip:  python docs/profile_exec_floor.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_stack


def _force(out):
    jax.block_until_ready(out)


def timeit(fn, *args, n=None):
    n = n or int(os.environ.get("REPS", 5))
    _force(fn(*args))  # compile + warm
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from barc4dip_tpu.metrics import stack_fused
    from barc4dip_tpu.ops import mxufft

    side = int(os.environ.get("SIDE", 2048))
    T = 16
    stack = make_stack(T, side)

    # 1. pure execution floor
    chunk4 = jnp.asarray(stack[:4].astype(np.float32))
    _force(chunk4)
    floor = timeit(jax.jit(lambda x: jnp.sum(x)), chunk4)
    print(f"trivial program (sum of 4x{side}^2 -> scalar): {floor*1e3:7.1f} ms")

    # 2. metrics chunk program vs width
    groups = ("amplitude", "bandwidth", "grain", "stats")
    for B in (4, 8, 16):
        prog = stack_fused._metrics_chunk_program(
            groups, "subtiles_9x9", 65535.0, 1e-12, True, False,
            True, mxufft.mxu_fft_enabled(),
        )
        chunk = jnp.asarray(stack[:B].astype(np.float32))
        _force(chunk)
        t = timeit(lambda c: jax.device_get(prog(c)), chunk)
        print(f"metrics all-groups+tiles  B={B:2d}: {t*1e3:7.1f} ms/chunk  "
              f"{t/B*1e3:6.2f} ms/frame")

    # 3. tracker sub-program at production width
    from barc4dip_tpu.geometry import roi_grid_3x3

    s = int(os.environ.get("TPL", 63))
    grid, _labels = roi_grid_3x3(
        (side, side), (s, s), (s // 2, s // 2), center_yx=None
    )
    starts, _c, ss = stack_fused._grid_geometry(grid)
    starts_key = tuple(int(v) for v in starts.ravel())
    tprog = stack_fused._track_chunk_program(
        "template", True, side, side, ss, starts_key, None,
        mxufft.mxu_fft_enabled(),
    )
    f0 = chunk4[0]
    eps = jnp.asarray(1e-9, jnp.float32)

    def run_track(c):
        sub, _tail = tprog(c, f0, f0, eps)
        return jax.device_get(sub)

    t = timeit(run_track, chunk4)
    print(f"tracker sub-program       B= 4: {t*1e3:7.1f} ms/chunk  "
          f"{t/4*1e3:6.2f} ms/frame")


if __name__ == "__main__":
    main()
