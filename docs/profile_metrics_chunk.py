# SPDX-License-Identifier: CECILL-2.1
"""Per-group timing of the PRODUCTION metrics chunk program (B=4, 2048^2).

Unlike docs/profile_groups.py (round 2: one program per group, dominated by
the ~55 ms per-execution floor), this times the exact vmapped chunk program
the fused stack pipeline runs, with frames pre-uploaded — so the deltas are
the true marginal device cost of each group at production shape, the same
quantity the bench's device_compute probe aggregates.

Run on the real chip:  python docs/profile_metrics_chunk.py
Optional: B=<w> SIDE=<n> REPS=<k> env knobs.
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
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(leaves[0]).ravel()[:1]
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
    from barc4dip_tpu.metrics.stack_fused import _metrics_chunk_program
    from barc4dip_tpu.ops import mxufft
    from barc4dip_tpu.config import on_tpu

    B = int(os.environ.get("B", 4))
    side = int(os.environ.get("SIDE", 2048))
    stack = make_stack(B, side)
    chunk = jnp.asarray(stack)
    _force(jax.jit(lambda x: x.astype(jnp.uint32).sum())(chunk))

    configs = [
        (("amplitude",), "off"),
        (("stats",), "off"),
        (("grain",), "off"),
        (("bandwidth",), "off"),
        (("amplitude", "bandwidth", "grain", "stats"), "off"),
        (("amplitude",), "subtiles_9x9"),
        (("stats",), "subtiles_9x9"),
        (("grain",), "subtiles_9x9"),
        (("bandwidth",), "subtiles_9x9"),
        (("amplitude", "bandwidth", "grain", "stats"), "subtiles_9x9"),
    ]
    print(f"# metrics chunk program, B={B}, {side}^2, uint16 in, "
          f"full_maps=False, mxu_fft={mxufft.mxu_fft_enabled()}")
    rows = []
    for groups, mode in configs:
        prog = _metrics_chunk_program(
            groups, mode, 65535.0, 1e-6, True, False, on_tpu(),
            mxufft.mxu_fft_enabled(),
        )
        t = timeit(prog, chunk)
        rows.append((groups, mode, t))
        print(f"{'+'.join(g[:4] for g in groups):24s} {mode:12s} "
              f"{t * 1e3:8.1f} ms/chunk  {t / B * 1e3:6.2f} ms/frame")

    # marginal cost of each group inside the full-set tiled program
    full_off = next(t for g, m, t in rows
                    if len(g) == 4 and m == "off")
    full_tiles = next(t for g, m, t in rows
                      if len(g) == 4 and m == "subtiles_9x9")
    print(f"\nall-groups: full-only {full_off*1e3:.1f} ms, "
          f"+tiles {(full_tiles - full_off)*1e3:.1f} ms, "
          f"total {full_tiles/B*1e3:.2f} ms/frame")


if __name__ == "__main__":
    main()
