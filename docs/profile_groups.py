# SPDX-License-Identifier: CECILL-2.1
"""Per-group device timing at 2048^2 — decides where Pallas fusion pays.

Times each metric group's fused program (full only, tiles only, full+tiles)
plus the sharpness stencil pair, on whatever backend is active. Run on the
real chip:  python docs/profile_groups.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_stack


def _force(out):
    # block_until_ready is not enough on the hosted backend: pull one
    # scalar leaf to force execution end-to-end
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(leaves[0]).ravel()[:1]
    jax.block_until_ready(out)


def timeit(fn, *args, n=3):
    _force(fn(*args))  # compile
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from barc4dip_tpu.metrics.speckles_device import speckle_device_fn
    from barc4dip_tpu.metrics.estimators import (
        eigenvalues_core,
        laplacian_variance_core,
        spectral_entropy_core,
        tenengrad_core,
    )

    field = make_stack(1, 2048)[0]
    dev = jnp.asarray(field.astype(np.float32))
    dev.block_until_ready()

    rows = []
    for group in ("amplitude", "stats", "grain", "bandwidth"):
        for mode in ("off", "subtiles_9x9"):
            fn = jax.jit(
                speckle_device_fn(frozenset({group}), mode, 65535.0, 1e-6, False)
            )
            t = timeit(fn, dev)
            rows.append((f"speckle {group:10s} {mode:12s}", t))

    for name, core in (
        ("tenengrad", tenengrad_core),
        ("laplacian_var", laplacian_variance_core),
        ("spectral_entropy", spectral_entropy_core),
        ("eigenvalues", eigenvalues_core),
    ):
        t = timeit(jax.jit(core), dev)
        rows.append((f"sharp {name:16s} full", t))

    for name, t in rows:
        print(f"{name:42s} {t * 1e3:9.1f} ms")


if __name__ == "__main__":
    main()
