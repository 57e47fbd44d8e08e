# SPDX-License-Identifier: CECILL-2.1
"""Sub-profile of the grain and amplitude estimator internals at 2048^2.

Times each stage of the grain pipeline (autocorr FFT chain / width
walk-outs / radial polar gather) and the amplitude percentile bisection as
separate vmapped B-frame programs, against an empty-program floor, so the
next kernel optimization targets the true hot spot rather than the group.

Run on the real chip:  python docs/profile_grain_parts.py
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
    _force(fn(*args))
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from barc4dip_tpu.ops.corrcore import autocorr2d_core
    from barc4dip_tpu.ops.radialcore import radial_mean_interpolated_core
    from barc4dip_tpu.ops.quantile import nanpercentiles_exact
    from barc4dip_tpu.ops.widths import width_at_fraction_core
    from barc4dip_tpu.metrics.estimators import (
        _widths_from_autocorr, amplitude_core, grain_core,
    )

    B = int(os.environ.get("B", 4))
    side = int(os.environ.get("SIDE", 2048))
    stack = make_stack(B, side)
    frames = jnp.asarray(stack.astype(np.float32))
    _force(jax.jit(lambda x: x.sum())(frames))

    def prog(per_frame):
        return jax.jit(jax.vmap(per_frame))

    floor = timeit(prog(lambda im: im[0, 0] * 1.0), frames)
    print(f"empty-program floor: {floor*1e3:7.1f} ms/chunk")

    def ac_only(im):
        return autocorr2d_core(
            im, remove_mean=True, standardize=False, normalize="peak"
        )[::64, ::64]  # tiny output: don't time a 16MB/frame pull

    ac = jax.jit(jax.vmap(lambda im: autocorr2d_core(
        im, remove_mean=True, standardize=False, normalize="peak")))(frames)
    ac.block_until_ready()

    def radial_only(a):
        rad, _ = radial_mean_interpolated_core(a, centrosymmetric=True)
        return rad

    def widths_only(a):
        return _widths_from_autocorr(
            a, fraction=float(1 / np.e), radial_method="interpolated")

    def cuts_only(a):
        N = a.shape[-1]
        flat_idx = jnp.argmax(a)
        iy = flat_idx // N
        ix = flat_idx % N
        y_cut = jnp.take(a, ix, axis=1)
        x_cut = jnp.take(a, iy, axis=0)
        ly, _ = width_at_fraction_core(y_cut, fraction=float(1/np.e), center_index=iy)
        lx, _ = width_at_fraction_core(x_cut, fraction=float(1/np.e), center_index=ix)
        return lx, ly

    def pct_only(im):
        return nanpercentiles_exact(im, (0.05, 99.95))

    def nanstats_only(im):
        return jnp.nanstd(im) / jnp.nanmean(im)

    rows = [
        ("autocorr2d only", prog(ac_only), frames),
        ("radial half-ring gather", prog(radial_only), ac),
        ("argmax+cuts+widths", prog(cuts_only), ac),
        ("widths+radial (all post)", prog(widths_only), ac),
        ("grain full (no map)", prog(lambda im: grain_core(im, with_map=False)), frames),
        ("amplitude percentiles", prog(pct_only), frames),
        ("amplitude nanmean/std", prog(nanstats_only), frames),
        ("amplitude full", prog(amplitude_core), frames),
    ]
    for name, p, arg in rows:
        t = timeit(p, arg)
        print(f"{name:28s} {t*1e3:7.1f} ms/chunk  delta {(t-floor)*1e3:6.1f} "
              f"ms ({(t-floor)/B*1e3:5.2f} ms/frame)")


if __name__ == "__main__":
    main()
