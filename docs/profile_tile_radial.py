# SPDX-License-Identifier: CECILL-2.1
"""Measure the tile-grain radial resampling cost at production tile shape.

The 9x9 subtile executor evaluates grain on 81 tiles of ~227^2 per frame;
each tile's ``leq`` needs a polar-resampled radial mean
(``radial_mean_interpolated_core``, half-ring fast path) whose bilinear
gather geometry is IDENTICAL for every tile. This probe times, on the chip:

  (a) the current four-scalar-gather kernel vmapped over B*81 tiles;
  (b) a dense-matmul formulation: radial = T @ W^T where W (nr, n*n) is the
      host-precomputed composite bilinear+theta-mean operator (exactly the
      same taps/weights) — MXU work instead of serial scalar gathers.

Run on the real chip: python docs/profile_tile_radial.py  [B=4 SIDE=227]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(leaves[0]).ravel()[:1]
    jax.block_until_ready(out)


def timeit(fn, *args, n=5):
    _force(fn(*args))
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def dense_radial_operator(shape, dtype=np.float32):
    """Composite (nr, ny*nx) operator reproducing
    radial_mean_interpolated_core(centrosymmetric=True) as one matmul."""
    from barc4dip_tpu.ops.radialcore import interpolated_geometry

    ny, nx = shape
    rm, nr, nt, _r = interpolated_geometry(shape, None, None, None)
    step = 2.0 * np.pi / nt
    half = nt % 2 == 0
    if half:
        nt = nt // 2
    r = np.linspace(0.0, rm, nr)
    theta = np.arange(nt) * step
    Xs = r[:, None] * np.cos(theta)[None, :]
    Ys = r[:, None] * np.sin(theta)[None, :]
    xi = (Xs + (nx // 2)).reshape(nr, -1)
    yi = (Ys + (ny // 2)).reshape(nr, -1)

    def inb(x, y):
        return (x >= 0) & (x <= nx - 1) & (y >= 0) & (y <= ny - 1)

    if half:
        xm = 2.0 * (nx // 2) - xi
        ym = 2.0 * (ny // 2) - yi
        in_p = inb(xi, yi)
        in_m = inb(xm, ym)
        xi = np.where(in_p, xi, xm)
        yi = np.where(in_p, yi, ym)
        w = 0.5 * (in_p.astype(np.float64) + in_m.astype(np.float64))
    else:
        w = inb(xi, yi).astype(np.float64)

    x0 = np.clip(np.floor(xi), 0, nx - 2).astype(np.int64)
    y0 = np.clip(np.floor(yi), 0, ny - 2).astype(np.int64)
    fx = np.clip(xi - x0, 0.0, 1.0)
    fy = np.clip(yi - y0, 0.0, 1.0)
    base = y0 * nx + x0

    # kernel semantics: radial = vals.reshape(nr, nt).mean(axis=1) with
    # vals = w * bilinear (fill_value = 0 for OOB) — uniform 1/nt weight
    W = np.zeros((nr, ny * nx), np.float64)
    rows = np.repeat(np.arange(nr), xi.shape[1])
    wn = (w / nt).reshape(-1)
    for off, tap in (
        (0, ((1 - fy) * (1 - fx)).reshape(-1)),
        (1, ((1 - fy) * fx).reshape(-1)),
        (nx, (fy * (1 - fx)).reshape(-1)),
        (nx + 1, (fy * fx).reshape(-1)),
    ):
        np.add.at(W, (rows, base.reshape(-1) + off), wn * tap)
    return W.astype(dtype), nr


def main():
    from barc4dip_tpu.ops.radialcore import radial_mean_interpolated_core

    B = int(os.environ.get("B", 4))
    side = int(os.environ.get("SIDE", 227))
    ntiles = B * 81
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(rng.normal(size=(ntiles, side, side)).astype(np.float32))
    _force(jax.jit(lambda x: x.sum())(tiles))

    R = int(os.environ.get("R", 8))  # inner reps amortize the ~55 ms
    # per-dispatch floor (docs/AXON_BACKEND_NOTES.md §3)

    def rep(fn):
        # data dependency through acc defeats loop-invariant hoisting/CSE
        def run(ts, *args):
            def body(i, acc):
                return acc + fn(ts + acc * 1e-30, *args)[0][:4].sum()
            return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
        return jax.jit(run)

    gather1 = jax.vmap(
        lambda t: radial_mean_interpolated_core(t, centrosymmetric=True)[0])
    t_g = timeit(rep(lambda ts: (gather1(ts),)), tiles)
    print(f"gather : {t_g/R*1e3:8.2f} ms/call for {ntiles} tiles of "
          f"{side}^2 ({t_g/R/B*1e3:.2f} ms/frame-of-81, floor amortized x{R})")

    W, nr = dense_radial_operator((side, side))
    Wd = jnp.asarray(W)  # (nr, n*n)
    flat = tiles.reshape(ntiles, side * side)

    def mm(ts, Wmat):
        return jax.lax.dot_general(
            ts, Wmat, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)

    t_m = timeit(rep(lambda ts, Wmat: (mm(ts, Wmat),)), flat, Wd)
    print(f"matmul : {t_m/R*1e3:8.2f} ms/call ({t_m/R/B*1e3:.2f} "
          f"ms/frame-of-81, W is {W.nbytes/1e6:.1f} MB)")
    mmj = jax.jit(mm)
    gather = jax.jit(gather1)

    a = np.asarray(gather(tiles))
    b = np.asarray(mmj(flat, Wd))
    rel = np.abs(a - b) / (np.abs(a) + 1e-30)
    print(f"parity : max rel diff {rel.max():.3e} "
          f"(max abs {np.abs(a - b).max():.3e})")


if __name__ == "__main__":
    main()
