# SPDX-License-Identifier: CECILL-2.1
"""Pallas TPU kernel: 3x3 median filter via a register sorting network.

The lax fallback (ops/rank.py) stacks nine shifted copies and sorts along
the new axis — XLA materialises ~9x the image through HBM. This kernel
streams row bands through VMEM (three row-shifted operands provide the
vertical halo with plain blocked indexing) and evaluates Paeth's 19-exchange
median-of-9 network in registers on the VPU: branch-free min/max, no sort,
no materialised window stack.

Used automatically by :func:`barc4dip_tpu.ops.rank.median_filter2d` for 2D
float32 3x3 filtering on TPU backends; other dtypes/sizes take the lax path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["median3x3_pallas", "pallas_supported"]

_TILE_H = 64


def pallas_supported() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _median9(v):
    """Median of 9 same-shaped arrays via Paeth's 19-exchange network."""
    v = list(v)

    def sort2(i, j):
        lo = jnp.minimum(v[i], v[j])
        hi = jnp.maximum(v[i], v[j])
        v[i], v[j] = lo, hi

    sort2(1, 2); sort2(4, 5); sort2(7, 8)
    sort2(0, 1); sort2(3, 4); sort2(6, 7)
    sort2(1, 2); sort2(4, 5); sort2(7, 8)
    sort2(0, 3); sort2(5, 8); sort2(4, 7)
    sort2(3, 6); sort2(1, 4); sort2(2, 5)
    sort2(4, 7); sort2(4, 2); sort2(6, 4)
    sort2(4, 2)
    return v[4]


def _kernel(top_ref, mid_ref, bot_ref, out_ref):
    W = out_ref.shape[1]
    windows = []
    for ref in (top_ref, mid_ref, bot_ref):
        for dx in range(3):  # static ref slices lower cleanly in Mosaic
            windows.append(ref[:, dx : dx + W])
    out_ref[:] = _median9(windows)


def median3x3_pallas(x):
    """3x3 median of a 2D array, symmetric (edge-duplicating) boundary —
    identical results to scipy.ndimage.median_filter(size=3, mode='reflect')."""
    from jax.experimental import pallas as pl

    H, W = (int(s) for s in x.shape)
    padded = jnp.pad(x, ((1, 1), (1, 1)), mode="symmetric")  # (H+2, W+2)

    tile_h = min(_TILE_H, H)
    n_bands = -(-H // tile_h)
    Hp = n_bands * tile_h
    if Hp > H:
        padded = jnp.pad(padded, ((0, Hp - H), (0, 0)), mode="edge")

    # three row-shifted views supply the vertical halo with plain blocking
    top = padded[0:Hp, :]
    mid = padded[1 : Hp + 1, :]
    bot = padded[2 : Hp + 2, :]

    spec = pl.BlockSpec((tile_h, W + 2), lambda i: (i, 0))
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((Hp, W), x.dtype),
        grid=(n_bands,),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((tile_h, W), lambda i: (i, 0)),
    )(top, mid, bot)
    return out[:H, :W]
