# SPDX-License-Identifier: CECILL-2.1
"""Centro-symmetric map reconstruction.

The circular autocorrelation of a real signal satisfies c[k] = c[-k]
exactly, so its fftshifted (N, N) map obeys S[i, j] = S[(2c - i) % N,
(2c - j) % N] with c = N//2. Device programs therefore only need to emit
rows 0..N//2 — halving the dominant device->host transfer — and the host
rebuilds the redundant half here.
"""
from __future__ import annotations

import numpy as np

__all__ = ["HALF_ROWS", "mirror_centrosymmetric"]


def HALF_ROWS(N: int) -> int:
    """Number of leading rows a device program must emit: N//2 + 1."""
    return N // 2 + 1


def mirror_centrosymmetric(half: np.ndarray, N: int) -> np.ndarray:
    """Rebuild the full (..., N, N) shifted map from its leading
    (..., N//2+1, N) rows."""
    half = np.asarray(half)
    if half.shape[-2] != HALF_ROWS(N) or half.shape[-1] != N:
        raise ValueError(
            f"expected (..., {HALF_ROWS(N)}, {N}) half map; got {half.shape}"
        )
    out_shape = half.shape[:-2] + (N, N)
    full = np.empty(out_shape, dtype=half.dtype)
    full[..., : HALF_ROWS(N), :] = half

    twoc = 2 * (N // 2)
    rows_rest = np.arange(HALF_ROWS(N), N)
    src_rows = (twoc - rows_rest) % N  # all fall inside the emitted half
    cols_map = (twoc - np.arange(N)) % N
    full[..., HALF_ROWS(N) :, :] = half[..., src_rows, :][..., cols_map]
    return full
