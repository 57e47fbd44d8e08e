# SPDX-License-Identifier: CECILL-2.1
"""Batched stack tracking: T x 9 x 2 correlations as fused device programs.

The reference tracks a speckle stack with 18*T sequential full-frame
template matches through OpenCV/skimage (reference
metrics/speckles.py:347-415). Here each chunk of frames runs ONE jitted
program: the frame spectrum and window statistics are computed once per
frame, all 9 absolute templates (frame 0) are pre-transformed once per
stack, and the 9 incremental templates (frame t-1) batch through vmap.
Everything — FFTs, integral images, argmax, Taylor refinement — fuses
on-device with no host round-trips inside a chunk.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ncc as ncc_ops
from ..ops import phasecorr as pc_ops
from ..utils import progress_done, progress_update

__all__ = ["track_stack_batched"]


def _grid_geometry(grid_slices) -> tuple[np.ndarray, np.ndarray, int]:
    """Extract (starts (9,2), centers (9,2), roi_side) from a 3x3 slice grid."""
    starts = []
    centers = []
    sides = set()
    for iy in range(3):
        for ix in range(3):
            sy, sx = grid_slices[iy, ix]
            starts.append((sy.start, sx.start))
            centers.append(
                ((sy.start + sy.stop - 1) / 2.0, (sx.start + sx.stop - 1) / 2.0)
            )
            sides.add((sy.stop - sy.start, sx.stop - sx.start))
    if len(sides) != 1:
        raise ValueError("All grid ROIs must share one shape.")
    (sh, sw), = sides
    if sh != sw:
        raise ValueError("Grid ROIs must be square.")
    return np.asarray(starts, np.int32), np.asarray(centers, np.float64), int(sh)


def _extract_tiles(frame, starts: np.ndarray, s: int):
    """Gather the 9 (s, s) tiles at static start positions."""
    return jnp.stack(
        [frame[y0 : y0 + s, x0 : x0 + s] for (y0, x0) in starts]
    )


# ---------------------------------------------------------------------------
# template (NCC) method
# ---------------------------------------------------------------------------

@lru_cache(maxsize=32)
def _template_chunk_program(
    H: int, W: int, s: int, B: int, subpixel: bool, starts_key: tuple
):
    starts = np.asarray(starts_key, np.int32).reshape(-1, 2)
    centers_y = (starts[:, 0] + (s - 1) / 2.0).astype(np.float64)
    centers_x = (starts[:, 1] + (s - 1) / 2.0).astype(np.float64)

    def peak_of(corr):
        i, j = pc_ops.argmax2d(corr)
        py = i.astype(corr.dtype)
        px = j.astype(corr.dtype)
        if subpixel:
            di, dj = pc_ops.subpixel_taylor(corr, i, j, convention="newton")
            py = py + di
            px = px + dj
        return py, px

    def one_frame(img, prev, tpl0_preps, eps):
        prep = ncc_ops.zncc_prepare_image(img, s, s, eps=eps)


        def run_prep(tp):
            corr = ncc_ops.ncc_valid_from_preps(prep, tp, eps=eps)
            return peak_of(corr)

        def run_tpl(tpl):
            corr = ncc_ops.ncc_valid_from_prepared(prep, tpl, eps=eps)
            return peak_of(corr)

        tpl_inc = _extract_tiles(prev, starts, s)
        # frame-0 template spectra are precomputed once per stack
        py_a, px_a = jax.vmap(run_prep)(tpl0_preps)
        py_i, px_i = jax.vmap(run_tpl)(tpl_inc)

        half = (s - 1) / 2.0
        cy = jnp.asarray(centers_y, dtype=img.dtype)
        cx = jnp.asarray(centers_x, dtype=img.dtype)
        dy_a = py_a + half - cy
        dx_a = px_a + half - cx
        dy_i = py_i + half - cy
        dx_i = px_i + half - cx
        return dy_a, dx_a, dy_i, dx_i

    @jax.jit
    def chunk(imgs, prevs, frame0, eps):
        # the template bank is rebuilt in-program: device-resident complex64
        # does not survive crossing executable boundaries on the axon TPU
        # backend (silent layout corruption)
        tiles0 = _extract_tiles(frame0, starts, s)
        tpl0 = jax.vmap(lambda t: ncc_ops.prep_template(t, H, W))(tiles0)
        return jax.vmap(lambda im, pr: one_frame(im, pr, tpl0, eps))(imgs, prevs)

    return chunk


# ---------------------------------------------------------------------------
# phase-correlation method
# ---------------------------------------------------------------------------

@lru_cache(maxsize=32)
def _phase_chunk_program(
    H: int, W: int, s: int, B: int, subpixel: bool, starts_key: tuple
):
    starts = np.asarray(starts_key, np.int32).reshape(-1, 2)

    def embed(tpl_z, y0, x0):
        return jnp.pad(tpl_z, ((y0, H - y0 - s), (x0, W - x0 - s)))

    def peak_shift(mag):
        i, j = pc_ops.argmax2d(mag)
        dy = (i - H // 2).astype(mag.dtype)
        dx = (j - W // 2).astype(mag.dtype)
        if subpixel:
            di, dj = pc_ops.subpixel_taylor(mag, i, j, convention="newton")
            dy = dy + di
            dx = dx + dj
        return dy, dx

    def one_frame(img, prev, Ft0, eps):
        img_z = pc_ops.zscore2d(img, eps=eps)
        Fi = jnp.fft.rfft2(img_z)

        def from_Ft(Ft):
            prod = Fi * jnp.conj(Ft)
            cps = prod / (jnp.abs(prod) + eps)
            corr = jnp.fft.irfft2(cps, s=(H, W))
            mag = jnp.abs(jnp.fft.fftshift(corr, axes=(-2, -1)))
            return peak_shift(mag)

        tiles_prev = _extract_tiles(prev, starts, s)
        tiles_prev_z = jax.vmap(lambda t: pc_ops.zscore2d(t, eps=eps))(tiles_prev)
        emb = jnp.stack(
            [
                embed(tiles_prev_z[k].astype(jnp.float32).astype(img.dtype), y0, x0)
                for k, (y0, x0) in enumerate(starts)
            ]
        )
        Ft_inc = jnp.fft.rfft2(emb)

        dy_a, dx_a = jax.vmap(from_Ft)(Ft0)
        dy_i, dx_i = jax.vmap(from_Ft)(Ft_inc)
        return dy_a, dx_a, dy_i, dx_i

    @jax.jit
    def chunk(imgs, prevs, frame0, eps):
        tiles0 = _extract_tiles(frame0, starts, s)
        tiles0_z = jax.vmap(lambda t: pc_ops.zscore2d(t, eps=eps))(tiles0)
        emb0 = jnp.stack(
            [
                jnp.pad(
                    tiles0_z[k].astype(jnp.float32).astype(frame0.dtype),
                    ((y0, H - y0 - s), (x0, W - x0 - s)),
                )
                for k, (y0, x0) in enumerate(starts)
            ]
        )
        Ft0 = jnp.fft.rfft2(emb0)
        return jax.vmap(lambda im, pr: one_frame(im, pr, Ft0, eps))(imgs, prevs)

    return chunk


# ---------------------------------------------------------------------------
# host driver
# ---------------------------------------------------------------------------

def track_stack_batched(
    stack: np.ndarray,
    grid_slices,
    *,
    method: str = "template",
    subpixel: bool = True,
    eps: float = 1e-9,
    frame_chunk: int = 8,
    verbose: bool = False,
    mesh=None,
    checkpoint_dir=None,
):
    """Track all frames of a (T, H, W) stack against the 3x3 ROI grid.

    Returns (dx_abs, dy_abs, dx_inc, dy_inc), each (T, 3, 3) float32.
    Absolute shifts use frame 0 templates; incremental shifts use frame t-1.

    With ``mesh``, chunk frame axes are sharded across the device mesh; the
    frame-0 template bank is replicated. The t-1 dependency is resolved
    host-side (each shard receives its own prev frames), so no device-side
    halo exchange is needed.
    """
    T, H, W = (int(v) for v in stack.shape)
    starts, centers, s = _grid_geometry(grid_slices)
    starts_key = tuple(int(v) for v in starts.ravel())

    method = method.strip().lower()
    if method not in ("template", "phase"):
        raise ValueError(f"Unsupported tracking method for stacks: {method!r}")

    dtype = np.float32 if stack.dtype != np.float64 else np.float64
    B = max(1, min(int(frame_chunk), T))

    put_frames = jnp.asarray
    put_repl = jnp.asarray
    if mesh is not None:
        from ..parallel.mesh import frames_sharding, replicated_sharding

        n_dev = mesh.size
        B = max(1, -(-B // n_dev)) * n_dev
        fsh = frames_sharding(mesh)
        rsh = replicated_sharding(mesh)
        put_frames = lambda a: jax.device_put(jnp.asarray(a), fsh)  # noqa: E731
        put_repl = lambda a: jax.device_put(jnp.asarray(a), rsh)  # noqa: E731

    frame0 = jnp.asarray(stack[0], dtype=dtype)
    eps_j = jnp.asarray(eps, dtype=dtype)

    if method == "template":
        chunk_fn = _template_chunk_program(H, W, s, B, bool(subpixel), starts_key)
    else:
        chunk_fn = _phase_chunk_program(H, W, s, B, bool(subpixel), starts_key)
    tpl_arg = put_repl(frame0) if mesh is not None else frame0

    dy_abs = np.empty((T, 9), np.float32)
    dx_abs = np.empty((T, 9), np.float32)
    dy_inc = np.empty((T, 9), np.float32)
    dx_inc = np.empty((T, 9), np.float32)

    ckpt = None
    if checkpoint_dir is not None:
        from ..utils.checkpoint import ChunkStore

        config = {
            "kind": "tracking", "shape": (T, H, W), "method": method,
            "roi": s, "starts": starts_key, "subpixel": bool(subpixel),
            "chunk": B,
        }
        ckpt = ChunkStore(checkpoint_dir, "tracking", config)

    def _store(res, c0: int, c1: int) -> None:
        n = c1 - c0
        dy_a, dx_a, dy_i, dx_i = (np.asarray(r, np.float32)[:n] for r in jax.device_get(res))
        if ckpt is not None:
            ckpt.save(c0, {"dy_a": dy_a, "dx_a": dx_a, "dy_i": dy_i, "dx_i": dx_i})
        dy_abs[c0:c1] = dy_a
        dx_abs[c0:c1] = dx_a
        dy_inc[c0:c1] = dy_i
        dx_inc[c0:c1] = dx_i

    # one-behind pipeline: overlap chunk compute with host transfers
    pending = None
    last = -1
    for c0 in range(0, T, B):
        if verbose:
            last = progress_update("Speckle stability loop", c0, T, last)
        c1 = min(c0 + B, T)
        n = c1 - c0

        if ckpt is not None and ckpt.has(c0):
            saved = ckpt.load(c0)
            dy_abs[c0:c1] = saved["dy_a"]
            dx_abs[c0:c1] = saved["dx_a"]
            dy_inc[c0:c1] = saved["dy_i"]
            dx_inc[c0:c1] = saved["dx_i"]
            continue

        imgs = stack[c0:c1]
        prevs = stack[max(c0 - 1, 0) : c1 - 1]
        if c0 == 0:
            prevs = np.concatenate([stack[0:1], prevs], axis=0)
        if n < B:  # pad the tail chunk to keep one compiled shape
            padn = B - n
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], padn, axis=0)], axis=0)
            prevs = np.concatenate([prevs, np.repeat(prevs[-1:], padn, axis=0)], axis=0)

        res = chunk_fn(
            put_frames(np.asarray(imgs, dtype=dtype)),
            put_frames(np.asarray(prevs, dtype=dtype)),
            tpl_arg, eps_j,
        )
        if pending is not None:
            _store(*pending)
        pending = (res, c0, c1)
    if pending is not None:
        _store(*pending)
    if verbose:
        progress_done("Speckle stability loop")

    return (
        dx_abs.reshape(T, 3, 3),
        dy_abs.reshape(T, 3, 3),
        dx_inc.reshape(T, 3, 3),
        dy_inc.reshape(T, 3, 3),
    )
