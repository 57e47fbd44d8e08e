# SPDX-License-Identifier: CECILL-2.1
"""Stack plotting: displacement trajectories/time series and metric series.

API parity with reference plotting/stack.py:101-581 (plt_displacement,
plt_stack_metric).
"""
from __future__ import annotations

from typing import Literal, Sequence

import matplotlib.pyplot as plt
import numpy as np
from matplotlib.axes import Axes
from matplotlib.figure import Figure
from mpl_toolkits.axes_grid1 import make_axes_locatable

from .style import start_plotting

__all__ = ["plt_displacement", "plt_displacement_field", "plt_stack_metric", "plt_tiles_metric_stack"]

_TemporalKey = Literal["abs", "inc"]
_ViewKind = Literal["trajectory", "timeseries"]
_Uncertainty = Literal["none", "band", "errorbar"]
_StatsScope = Literal["full", "tiles", "both"]

_DEFAULT_LABELS = np.array(
    [["NW", "N", "NE"], ["W", "C", "E"], ["SW", "S", "SE"]], dtype=object
)


def _temporal_block(stack_stats: dict, temporal: _TemporalKey) -> dict:
    root = stack_stats.get("temporal")
    if not isinstance(root, dict):
        raise ValueError("stack_stats must contain dict key 'temporal'")
    block = root.get(temporal)
    if not isinstance(block, dict):
        raise ValueError(f"stack_stats['temporal'] must contain dict key {temporal!r}")
    return block


def _series(block: dict, key: str) -> np.ndarray:
    arr = block.get(key)
    if arr is None and key.startswith("std_"):
        arr = block.get(key.replace("std_", "") + "_std")
    if not isinstance(arr, np.ndarray):
        raise ValueError(f"temporal block missing numpy array key {key!r}")
    if arr.ndim != 1:
        raise ValueError(f"temporal[{key!r}] must be 1D; got shape={arr.shape!r}")
    return arr


def _metric_path(metric_path: str | Sequence[str]) -> tuple[str, str]:
    if isinstance(metric_path, str):
        parts = tuple(p for p in metric_path.replace("/", ".").split(".") if p)
    else:
        parts = tuple(metric_path)
    if len(parts) != 2:
        raise ValueError("metric_path must be like ('grain','lx') or 'grain.lx'")
    return str(parts[0]), str(parts[1])


def _tile_labels(meta: dict) -> np.ndarray:
    labels = meta.get("tile_labels")
    if isinstance(labels, np.ndarray) and labels.shape == (3, 3):
        return labels
    return _DEFAULT_LABELS


def _draw_series(
    ax: Axes,
    t: np.ndarray,
    y: np.ndarray,
    *,
    color,
    ylabel: str,
    label: str | None = None,
    uncertainty: _Uncertainty,
    ystd,
    marker: str = "o",
    markersize: float = 3.0,
) -> None:
    ax.plot(
        t,
        y,
        linewidth=1.0,
        linestyle="-",
        color=color,
        markerfacecolor="white",
        markeredgecolor=color,
        markeredgewidth=1.1,
        marker=marker,
        markersize=markersize,
        label=label,
    )
    if uncertainty != "none" and ystd is not None:
        if uncertainty == "band":
            ax.fill_between(t, y - ystd, y + ystd, alpha=0.2, color=color)
        elif uncertainty == "errorbar":
            ax.errorbar(t, y, yerr=ystd, fmt="none", elinewidth=0.8, capsize=0, color=color)
        else:
            raise ValueError(f"unknown uncertainty={uncertainty!r}")
    ax.set_ylabel(ylabel)
    ax.grid(True, alpha=0.3)


def plt_displacement(
    stack_stats: dict | None = None,
    *,
    xarr: np.ndarray | None = None,
    yarr: np.ndarray | None = None,
    temporal: _TemporalKey = "abs",
    kind: _ViewKind = "trajectory",
    cmap: str = "viridis",
    show_path: bool = True,
    uncertainty: _Uncertainty = "none",
    k: float = 1.0,
    title: str | None = None,
) -> Figure:
    """Displacement diagnostics: XY trajectory colored by frame, or dx/dy/r
    stacked time series with band/errorbar uncertainty. Accepts either a
    speckle_stack_stats dict or raw xarr/yarr displacement arrays."""
    start_plotting(k)

    use_stack = stack_stats is not None
    use_xy = xarr is not None or yarr is not None
    if use_stack and use_xy:
        raise ValueError("Provide either 'stack_stats' or both 'xarr' and 'yarr', not both.")
    if not use_stack and not use_xy:
        raise ValueError("Provide either 'stack_stats' or both 'xarr' and 'yarr'.")

    unit_px = "px"
    r = std_dx = std_dy = std_r = None
    include_r = True

    if use_stack:
        meta = stack_stats.get("meta")
        if not isinstance(meta, dict):
            raise ValueError("stack_stats must contain dict key 'meta'")
        units = meta.get("units", {})
        if isinstance(units, dict) and isinstance(units.get("temporal"), dict):
            u_dx = units["temporal"].get("dx")
            if isinstance(u_dx, str) and u_dx.strip():
                unit_px = u_dx

        block = _temporal_block(stack_stats, temporal=temporal)
        dx = _series(block, "dx").astype(float, copy=False)
        dy = _series(block, "dy").astype(float, copy=False)
        if isinstance(block.get("r"), np.ndarray):
            r = _series(block, "r").astype(float, copy=False)
        for key, dst in (("std_dx", "std_dx"), ("std_dy", "std_dy"), ("std_r", "std_r")):
            if isinstance(block.get(key), np.ndarray) or isinstance(
                block.get(key.replace("std_", "") + "_std"), np.ndarray
            ):
                val = _series(block, key).astype(float, copy=False)
                if dst == "std_dx":
                    std_dx = val
                elif dst == "std_dy":
                    std_dy = val
                else:
                    std_r = val
    else:
        if xarr is None or yarr is None:
            raise ValueError("Both 'xarr' and 'yarr' must be provided together.")
        if temporal != "abs":
            raise ValueError("When using 'xarr' and 'yarr', temporal must be 'abs'.")
        if uncertainty != "none":
            raise ValueError("When using 'xarr' and 'yarr', uncertainty must be 'none'.")
        dx = np.asarray(xarr, dtype=float).ravel()
        dy = np.asarray(yarr, dtype=float).ravel()
        r = np.sqrt(dx**2 + dy**2)

    n = dx.size
    for name, arr in (("dy", dy), ("r", r), ("std_dx", std_dx), ("std_dy", std_dy), ("std_r", std_r)):
        if arr is not None and arr.size != n:
            raise ValueError(f"{name} must match dx length; got {arr.size} vs {n}")

    m = np.isfinite(dx) & np.isfinite(dy)
    want_std = kind == "timeseries" and uncertainty != "none"
    if kind == "timeseries" and include_r and r is not None:
        m &= np.isfinite(r)
    if want_std:
        for arr in (std_dx, std_dy):
            if arr is not None:
                m &= np.isfinite(arr)
        if include_r and r is not None and std_r is not None:
            m &= np.isfinite(std_r)

    dxp, dyp = dx[m], dy[m]
    rp = r[m] if (r is not None and include_r) else None
    sdxp = std_dx[m] if (std_dx is not None and want_std) else None
    sdyp = std_dy[m] if (std_dy is not None and want_std) else None
    sdrp = std_r[m] if (std_r is not None and want_std and rp is not None) else None
    t = np.arange(dxp.size, dtype=float)

    if kind == "trajectory":
        fig, ax = plt.subplots(figsize=(6.0, 6.0))
        if show_path:
            ax.plot(dxp, dyp, linewidth=1.0, color="black")
        sc = ax.scatter(
            dxp, dyp, c=t, cmap=cmap, s=35, zorder=3, edgecolors="black", linewidths=0.5
        )
        ax.set_xlabel(f"dx ({unit_px})")
        ax.set_ylabel(f"dy ({unit_px})")
        ax.set_title(
            title if title is not None else f"speckle displacement ({temporal})",
            fontsize=15 * k,
        )
        ax.set_aspect(1)
        divider = make_axes_locatable(ax)
        cax = divider.append_axes("right", size="4%", pad=0.08)
        fig.colorbar(sc, cax=cax)
        ax.grid(True, alpha=0.3)
        return fig

    if kind != "timeseries":
        raise ValueError(f"unknown kind={kind!r}")

    fig, axes = plt.subplots(nrows=3, ncols=1, sharex=True, figsize=(8.0, 7.0))
    colors = ["darkred", "olive", "steelblue"]
    _draw_series(axes[0], t, dxp, color=colors[0], ylabel=f"dx ({unit_px})",
                 uncertainty=uncertainty, ystd=sdxp)
    _draw_series(axes[1], t, dyp, color=colors[1], ylabel=f"dy ({unit_px})",
                 uncertainty=uncertainty, ystd=sdyp)
    _draw_series(axes[2], t, rp, color=colors[2], ylabel=f"r ({unit_px})",
                 uncertainty=uncertainty, ystd=sdrp)
    axes[-1].set_xlabel("(frame)")
    fig.suptitle(
        title if title is not None else f"speckle displacement ({temporal})",
        fontsize=15 * k,
    )
    fig.tight_layout()
    return fig


def plt_stack_metric(
    stack_stats: dict,
    metric_path: str | Sequence[str],
    *,
    scope: _StatsScope = "full",
    uncertainty: _Uncertainty = "none",
    cmap: str = "tab10",
    color: str = "darkred",
    markers: Sequence[str] | None = None,
    k: float = 1.0,
    title: str | None = None,
) -> Figure:
    """Metric time series from *_stack_stats output: one full-image curve,
    the 9 labeled tile curves, or both."""
    start_plotting(k)

    if not isinstance(stack_stats, dict):
        raise TypeError("stack_stats must be a dict")
    meta = stack_stats.get("meta")
    if not isinstance(meta, dict):
        raise ValueError("stack_stats must contain dict key 'meta'")

    group, metric = _metric_path(metric_path)

    unit = None
    units = meta.get("units", {})
    if isinstance(units, dict) and isinstance(units.get(group), dict):
        unit = units[group].get(metric)
    ylabel = f"{metric} ({unit})" if isinstance(unit, str) and unit.strip() else metric

    fig, ax = plt.subplots(nrows=1, ncols=1, sharex=True, figsize=(9.0, 3.0))

    if title is None:
        scope_titles = {
            "full": "from full image",
            "tiles": "from tiled image",
            "both": "from tiled + full image",
        }
        if scope not in scope_titles:
            raise ValueError(f"unknown scope={scope!r}")
        title = f"{metric} {scope_titles[scope]}"

    ax.set_title(title, fontsize=15 * k)
    ax.set_xlabel("(frame)")
    ax.set_ylabel(ylabel)
    ax.grid(True, alpha=0.3)

    def full_series() -> tuple[np.ndarray, np.ndarray]:
        full = stack_stats.get("full")
        if not isinstance(full, dict):
            raise ValueError("stack_stats must contain dict key 'full'")
        group_block = full.get(group)
        if not isinstance(group_block, dict):
            raise KeyError(f"full has no group {group!r}")
        y = group_block.get(metric)
        if not isinstance(y, np.ndarray):
            raise ValueError(
                f"Expected full[{group!r}][{metric!r}] as numpy array; got {type(y)}"
            )
        if y.ndim != 1:
            raise ValueError(
                f"Expected 1D time series for full[{group!r}][{metric!r}]; got shape={y.shape!r}"
            )
        t = np.arange(y.size, dtype=float)
        m = np.isfinite(y)
        return t[m], y[m]

    if scope == "full":
        tp, yp = full_series()
        ystd = None if uncertainty == "none" else float(np.nanstd(yp))
        _draw_series(ax, tp, yp, color=color, ylabel=ylabel,
                     uncertainty=uncertainty, ystd=ystd)
        if tp.size > 1:
            xmin, _ = ax.get_xlim()
            ax.set_xlim(xmin, 1.18 * tp[-1])
        return fig

    if scope not in ("tiles", "both"):
        raise ValueError(f"unknown scope={scope!r}")

    tiles = stack_stats.get("tiles")
    if not isinstance(tiles, dict):
        raise ValueError("stack_stats must contain dict key 'tiles' for scope='tiles'/'both'")
    group_block = tiles.get(group)
    if not isinstance(group_block, dict):
        raise KeyError(f"tiles has no group {group!r}")
    metric_block = group_block.get(metric)
    if not isinstance(metric_block, dict):
        raise KeyError(f"tiles[{group!r}] has no metric {metric!r}")

    mean = metric_block.get("mean")
    std = metric_block.get("std")
    if not isinstance(mean, np.ndarray) or mean.ndim != 3 or mean.shape[1:] != (3, 3):
        raise ValueError(
            f"Expected tiles[{group!r}][{metric!r}]['mean'] with shape (T,3,3); "
            f"got {type(mean)} shape={getattr(mean, 'shape', None)!r}"
        )
    if uncertainty != "none":
        if not isinstance(std, np.ndarray) or std.shape != mean.shape:
            raise ValueError(
                f"Expected tiles[{group!r}][{metric!r}]['std'] with shape {mean.shape!r}; "
                f"got {type(std)} shape={getattr(std, 'shape', None)!r}"
            )
    else:
        std = None

    t_all = np.arange(mean.shape[0], dtype=float)
    labels = _tile_labels(meta)

    if markers is None:
        markers = ("o", "s", "^", "v", "D", "P", "X", "<", ">")
    if len(markers) < 9:
        raise ValueError("markers must have length >= 9 (tiles mode)")

    cmap_obj = plt.get_cmap(cmap)
    colors = [cmap_obj(i / 8) for i in range(9)]

    idx = 0
    for iy in range(3):
        for ix in range(3):
            y = mean[:, iy, ix].astype(float, copy=False)
            ystd_arr = std[:, iy, ix].astype(float, copy=False) if std is not None else None
            m = np.isfinite(y)
            if ystd_arr is not None:
                m &= np.isfinite(ystd_arr)
            if np.any(m):
                _draw_series(
                    ax, t_all[m], y[m],
                    color=colors[idx], ylabel=ylabel, label=str(labels[iy, ix]),
                    uncertainty=uncertainty,
                    ystd=ystd_arr[m] if ystd_arr is not None else None,
                    marker=str(markers[idx]), markersize=3.0,
                )
            idx += 1

    if scope == "both":
        tp, yp = full_series()
        _draw_series(ax, tp, yp, color="black", ylabel=ylabel, label="full",
                     uncertainty="none", ystd=None, marker="x", markersize=4.0)

    if mean.shape[0] > 1:
        xmin, _ = ax.get_xlim()
        ax.set_xlim(xmin, 1.18 * t_all[-1])

    ax.legend(loc="center right", fontsize=9 * k, framealpha=0.85)
    return fig


def plt_tiles_metric_stack(
    stack: np.ndarray,
    stack_stats: dict,
    metric_path: str | Sequence[str],
    save_path: str,
    *,
    frames: Sequence[int] | None = None,
    fps: float = 5.0,
    vmin: float | None = None,
    vmax: float | None = None,
    k: float = 1.0,
    **tile_kwargs,
) -> list[str]:
    """Render the per-frame 3x3 tile overlay of a *_stack_stats result as an
    animated GIF (``save_path`` ending in .gif) or a PNG sequence
    (``save_path`` used as ``<stem>_%04d.png``). Extends the single-image
    :func:`plt_tiles_metric` to stacks (no reference counterpart).

    The colour scale is fixed across frames (global stack min/max unless
    vmin/vmax are given) so intensity changes stay comparable. Returns the
    list of file paths written.
    """
    from pathlib import Path

    from PIL import Image

    from .image import plt_tiles_metric

    meta = stack_stats.get("meta")
    tiles = stack_stats.get("tiles")
    if not isinstance(meta, dict) or not isinstance(tiles, dict):
        raise ValueError("stack_stats must contain dict keys 'meta' and 'tiles'")
    group, metric = _metric_path(metric_path)
    metric_block = tiles.get(group, {}).get(metric)
    if not isinstance(metric_block, dict):
        raise KeyError(f"tiles[{group!r}] has no metric {metric!r}")
    mean = metric_block.get("mean")
    std = metric_block.get("std")
    if not (isinstance(mean, np.ndarray) and mean.ndim == 3 and mean.shape[1:] == (3, 3)):
        raise ValueError(
            f"Expected tiles[{group!r}][{metric!r}]['mean'] with shape (T,3,3); "
            f"got shape={getattr(mean, 'shape', None)!r}"
        )
    T = mean.shape[0]
    if stack.ndim != 3 or stack.shape[0] != T:
        raise ValueError(
            f"stack must be (T,H,W) with T={T}; got shape={getattr(stack, 'shape', None)!r}"
        )
    idx = list(range(T)) if frames is None else [int(t) for t in frames]

    if vmin is None or vmax is None:
        # per-frame running extrema: list-indexing the stack would both
        # materialise an out-of-core source in full and reject lazy frame
        # sequences outright
        lo = np.inf
        hi = -np.inf
        for t in idx:
            frame = np.asarray(stack[t], dtype=float)
            lo = min(lo, float(np.nanmin(frame)))
            hi = max(hi, float(np.nanmax(frame)))
        if vmin is None:
            vmin = lo
        if vmax is None:
            vmax = hi

    user_title = tile_kwargs.pop("title", None)
    images: list[Image.Image] = []
    for t in idx:
        frame_stats = {
            "meta": meta,
            "tiles": {group: {metric: {
                "mean": np.asarray(mean[t]),
                "std": np.asarray(std[t]) if isinstance(std, np.ndarray) else None,
            }}},
        }
        fig = plt_tiles_metric(
            np.asarray(stack[t], dtype=float), frame_stats, (group, metric),
            vmin=vmin, vmax=vmax, k=k,
            title=f"{user_title} — frame {t}" if user_title else f"{metric} — frame {t}",
            **tile_kwargs,
        )
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
        plt.close(fig)
        images.append(Image.fromarray(buf))

    out = Path(save_path)
    if out.suffix.lower() == ".gif":
        out.parent.mkdir(parents=True, exist_ok=True)
        images[0].save(
            out, save_all=True, append_images=images[1:],
            duration=max(1, int(round(1000.0 / fps))), loop=0,
        )
        return [str(out)]

    stem = out.with_suffix("")
    stem.parent.mkdir(parents=True, exist_ok=True)
    paths = []
    for t, im in zip(idx, images):
        p = stem.parent / f"{stem.name}_{t:04d}.png"
        im.save(p)
        paths.append(str(p))
    return paths


def plt_displacement_field(
    field: dict,
    *,
    frame: int | None = None,
    k: float = 1.0,
    cmap: str = "viridis",
    quiver_step: int = 1,
    quiver_color: str = "white",
    title: str | None = None,
) -> Figure:
    """Dense displacement field (signal.track_displacement_field /
    track_displacement_stack output): |d| magnitude map with a quiver
    overlay of the (dx, dy) vectors at the grid nodes.

    ``frame`` selects one frame of a displacement_stack result;
    ``quiver_step`` thins the arrow grid for dense fields.
    """
    dy = np.asarray(field["dy"], dtype=float)
    dx = np.asarray(field["dx"], dtype=float)
    if dy.ndim == 3:
        if frame is None:
            raise ValueError(
                "field holds a (T, gy, gx) displacement stack: pass frame=."
            )
        dy = dy[int(frame)]
        dx = dx[int(frame)]
    elif frame is not None:
        raise ValueError("frame= is only meaningful for displacement stacks.")
    if dy.ndim != 2:
        raise ValueError(f"expected 2D displacement maps; got ndim={dy.ndim}")

    ys = np.asarray(field.get("y", np.arange(dy.shape[0])), dtype=float)
    xs = np.asarray(field.get("x", np.arange(dy.shape[1])), dtype=float)
    mag = np.hypot(dy, dx)

    start_plotting(k)
    fig, ax = plt.subplots()
    # half-step margins so each magnitude CELL is centred on its node — the
    # quiver arrows sit at node coordinates, not cell corners
    hx = 0.5 * (1.0 if xs.size == 1 else float(np.mean(np.diff(xs))))
    hy = 0.5 * (1.0 if ys.size == 1 else float(np.mean(np.diff(ys))))
    im = ax.imshow(
        mag,
        origin="lower",
        cmap=cmap,
        extent=(xs[0] - hx, xs[-1] + hx, ys[0] - hy, ys[-1] + hy),
        aspect="equal",
    )
    q = max(1, int(quiver_step))
    ax.quiver(
        xs[::q],
        ys[::q],
        dx[::q, ::q],
        dy[::q, ::q],
        color=quiver_color,
        angles="xy",
        width=0.003,
    )
    divider = make_axes_locatable(ax)
    cax = divider.append_axes("right", size="4%", pad=0.08)
    fig.colorbar(im, cax=cax, label="|d| [px]")
    ax.set_xlabel("x [px]")
    ax.set_ylabel("y [px]")
    ax.set_title(title or "displacement field")
    fig.tight_layout()
    return fig
