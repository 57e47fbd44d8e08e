# SPDX-License-Identifier: CECILL-2.1
"""Image plotting: pixel-extent display, tile-metric overlays, histograms.

API parity with reference plotting/image.py:18-608 (plt_image,
plt_tiles_metric, plt_histogram).
"""
from __future__ import annotations

from typing import Literal, Sequence

import matplotlib.pyplot as plt
import numpy as np
from matplotlib.axes import Axes
from matplotlib.figure import Figure
from matplotlib.patches import Rectangle
from mpl_toolkits.axes_grid1 import make_axes_locatable

from .style import resolve_cmap, start_plotting

__all__ = ["plt_image", "plt_tiles_metric", "plt_histogram"]

_DEFAULT_LABELS = np.array(
    [["NW", "N", "NE"], ["W", "C", "E"], ["SW", "S", "SE"]], dtype=object
)


def _unit_step_slice(s: slice, *, n: int, name: str) -> slice:
    if not isinstance(s, slice):
        raise TypeError(f"{name} must be a slice; got {type(s)!r}")
    step = 1 if s.step is None else s.step
    if step != 1:
        raise ValueError(f"{name}.step must be 1 or None for a rectangular ROI; got {s.step!r}")
    start = 0 if s.start is None else int(s.start)
    stop = n if s.stop is None else int(s.stop)
    if start < 0:
        start += n
    if stop < 0:
        stop += n
    start = max(0, min(n, start))
    stop = max(0, min(n, stop))
    if stop < start:
        start, stop = stop, start
    return slice(start, stop, 1)


def _pixel_canvas(img: np.ndarray, *, fig_h: float = 5.0, origin: str = "lower"):
    """Figure + axes + an imshow extent that keeps NUMPY ROW COORDINATES on
    the y axis for either origin: with "upper" the extent is inverted
    (bottom=ny, top=0) so array row r displays at y=r — otherwise ROI
    rectangles/zooms drawn in slice coordinates would mark the vertically
    mirrored region."""
    ny, nx = img.shape
    fig, ax = plt.subplots(figsize=(fig_h * (nx / ny), fig_h))
    if origin == "upper":
        return fig, ax, (0.0, float(nx), float(ny), 0.0)
    return fig, ax, (0.0, float(nx), 0.0, float(ny))


def _draw_pixels(img, *, origin: str, cmap: str, vmin, vmax, k: float):
    """Shared imshow setup for the pixel-coordinate image plots."""
    start_plotting(k)
    fig, ax, extent = _pixel_canvas(img, origin=origin)
    im = ax.imshow(
        img,
        origin=origin,
        cmap=resolve_cmap(cmap),
        vmin=vmin,
        vmax=vmax,
        interpolation="none",
        aspect="equal",
        extent=extent,
    )
    ax.set_xlabel("x (px)")
    ax.set_ylabel("y (px)")
    return fig, ax, im


def _split_metric_path(metric_path) -> tuple[str, str]:
    """'grain.lx' / 'grain/lx' / ('grain', 'lx') -> (group, metric)."""
    if isinstance(metric_path, str):
        parts = tuple(p for p in metric_path.replace("/", ".").split(".") if p)
    else:
        parts = tuple(metric_path)
    if len(parts) != 2:
        raise ValueError("metric_path must be like ('grain','lx') or 'grain.lx'")
    return parts


def _metric_unit(meta: dict, group: str, metric: str):
    units = meta.get("units", {})
    if isinstance(units, dict) and isinstance(units.get(group), dict):
        return units[group].get(metric)
    return None


def _tile_grids(tiles: dict, group: str, metric: str, *, need_std: bool):
    """(3,3) mean/std grids for one tile metric, as float64."""
    group_block = tiles.get(group)
    if not isinstance(group_block, dict):
        raise KeyError(f"tiles has no group {group!r}")
    metric_block = group_block.get(metric)
    if not isinstance(metric_block, dict):
        raise KeyError(f"tiles[{group!r}] has no metric {metric!r}")

    def grid_or_none(name, required):
        g = metric_block.get(name)
        ok = isinstance(g, np.ndarray) and g.shape == (3, 3)
        if required and not ok:
            raise ValueError(
                f"tile {name} for {group}.{metric} must be a (3,3) array; "
                f"got {type(g).__name__} / shape {getattr(g, 'shape', None)!r}"
            )
        return g.astype(np.float64, copy=False) if ok else None

    return grid_or_none("mean", True), grid_or_none("std", need_std)

def _size_matched_colorbar(fig: Figure, ax: Axes, im, label: str | None) -> None:
    divider = make_axes_locatable(ax)
    cax = divider.append_axes("right", size="5%", pad=0.05)
    cbar = fig.colorbar(im, cax=cax)
    if label is not None:
        cbar.set_label(label)


def plt_image(
    img: np.ndarray,
    title: str | None = None,
    *,
    k: float = 1.0,
    vmin: float | None = None,
    vmax: float | None = None,
    cmap: str = "viridis",
    xmin: float | None = None,
    xmax: float | None = None,
    ymin: float | None = None,
    ymax: float | None = None,
    display_origin: Literal["upper", "lower"] = "lower",
    colorbar: bool = True,
    cbar_label: str | None = None,
    roi: slice | tuple[slice, slice] | None = None,
    roi_zoom: bool = False,
    roi_color: str = "orange",
    roi_lw: float = 1.75,
    roi_alpha: float = 0.95,
) -> Figure:
    """Plot a 2D image in pixel coordinates with an optional size-matched
    colorbar and an optional ROI rectangle/zoom (numpy slice convention)."""
    if img.ndim != 2:
        raise ValueError(f"plt_image needs a 2D array, not shape {img.shape!r}")

    fig, ax, im = _draw_pixels(
        img, origin=display_origin, cmap=cmap, vmin=vmin, vmax=vmax, k=k
    )
    if title:
        ax.set_title(title, fontsize=15 * k)

    if roi is not None:
        ny, nx = img.shape
        if isinstance(roi, tuple):
            if len(roi) != 2:
                raise ValueError("roi tuple must be (yslice, xslice)")
            ysl, xsl = roi
        else:
            ysl, xsl = roi, slice(None)
        ysl = _unit_step_slice(ysl, n=ny, name="roi[0] (yslice)")
        xsl = _unit_step_slice(xsl, n=nx, name="roi[1] (xslice)")

        if roi_zoom:
            ax.set_xlim(left=float(xsl.start), right=float(xsl.stop))
            if display_origin == "lower":
                ax.set_ylim(bottom=float(ysl.start), top=float(ysl.stop))
            else:
                ax.set_ylim(bottom=float(ysl.stop), top=float(ysl.start))
        else:
            ax.add_patch(
                Rectangle(
                    (float(xsl.start), float(ysl.start)),
                    float(xsl.stop - xsl.start),
                    float(ysl.stop - ysl.start),
                    fill=False,
                    edgecolor=roi_color,
                    linewidth=roi_lw,
                    alpha=roi_alpha,
                )
            )

    if xmin is not None or xmax is not None:
        ax.set_xlim(left=xmin, right=xmax)
    if ymin is not None or ymax is not None:
        ax.set_ylim(bottom=ymin, top=ymax)

    if colorbar:
        _size_matched_colorbar(fig, ax, im, cbar_label)
    return fig


def plt_tiles_metric(
    img: np.ndarray,
    stats: dict,
    metric_path: str | Sequence[str],
    *,
    title: str | None = None,
    k: float = 1.0,
    cmap: str = "gray",
    vmin: float | None = None,
    vmax: float | None = None,
    colorbar: bool = True,
    cbar_label: str | None = None,
    show_std: bool = True,
    fmt: str = "{:.2f}",
    normalize: bool = False,
    display_origin: Literal["upper", "lower"] | None = None,
) -> Figure:
    """Plot an image with an orange 3x3 grid and per-tile "LABEL / mean ± std"
    text boxes from a stats dict's tiles block. ``normalize=True`` divides the
    displayed values by the central (C) tile mean."""
    if not isinstance(img, np.ndarray) or img.ndim != 2:
        raise ValueError(
            f"plt_tiles_metric needs a 2D numpy image, not "
            f"{type(img).__name__} / shape {getattr(img, 'shape', None)!r}"
        )

    meta = stats.get("meta")
    tiles = stats.get("tiles")
    if not isinstance(meta, dict) or not isinstance(tiles, dict):
        raise ValueError("a stats dict with 'meta' and 'tiles' blocks is required")

    group, metric = _split_metric_path(metric_path)
    mean_disp, std_disp = _tile_grids(tiles, group, metric, need_std=show_std)
    unit = _metric_unit(meta, group, metric)

    if normalize:
        center = float(mean_disp[1, 1])
        if not np.isfinite(center):
            raise ValueError("normalize=True needs a finite central-tile mean")
        if np.isclose(center, 0.0):
            raise ValueError("normalize=True needs a nonzero central-tile mean")
        mean_disp = mean_disp / center
        if std_disp is not None:
            std_disp = std_disp / center
        metric_with_unit = f"{metric} [norm.]"
    else:
        metric_with_unit = (
            f"{metric} ({unit})" if isinstance(unit, str) and unit.strip() else metric
        )

    labels = meta.get("tile_labels")
    if not (isinstance(labels, np.ndarray) and labels.shape == (3, 3)):
        labels = _DEFAULT_LABELS

    origin = display_origin or meta.get("display_origin", "lower")
    if origin not in ("upper", "lower"):
        origin = "lower"

    fig, ax, im = _draw_pixels(
        img, origin=origin, cmap=cmap, vmin=vmin, vmax=vmax, k=k
    )
    ax.set_title(title if title is not None else metric_with_unit, fontsize=14 * k)

    x0, x1 = ax.get_xlim()
    y0, y1 = ax.get_ylim()
    edges_x = np.linspace(x0, x1, 4)
    edges_y = np.linspace(y1, y0, 4)

    for x in edges_x:
        ax.plot([x, x], [y1, y0], "-", lw=1.5, alpha=0.9, color="orange")
    for y in edges_y:
        ax.plot([x0, x1], [y, y], "-", lw=1.5, alpha=0.9, color="orange")

    box_style = dict(
        boxstyle="round,pad=0.25", facecolor="black", alpha=0.60,
        edgecolor="black", linewidth=0.0,
    )
    centers_x = 0.5 * (edges_x[:-1] + edges_x[1:])
    centers_y = 0.5 * (edges_y[:-1] + edges_y[1:])
    for iy, cy in enumerate(centers_y):
        for ix, cx in enumerate(centers_x):
            value = fmt.format(float(mean_disp[iy, ix]))
            if show_std:
                value += f" ± {fmt.format(float(std_disp[iy, ix]))}"
            ax.text(
                cx, cy, f"{labels[iy, ix]}\n{value}",
                ha="center", va="center", fontsize=10 * k,
                color="w", alpha=0.95, bbox=box_style,
            )

    if colorbar:
        _size_matched_colorbar(fig, ax, im, cbar_label)
    return fig


def plt_histogram(
    img: np.ndarray,
    title: str | None = None,
    *,
    k: float = 1.0,
    bin_min: int = 0,
    bin_max: int = 65536,
    ymin: float | None = None,
    ymax: float | None = None,
    logy: bool = False,
    cumulative: bool = False,
    density: bool = False,
    percentiles: tuple[float, ...] | None = None,
) -> Figure:
    """Histogram of finite pixel values with one bin per gray level, optional
    log-y, CDF twin axis and percentile markers."""
    if not isinstance(img, np.ndarray):
        raise TypeError("plt_histogram works on numpy arrays")
    if img.ndim != 2:
        raise ValueError(f"plt_histogram needs a 2D array, not shape {img.shape!r}")
    if not np.issubdtype(img.dtype, np.number):
        raise TypeError(f"plt_histogram needs numeric data, not dtype={img.dtype}")
    if bin_max <= bin_min:
        raise ValueError("bin_max must exceed bin_min")

    start_plotting(k)

    values = img.ravel()
    values = values[np.isfinite(values)]
    if values.size == 0:
        raise ValueError("histogram expects at least one finite value")

    if np.issubdtype(values.dtype, np.floating):
        values = np.clip(values, float(bin_min), float(bin_max))

    fig, ax = plt.subplots(figsize=(7.0, 4.5))
    counts, bin_edges, _ = ax.hist(
        values,
        bins=int(bin_max - bin_min),
        range=(bin_min, bin_max),
        histtype="step",
        linewidth=1.5,
        color="steelblue",
        alpha=1,
        density=density,
    )
    ax.set_xlabel("value")
    ax.set_ylabel("density" if density else "counts")
    ax.set_xlim(bin_min, bin_max)
    if title:
        ax.set_title(title, fontsize=15 * k)

    if logy:
        ax.set_yscale("log")
        ax.set_ylim(bottom=0.5 if ymin is None else ymin)
    else:
        ax.set_ylim(bottom=0.0 if ymin is None else ymin)
    if ymax is not None:
        ax.set_ylim(top=ymax)

    if percentiles is not None and len(percentiles) > 0:
        p = np.asarray(percentiles, dtype=float)
        if np.any((p < 0) | (p > 100)):
            raise ValueError("percentiles must be in [0, 100]")
        for x in np.atleast_1d(np.percentile(values, p)):
            ax.axvline(float(x), color="olive", linewidth=1.5)

    if cumulative:
        if logy:
            ax.grid(True, which="both", linestyle=":", linewidth=0.5)
        else:
            ax.grid(True, which="both", axis="x", linestyle=":", linewidth=0.5)
        ax2 = ax.twinx()
        cdf = np.cumsum(counts)
        if cdf.size > 0 and cdf[-1] > 0:
            cdf = cdf / cdf[-1]
        centers = 0.5 * (bin_edges[:-1] + bin_edges[1:])
        ax2.plot(centers, cdf, color="darkred", linewidth=1.5)
        ax2.set_ylabel("cumulative")
        ax2.set_ylim(-0.05, 1.05)
    else:
        ax.grid(True, which="both", linestyle=":", linewidth=0.5)

    return fig
