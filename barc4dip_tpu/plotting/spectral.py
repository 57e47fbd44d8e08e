# SPDX-License-Identifier: CECILL-2.1
"""Spectral plotting: 1D radial/spectral curves and 2D magnitude/phase maps.

API parity with reference plotting/spectral.py:19-625 (plt_spectrum1d,
plt_spectrum2d).
"""
from __future__ import annotations

import matplotlib.pyplot as plt
import numpy as np
from matplotlib.colors import LogNorm
from matplotlib.figure import Figure

from .style import resolve_cmap, start_plotting

__all__ = ["plt_spectrum1d", "plt_spectrum2d"]


def _check_monotonic(x: np.ndarray, name: str) -> None:
    d = np.diff(x)
    if np.any(d == 0.0) or not (np.all(d > 0.0) or np.all(d < 0.0)):
        raise ValueError(f"{name} must be strictly monotonic")


def plt_spectrum1d(
    curve: np.ndarray,
    axis: np.ndarray,
    title: str | None = None,
    *,
    k: float = 1.0,
    xlabel: str = "radius",
    ylabel: str = "value",
    xmin: float | None = None,
    xmax: float | None = None,
    ymin: float | None = None,
    ymax: float | None = None,
    logx: bool = False,
    logy: bool = False,
    cumulative: bool = False,
    percentiles: tuple[float, ...] | None = None,
    mask_center: bool = False,
) -> Figure:
    """Plot a 1D spectral curve (radial mean of FFT/PSD/autocorr maps) with
    optional log axes, trapezoid-CDF overlay and percentile markers.
    ``mask_center=True`` drops the first two samples."""
    if not isinstance(axis, np.ndarray):
        raise TypeError("plt_spectrum1d expects axis as a numpy.ndarray")
    if not isinstance(curve, np.ndarray):
        raise TypeError("plt_spectrum1d expects curve as a numpy.ndarray")
    if axis.ndim != 1:
        raise ValueError(f"plt_spectrum1d expects a 1D axis; got shape={axis.shape!r}")
    if curve.ndim != 1:
        raise ValueError(f"plt_spectrum1d expects 1D curve; got shape={curve.shape!r}")
    if axis.size != curve.size:
        raise ValueError(
            f"plt_spectrum1d expects axis and curve with the same length; "
            f"got {axis.size} and {curve.size}"
        )
    if not np.issubdtype(axis.dtype, np.number) or not np.issubdtype(curve.dtype, np.number):
        raise TypeError("plt_spectrum1d expects numeric arrays")

    m = np.isfinite(axis) & np.isfinite(curve)
    if not np.any(m):
        raise ValueError("plt_spectrum1d expects at least one finite sample")

    x = np.asarray(axis[m], dtype=float)
    y = np.asarray(curve[m], dtype=float)
    if mask_center:
        x, y = x[2:], y[2:]
    if x.size < 2:
        raise ValueError("plt_spectrum1d expects at least two finite samples")
    _check_monotonic(x, "axis")
    if logx and np.any(x <= 0.0):
        raise ValueError("logx=True requires strictly positive axis values")

    start_plotting(k)
    fig, ax = plt.subplots(figsize=(7.0, 4.5))

    y_plot = y.copy()
    if logy:
        y_plot = np.where(y_plot > 0.0, y_plot, np.nan)
        if not np.any(np.isfinite(y_plot)):
            raise ValueError("logy=True requires at least one strictly positive finite value")

    ax.plot(x, y_plot, color="steelblue", linewidth=1.5)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    if title:
        ax.set_title(title, fontsize=15 * k)

    if xmin is not None or xmax is not None:
        ax.set_xlim(
            left=float(x[0]) if xmin is None else float(xmin),
            right=float(x[-1]) if xmax is None else float(xmax),
        )
    if logx:
        ax.set_xscale("log")
    if logy:
        ax.set_yscale("log")
        if ymin is None:
            positive = y_plot[np.isfinite(y_plot) & (y_plot > 0.0)]
            if positive.size > 0:
                ax.set_ylim(bottom=max(0.5 * float(np.min(positive)), 1e-300))
        else:
            ax.set_ylim(bottom=ymin)
        if ymax is not None:
            ax.set_ylim(top=ymax)
    else:
        if ymin is not None:
            ax.set_ylim(bottom=ymin)
        if ymax is not None:
            ax.set_ylim(top=ymax)

    # normalized trapezoid cumulative integral (shared by percentiles + CDF)
    y_nonneg = np.clip(y, a_min=0.0, a_max=None)
    increments = 0.5 * (y_nonneg[:-1] + y_nonneg[1:]) * np.abs(np.diff(x))
    cdf = np.concatenate([[0.0], np.cumsum(increments)])
    if cdf[-1] > 0.0:
        cdf = cdf / cdf[-1]

    if percentiles is not None and len(percentiles) > 0:
        p = np.asarray(percentiles, dtype=float)
        if np.any((p < 0) | (p > 100)):
            raise ValueError("percentiles must be in [0, 100]")
        if cdf[-1] <= 0.0:
            raise ValueError("percentiles require a curve with positive cumulative integral")
        for xv in np.atleast_1d(np.interp(p / 100.0, cdf, x)):
            ax.axvline(float(xv), color="olive", linewidth=1.5)

    if cumulative:
        if logy:
            ax.grid(True, which="both", linestyle=":", linewidth=0.5)
        else:
            ax.grid(True, which="both", axis="x", linestyle=":", linewidth=0.5)
        ax2 = ax.twinx()
        ax2.plot(x, cdf, color="darkred", linewidth=1.5)
        ax2.set_ylabel("cumulative")
        ax2.set_ylim(-0.05, 1.05)
    else:
        ax.grid(True, which="both", linestyle=":", linewidth=0.5)

    return fig


def _resolve_axis(axis: np.ndarray | None, *, n: int, name: str) -> np.ndarray:
    if axis is None:
        return np.arange(n, dtype=float)
    out = np.asarray(axis, dtype=float)
    if out.ndim != 1:
        raise ValueError(f"{name} must be a 1D array; got ndim={out.ndim}")
    if out.size != n:
        raise ValueError(f"{name} must have length {n}; got {out.size}")
    if not np.all(np.isfinite(out)):
        raise ValueError(f"{name} contains non-finite values")
    if n > 1:
        _check_monotonic(out, name)
    return out


def _center_mask_inplace(data: np.ndarray) -> None:
    """NaN-mask the central block (4/5 px, parity-aware per axis)."""
    ny, nx = data.shape
    wd = 2
    data[(ny - wd) // 2 : ny // 2 + wd, (nx - wd) // 2 : nx // 2 + wd] = np.nan


def _imshow_extent(x: np.ndarray, y: np.ndarray) -> tuple[float, float, float, float]:
    dx = 1.0 if x.size == 1 else float(np.mean(np.diff(x)))
    dy = 1.0 if y.size == 1 else float(np.mean(np.diff(y)))
    return (
        float(x[0] - 0.5 * dx),
        float(x[-1] + 0.5 * dx),
        float(y[0] - 0.5 * dy),
        float(y[-1] + 0.5 * dy),
    )


def _plot_map(image, extent, cmap, norm, vmin, vmax, xlabel, ylabel, title,
              xmin, xmax, ymin, ymax, display_origin) -> Figure:
    fig = plt.figure()
    ax = fig.add_subplot(111)
    if display_origin == "upper":
        # keep row r on axis value y[r] whichever way the axis runs: an
        # ascending extent with origin="upper" would mirror the map against
        # its own tick labels and the central-cut figures
        left, right, bottom, top = extent
        extent = (left, right, top, bottom)
    im = ax.imshow(
        image,
        origin=display_origin,
        cmap=cmap,
        norm=norm,
        vmin=vmin,
        vmax=vmax,
        interpolation="none",
        aspect="equal",
        extent=extent,
    )
    ax.set_title(title)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    if xmin is not None:
        ax.set_xlim(left=xmin)
    if xmax is not None:
        ax.set_xlim(right=xmax)
    if ymin is not None:
        ax.set_ylim(bottom=ymin)
    if ymax is not None:
        ax.set_ylim(top=ymax)
    ax.grid(True, linestyle=":", linewidth=0.5)
    ax.tick_params(direction="in", top=True, right=True)
    cbar = plt.colorbar(im, ax=ax, fraction=0.046, pad=0.04)
    cbar.set_label(None)
    return fig


def _plot_cut(ax, axis, values, *, logy, xlabel, ylabel, title, xmin, xmax):
    vals = np.asarray(values, dtype=float)
    if logy:
        vals = np.where(vals > 0.0, vals, np.nan)
        ax.semilogy(axis, vals, color="darkred", lw=1.5)
    else:
        ax.plot(axis, vals, color="darkred", lw=1.5)
    ax.set_title(title)
    ax.set_xlabel(xlabel)
    if ylabel is not None:
        ax.set_ylabel(ylabel)
    ax.grid(True, linestyle=":", linewidth=0.5)
    ax.tick_params(direction="in", top=True, right=True)
    ax.set_xlim(
        float(axis[0]) if xmin is None else float(xmin),
        float(axis[-1]) if xmax is None else float(xmax),
    )


def plt_spectrum2d(
    data: np.ndarray,
    *,
    x: np.ndarray | None = None,
    y: np.ndarray | None = None,
    cuts: bool = True,
    show_phase: bool = True,
    log_intensity: bool = False,
    mask_center: bool = False,
    k: float = 1.0,
    cmap: str = "igor",
    vmin: float | None = None,
    vmax: float | None = None,
    xmin: float | None = None,
    xmax: float | None = None,
    ymin: float | None = None,
    ymax: float | None = None,
    xlabel: str = "x",
    ylabel: str = "y",
    title: str | None = None,
    display_origin: str = "lower",
) -> dict[str, Figure | None]:
    """Plot a 2D spectral map (magnitude + phase for complex input) and
    optionally its central cuts. Returns a dict of up to 4 figures:
    {"intensity", "intensity_cuts", "phase", "phase_cuts"}."""
    arr = np.asarray(data)
    if arr.ndim != 2:
        raise ValueError(f"data must be a 2D array; got shape={arr.shape!r}")

    ny, nx = arr.shape
    x_axis = _resolve_axis(x, n=nx, name="x")
    y_axis = _resolve_axis(y, n=ny, name="y")

    start_plotting(k)
    cmap_obj = resolve_cmap(cmap)
    extent = _imshow_extent(x_axis, y_axis)
    ix0, iy0 = nx // 2, ny // 2

    out: dict[str, Figure | None] = {
        "intensity": None,
        "intensity_cuts": None,
        "phase": None,
        "phase_cuts": None,
    }

    is_complex = np.iscomplexobj(arr)
    intensity = np.abs(arr) if is_complex else np.asarray(arr, dtype=float)
    intensity_plot = intensity.copy()
    if mask_center:
        _center_mask_inplace(intensity_plot)

    if log_intensity:
        positive = intensity_plot[np.isfinite(intensity_plot) & (intensity_plot > 0.0)]
        if positive.size == 0:
            raise ValueError(
                "log_intensity=True requires at least one strictly positive finite value"
            )
        vmin_eff = vmin if (vmin is not None and vmin > 0.0) else float(np.min(positive))
        vmax_eff = vmax if (vmax is not None and vmax > vmin_eff) else float(np.max(positive))
        norm = LogNorm(vmin=vmin_eff, vmax=vmax_eff)
        vmin_use = vmax_use = None
        intensity_map = np.where(intensity_plot > 0.0, intensity_plot, np.nan)
    else:
        norm, vmin_use, vmax_use = None, vmin, vmax
        intensity_map = intensity_plot

    intensity_title = title if title is not None else (
        "Magnitude - |A|" if is_complex else "Intensity - |A|$^2$"
    )

    out["intensity"] = _plot_map(
        intensity_map, extent, cmap_obj, norm, vmin_use, vmax_use,
        xlabel, ylabel, intensity_title, xmin, xmax, ymin, ymax, display_origin,
    )

    if cuts:
        fig_cuts, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4), sharey=True)
        _plot_cut(ax1, x_axis, intensity_plot[iy0, :], logy=log_intensity,
                  xlabel=xlabel, ylabel=None, title="Hor. cut", xmin=xmin, xmax=xmax)
        _plot_cut(ax2, y_axis, intensity_plot[:, ix0], logy=log_intensity,
                  xlabel=ylabel, ylabel=None, title="Ver. cut", xmin=ymin, xmax=ymax)
        fig_cuts.tight_layout()
        out["intensity_cuts"] = fig_cuts

    if not (is_complex and show_phase):
        return out

    phase_map = np.angle(arr)
    if mask_center:
        phase_map = phase_map.copy()
        _center_mask_inplace(phase_map)

    phase_title = "Phase - $\\angle A$" if title is None else f"{title}"
    out["phase"] = _plot_map(
        phase_map, extent, "coolwarm", None, None, None,
        xlabel, ylabel, phase_title, xmin, xmax, ymin, ymax, display_origin,
    )

    if cuts:
        fig_pc, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4), sharey=True)
        _plot_cut(ax1, x_axis, phase_map[iy0, :], logy=False, xlabel=xlabel,
                  ylabel="rad", title=f"Hor. cut ({ylabel}=0)", xmin=xmin, xmax=xmax)
        _plot_cut(ax2, y_axis, phase_map[:, ix0], logy=False, xlabel=ylabel,
                  ylabel="rad", title=f"Ver. cut ({xlabel}=0)", xmin=ymin, xmax=ymax)
        fig_pc.tight_layout()
        out["phase_cuts"] = fig_pc

    return out
