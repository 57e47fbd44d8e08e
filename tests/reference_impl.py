# SPDX-License-Identifier: CECILL-2.1
"""Plain NumPy/SciPy formulations of the metric definitions, used as golden
references by the test suite.

Written against the documented algorithms (SURVEY.md §2.5-2.6) in this
file's own style, but NOT fully independent of the reference package: the
output contract pins some of its unpublished choices — the polar sampling
density ntheta = int(2*pi*180) (reference maths/radial.py:149), the
effective no-pad behavior of spectral entropy (reference
metrics/sharpness.py:590-591), and the walkers' clamped edge semantics —
so bugs inherent to those *documented-behavior* choices would not be
caught here. Structural/arithmetic mistakes in barc4dip_tpu still are.
"""
from __future__ import annotations

import numpy as np
from scipy import ndimage
from scipy.interpolate import RegularGridInterpolator


def pad_to_square(img, fill):
    H, W = img.shape
    N = max(H, W)
    out = np.full((N, N), fill, dtype=float)
    y0, x0 = (N - H) // 2, (N - W) // 2
    out[y0 : y0 + H, x0 : x0 + W] = img
    return out


def autocorr2d(a, remove_mean=True, standardize=False):
    a = np.asarray(a, dtype=float)
    if remove_mean:
        a = a - a.mean()
    if standardize:
        s = a.std()
        if s > 0:
            a = a / s
    c = np.fft.fftshift(np.fft.ifft2(np.abs(np.fft.fft2(a)) ** 2)).real
    m = np.max(np.abs(c))
    return c / m if m > 0 else c


def width_at_fraction(p, fraction, center_index=None):
    p = np.asarray(p, dtype=float)
    c = int(np.argmax(p)) if center_index is None else int(center_index)
    c = max(0, min(c, p.size - 1))
    thr = p[c] * fraction
    i_left = next((i for i in range(c, -1, -1) if p[i] < thr), None)
    i_right = next((i for i in range(c, p.size) if p[i] < thr), None)
    if i_left is None or i_right is None:
        return float(p.size), True
    # clamp the i_left == n-1 corner (negative peak at the last sample):
    # the flat fallback then applies, matching ops/widths.py
    y0, y1 = p[i_left], p[min(i_left + 1, p.size - 1)]
    x_left = float(i_left) if y1 == y0 else i_left + (thr - y0) / (y1 - y0)
    y0, y1 = p[i_right - 1], p[i_right]
    x_right = float(i_right) if y1 == y0 else (i_right - 1) + (thr - y0) / (y1 - y0)
    return float(x_right - x_left), False


def distance_at_fraction(p, fraction, peak_index=0):
    p = np.asarray(p, dtype=float)
    k0 = max(0, min(int(peak_index), p.size - 1))
    thr = p[k0] * fraction
    i_cross = next((i for i in range(k0, p.size) if p[i] < thr), None)
    if i_cross is None:
        return float(p.size), True
    if i_cross == k0:
        return 0.0, False
    y0, y1 = p[i_cross - 1], p[i_cross]
    x = float(i_cross) if y1 == y0 else (i_cross - 1) + (thr - y0) / (y1 - y0)
    return float(x - k0), False


def radial_mean_interpolated(z, fill_value=0.0):
    z = np.asarray(z, dtype=float)
    ny, nx = z.shape
    x = np.arange(nx, dtype=float) - nx // 2
    y = np.arange(ny, dtype=float) - ny // 2
    r_max = min(np.max(np.abs(x)), np.max(np.abs(y)))
    nr = int(np.floor(r_max)) + 1
    ntheta = int(2.0 * np.pi * 180.0)
    r = np.linspace(0.0, r_max, nr)
    theta = np.linspace(0.0, 2 * np.pi, ntheta, endpoint=False)
    R, T = np.meshgrid(r, theta, indexing="ij")
    pts = np.column_stack([(R * np.sin(T)).ravel(), (R * np.cos(T)).ravel()])
    interp = RegularGridInterpolator((y, x), z, bounds_error=False, fill_value=fill_value)
    vals = interp(pts).reshape(R.shape)
    return vals.mean(axis=1), r


def grain_metrics(img, fraction=1 / np.e):
    img = np.asarray(img, dtype=float)
    data = pad_to_square(img, img.mean())
    ac = autocorr2d(data, remove_mean=True, standardize=False)
    iy, ix = np.unravel_index(np.argmax(ac), ac.shape)
    ly, _ = width_at_fraction(ac[:, ix], fraction, iy)
    lx, _ = width_at_fraction(ac[iy, :], fraction, ix)
    rad, r = radial_mean_interpolated(ac)
    dr = r[1] - r[0]
    dist, _ = distance_at_fraction(rad, fraction, 0)
    leq = 2 * dist * dr
    return {"lx": lx, "ly": ly, "leq": leq, "r": lx / ly, "autocorr": ac}


def inverse_autocorr_width_metrics(img, fraction=1 / np.e):
    img = np.asarray(img, dtype=float)
    data = pad_to_square(img, img.mean())
    ac = autocorr2d(data, remove_mean=True, standardize=True)
    iy, ix = np.unravel_index(np.argmax(ac), ac.shape)
    ly, _ = width_at_fraction(ac[:, ix], fraction, iy)
    lx, _ = width_at_fraction(ac[iy, :], fraction, ix)
    rad, r = radial_mean_interpolated(ac)
    dr = r[1] - r[0]
    dist, _ = distance_at_fraction(rad, fraction, 0)
    leq = 2 * dist * dr
    return {"sx": 1 / lx, "sy": 1 / ly, "seq": 1 / leq, "r": lx / ly}


def amplitude_metrics(img):
    img = np.asarray(img, dtype=float)
    mu = np.nanmean(img)
    sigma = np.nanstd(img)
    vmin = np.nanpercentile(img, 0.05)
    vmax = np.nanpercentile(img, 99.95)
    return {"visibility": sigma / mu, "contrast": (vmax - vmin) / (vmax + vmin)}


def bandwidth_metrics(img):
    img = np.asarray(img, dtype=float)
    data = pad_to_square(img, img.mean())
    data = data - data.mean()
    N = data.shape[0]
    P = np.abs(np.fft.fftshift(np.fft.fft2(data))) ** 2 / (N * N)
    P[N // 2, N // 2] = 0.0

    f = np.fft.fftshift(np.fft.fftfreq(N))
    FX, FY = np.meshgrid(f, f, indexing="xy")
    FR = np.sqrt(FX**2 + FY**2)
    f_max = np.max(np.abs(f))
    mask = FR <= f_max

    Pm, FXm, FYm, FRm = P[mask], FX[mask], FY[mask], FR[mask]
    total = Pm.sum()
    feq = np.sqrt(np.sum(FRm**2 * Pm) / total)
    sig_fx = np.sqrt(np.sum(FXm**2 * Pm) / total)
    sig_fy = np.sqrt(np.sum(FYm**2 * Pm) / total)
    order = np.argsort(FRm, kind="stable")
    cdf = np.cumsum(Pm[order]) / total
    idx = min(int(np.searchsorted(cdf, 0.95, side="left")), FRm.size - 1)
    f95 = FRm[order][idx]
    p = Pm / total
    return {
        "feq": feq,
        "f95": f95,
        "sig_fx": sig_fx,
        "sig_fy": sig_fy,
        "rf": sig_fx / sig_fy,
        "spr": 1.0 / np.sum(p * p),
    }


def tenengrad_metrics(img, eps=1e-12):
    x = np.asarray(img, dtype=float)
    finite = np.isfinite(x)
    gx = ndimage.sobel(x, axis=1, mode="reflect")
    gy = ndimage.sobel(x, axis=0, mode="reflect")
    ex = np.mean((gx * gx)[finite])
    ey = np.mean((gy * gy)[finite])
    return {"tenengrad": ex + ey, "ex": ex, "ey": ey, "re": ex / (ey + eps)}


def laplacian_variance_metric(img):
    x = np.asarray(img, dtype=float)
    finite = np.isfinite(x)
    lap = ndimage.laplace(x, mode="reflect")
    return float(np.var(lap[finite], ddof=0))


def spectral_entropy_metric(img, eps=1e-30):
    x = np.asarray(img, dtype=float)
    x = x - x.mean()
    P = np.abs(np.fft.fftshift(np.fft.fft2(x))) ** 2
    cy, cx = P.shape[0] // 2, P.shape[1] // 2
    P[cy, cx] = 0.0
    s = P.sum()
    p = np.clip(P.ravel() / s, eps, None)
    M = p.size - 1
    return float(-np.sum(p * np.log(p)) / np.log(M))


def eigenvalues_metrics(img, k=5, eps=1e-30):
    x = np.asarray(img, dtype=float)
    energy = np.sqrt(np.sum(x * x))
    J = x / energy
    J = J - J.mean()
    M, N = J.shape
    s = np.linalg.svd(J, full_matrices=False, compute_uv=False)
    eig = (s * s) / (M * N - 1)
    k_use = min(k, eig.size)
    return {
        "eigenvalues": float(np.sum(eig[:k_use])),
        "e1": float(eig[0]),
        "e2": float(eig[1]) if eig.size > 1 else 0.0,
        "re": float(eig[0] / (eig[1] + eps)),
    }
