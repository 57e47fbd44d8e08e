# SPDX-License-Identifier: CECILL-2.1
"""Plotting smoke tests (Agg backend): every public plot function renders."""
import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

from barc4dip_tpu.plotting import (
    plt_displacement,
    plt_histogram,
    plt_image,
    plt_spectrum1d,
    plt_spectrum2d,
    plt_stack_metric,
    plt_tiles_metric,
)
from tests.conftest import make_speckle


@pytest.fixture(autouse=True)
def _close_all():
    yield
    plt.close("all")


@pytest.fixture(scope="module")
def field():
    rng = np.random.default_rng(51)
    return make_speckle(rng, shape=(200, 240), grain_px=5.0)


def test_plt_image_variants(field):
    fig = plt_image(field, "title", cmap="srw", cbar_label="a.u.")
    assert fig is not None
    fig = plt_image(field, roi=(slice(20, 80), slice(30, 90)))
    assert fig is not None
    fig = plt_image(field, roi=np.s_[20:80, 30:90], roi_zoom=True, display_origin="upper")
    assert fig is not None
    with pytest.raises(ValueError):
        plt_image(np.zeros((2, 3, 4)))


def test_plt_tiles_metric(field):
    mean = np.arange(9, dtype=float).reshape(3, 3)
    std = np.ones((3, 3)) * 0.1
    stats = {
        "meta": {"display_origin": "lower", "units": {"grain": {"lx": "px"}}},
        "tiles": {"grain": {"lx": {"mean": mean, "std": std}}},
    }
    fig = plt_tiles_metric(field, stats, "grain.lx")
    assert fig is not None
    fig = plt_tiles_metric(field, stats, ("grain", "lx"), normalize=True, show_std=False)
    assert fig is not None
    with pytest.raises(KeyError):
        plt_tiles_metric(field, stats, "grain.bogus")


def test_plt_histogram(field):
    u16 = (field / field.max() * 40000).astype(np.uint16)
    fig = plt_histogram(u16, logy=True, cumulative=True, percentiles=(5.0, 95.0))
    assert fig is not None
    with pytest.raises(ValueError):
        plt_histogram(u16, bin_min=10, bin_max=5)


def test_plt_spectrum1d():
    r = np.linspace(0, 50, 200)
    curve = np.exp(-r / 10)
    fig = plt_spectrum1d(curve, r, logy=True, cumulative=True, percentiles=(50.0,))
    assert fig is not None
    fig = plt_spectrum1d(curve, r, mask_center=True)
    assert fig is not None
    with pytest.raises(ValueError):
        plt_spectrum1d(curve, r[:-1])


def test_plt_spectrum2d_real_and_complex(field):
    figs = plt_spectrum2d(field, cuts=True, log_intensity=True, mask_center=True)
    assert figs["intensity"] is not None
    assert figs["intensity_cuts"] is not None
    assert figs["phase"] is None

    F = np.fft.fftshift(np.fft.fft2(field))
    figs = plt_spectrum2d(F, cuts=True, show_phase=True)
    assert figs["phase"] is not None
    assert figs["phase_cuts"] is not None


def _fake_stack_stats(T=8):
    t = np.arange(T, dtype=float)
    mk = lambda v: v.astype(np.float32)
    return {
        "meta": {
            "kind": "speckle_stack_stats",
            "units": {"temporal": {"dx": "px"}, "amplitude": {"visibility": ""}},
        },
        "full": {"amplitude": {"visibility": np.linspace(0.9, 1.1, T)}},
        "tiles": {
            "amplitude": {
                "visibility": {
                    "mean": np.ones((T, 3, 3)) + t[:, None, None] * 0.01,
                    "std": np.full((T, 3, 3), 0.02),
                }
            }
        },
        "temporal": {
            "abs": {
                "dx": mk(np.cos(t)), "dy": mk(np.sin(t)), "r": mk(np.abs(t)),
                "std_dx": mk(np.full(T, 0.1)), "std_dy": mk(np.full(T, 0.1)),
                "std_r": mk(np.full(T, 0.1)),
            },
            "inc": {"dx": mk(t * 0), "dy": mk(t * 0), "r": mk(t * 0)},
        },
    }


def test_plt_displacement_modes():
    ss = _fake_stack_stats()
    assert plt_displacement(ss, kind="trajectory") is not None
    assert plt_displacement(ss, kind="timeseries", uncertainty="band") is not None
    assert plt_displacement(ss, temporal="inc", kind="timeseries") is not None
    assert plt_displacement(xarr=np.arange(5.0), yarr=np.arange(5.0)) is not None
    with pytest.raises(ValueError):
        plt_displacement(ss, xarr=np.arange(5.0), yarr=np.arange(5.0))
    with pytest.raises(ValueError):
        plt_displacement(xarr=np.arange(5.0), yarr=np.arange(5.0), uncertainty="band")


def test_plt_stack_metric_scopes():
    ss = _fake_stack_stats()
    assert plt_stack_metric(ss, "amplitude.visibility", scope="full") is not None
    assert plt_stack_metric(ss, "amplitude.visibility", scope="tiles", uncertainty="band") is not None
    assert plt_stack_metric(ss, ("amplitude", "visibility"), scope="both") is not None
    with pytest.raises(ValueError):
        plt_stack_metric(ss, "amplitude.visibility", scope="bogus")


def test_plt_tiles_metric_stack_gif_and_png(tmp_path):
    from barc4dip_tpu.metrics import speckle_stack_stats
    from barc4dip_tpu.plotting import plt_tiles_metric_stack

    rng = np.random.default_rng(17)
    base = make_speckle(rng, shape=(384, 384), grain_px=6.0).astype(np.float32)
    stack = np.stack([base * (1 + 0.05 * t) for t in range(3)])
    stats = speckle_stack_stats(
        stack, metrics="amplitude", tiles=True, verbose=False, frame_chunk=3
    )

    gif = tmp_path / "vis.gif"
    out = plt_tiles_metric_stack(stack, stats, "amplitude.visibility", str(gif), fps=2)
    assert out == [str(gif)] and gif.exists()
    from PIL import Image

    with Image.open(gif) as im:
        assert im.n_frames == 3

    pngs = plt_tiles_metric_stack(
        stack, stats, ("amplitude", "visibility"), str(tmp_path / "seq.png"),
        frames=[0, 2],
    )
    assert len(pngs) == 2
    assert pngs[0].endswith("seq_0000.png") and pngs[1].endswith("seq_0002.png")

    with pytest.raises(KeyError):
        plt_tiles_metric_stack(stack, stats, "amplitude.nope", str(gif))
    with pytest.raises(ValueError):
        plt_tiles_metric_stack(stack[:2], stats, "amplitude.visibility", str(gif))


def test_plt_displacement_field(tmp_path):
    from barc4dip_tpu.plotting import plt_displacement_field, savefig

    gy, gx = 9, 11
    field = {
        "dy": np.random.default_rng(0).normal(size=(gy, gx)),
        "dx": np.random.default_rng(1).normal(size=(gy, gx)),
        "y": np.linspace(20, 200, gy),
        "x": np.linspace(20, 240, gx),
    }
    fig = plt_displacement_field(field, quiver_step=2, title="test field")
    savefig(fig, str(tmp_path / "field.png"))
    assert (tmp_path / "field.png").exists()

    stack_field = {
        "dy": np.stack([field["dy"]] * 3),
        "dx": np.stack([field["dx"]] * 3),
        "y": field["y"], "x": field["x"],
    }
    fig = plt_displacement_field(stack_field, frame=1)
    assert fig is not None
    with pytest.raises(ValueError, match="frame="):
        plt_displacement_field(stack_field)
    with pytest.raises(ValueError, match="displacement stacks"):
        plt_displacement_field(field, frame=0)


def test_plt_radial_waterfall():
    from barc4dip_tpu.plotting import plt_radial_waterfall

    curves = np.abs(np.random.default_rng(3).normal(size=(6, 40))) + 0.1
    assert plt_radial_waterfall(curves, logz=True, zlabel="autocorr") is not None
    out = {"radial_interpolated": curves, "r_interpolated": np.linspace(0, 20, 40)}
    assert plt_radial_waterfall(out) is not None
    with pytest.raises(ValueError):
        plt_radial_waterfall(curves[0])
