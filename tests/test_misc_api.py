# SPDX-License-Identifier: CECILL-2.1
"""Coverage for remaining public surfaces: the generic host tiling executor,
profiling utilities, config knobs, version resolution."""
import time

import numpy as np
import pytest

import jax.numpy as jnp

from barc4dip_tpu import __version__
from barc4dip_tpu.metrics.common import (
    aggregate_subtiles_9x9_to_3x3,
    normalize_groups,
    split_edges,
    stack_time_series,
    tiled_scalar_fields,
)
from barc4dip_tpu.ops.momentscore import distribution_moments_core
from barc4dip_tpu.utils.profiling import StageTimer, annotate


def test_version_resolves():
    assert __version__ and __version__ != "0+unknown"


def test_tiled_scalar_fields_host_api(rng):
    """The reference-compatible generic executor: per-tile means must match
    direct evaluation on split_edges extents."""
    img = rng.normal(size=(100, 130)) * 10 + 50

    def compute(tile):
        out = distribution_moments_core(tile)
        return {"mean": out["mean"], "std": out["std"]}

    res = tiled_scalar_fields(img, tile_mode="tiles_3x3", compute_fn=compute)
    y_edges, x_edges = split_edges(100, 3), split_edges(130, 3)
    for r in range(3):
        for c in range(3):
            tile = img[y_edges[r][0] : y_edges[r][1], x_edges[c][0] : x_edges[c][1]]
            assert res["mean"]["mean"][r, c] == pytest.approx(tile.mean(), rel=1e-9)
    assert np.all(np.isnan(res["mean"]["std"]))  # direct 3x3 -> NaN std

    res9 = tiled_scalar_fields(img, tile_mode="subtiles_9x9", compute_fn=compute)
    assert np.all(np.isfinite(res9["mean"]["std"]))
    with pytest.raises(ValueError):
        tiled_scalar_fields(img, tile_mode="bogus", compute_fn=compute)


def test_aggregate_subtiles(rng):
    sub = rng.normal(size=(9, 9))
    mean, std = aggregate_subtiles_9x9_to_3x3(sub)
    block = sub[3:6, 3:6]
    assert mean[1, 1] == pytest.approx(block.mean())
    assert std[1, 1] == pytest.approx(block.std(ddof=0))
    with pytest.raises(ValueError):
        aggregate_subtiles_9x9_to_3x3(np.zeros((3, 3)))


def test_normalize_groups_errors():
    allg = {"a", "b"}
    assert normalize_groups("all", all_groups=allg, context="t") == allg
    assert normalize_groups("a, b", all_groups=allg, context="t") == allg
    with pytest.raises(ValueError):
        normalize_groups("c", all_groups=allg, context="t")
    with pytest.raises(TypeError):
        normalize_groups([1], all_groups=allg, context="t")
    with pytest.raises(TypeError):
        normalize_groups(3.5, all_groups=allg, context="t")


def test_stack_time_series_shapes():
    frames = [
        {"s": 1.0, "arr": np.zeros((2, 2)), "nested": {"x": 5}},
        {"s": 2.0, "arr": np.ones((2, 2)), "nested": {"x": 6}},
    ]
    out = stack_time_series(frames)
    assert out["s"].shape == (2,)
    assert out["arr"].shape == (2, 2, 2)
    assert out["nested"]["x"].tolist() == [5, 6]
    with pytest.raises(ValueError):
        stack_time_series([])


def test_stage_timer_accumulates():
    timer = StageTimer(sync=False)
    with timer.stage("a"):
        time.sleep(0.01)
    with timer.stage("a"):
        time.sleep(0.01)
    with timer.stage("b"):
        pass
    report = timer.report(log=False)
    assert report["a"] >= 0.02
    assert timer.counts["a"] == 2
    assert "b" in report


def test_annotate_context():
    with annotate("test-region"):
        x = jnp.sum(jnp.ones((8, 8)))
    assert float(x) == 64.0


def test_split_edges_properties():
    for length in (1, 7, 9, 100, 1001):
        for n in (1, 3, 9):
            if n > length:
                continue
            edges = split_edges(length, n)
            assert edges[0][0] == 0 and edges[-1][1] == length
            for (a, b), (c, d) in zip(edges, edges[1:]):
                assert b == c and b > a
    with pytest.raises(ValueError):
        split_edges(0, 3)


def test_review3_regressions(tmp_path, rng):
    """Regression pins for the io/signal/preprocessing review findings."""
    import jax.numpy as jnp
    from PIL import Image

    from barc4dip_tpu.io.edf import read_edf, save_edf
    from barc4dip_tpu.signal import spectral_summary, track_translation
    from barc4dip_tpu.utils.checkpoint import ChunkStore

    # EDF reads are writable even on the dtype-match fast path
    img = rng.normal(size=(16, 16)).astype(np.float32)
    save_edf(img, tmp_path / "w.edf")
    back = read_edf(str(tmp_path / "w.edf"))
    back += 1.0  # raises ValueError on a read-only frombuffer view
    np.testing.assert_allclose(back, img + 1.0, rtol=1e-6)

    # wrapped multi-page TIFF behind a .edf name: pages addressable by index
    pages = [Image.fromarray((np.full((8, 8), v)).astype(np.uint16)) for v in (1, 2, 3)]
    p = tmp_path / "marccd.edf"
    pages[0].save(p, format="TIFF", save_all=True, append_images=pages[1:])
    assert float(read_edf(str(p), index=2).mean()) == 3.0
    with pytest.raises(IndexError, match="has 3"):
        read_edf(str(p), index=3)

    # default dispatch works for method="template"; even templates track
    image = rng.normal(size=(64, 64))
    dy, dx, _, _ = track_translation(image[24:40, 24:40], image, method="template")
    assert abs(dy) < 0.01 and abs(dx) < 0.01  # subpixel-refined zero shift

    # complex input to the fused quick-look is rejected, not truncated
    with pytest.raises(ValueError, match="real-valued"):
        spectral_summary(jnp.ones((32, 32), jnp.complex64))

    # bare-array checkpoint chunks round-trip
    store = ChunkStore(tmp_path / "ck", "t", {"a": 1})
    store.save(0, np.arange(3))
    np.testing.assert_array_equal(store.load(0), np.arange(3))

    # preprocessing exports the full documented surface
    from barc4dip_tpu.preprocessing import (  # noqa: F401
        clahe, correct_distortion, distortion_map,
    )


def test_review4_regressions(rng):
    """Pins for the geometry/plotting/report review findings."""
    import matplotlib

    matplotlib.use("Agg")
    from barc4dip_tpu.geometry import crop_to_square_center
    from barc4dip_tpu.plotting import plt_image

    # even min_dim with constant > 1: largest odd square that FITS
    out = crop_to_square_center(np.zeros((10, 20)), constant=1.2)
    assert out.shape == (9, 9)
    with pytest.raises(ValueError, match="non-positive"):
        crop_to_square_center(np.zeros((10, 20)), constant=0.05)

    # display_origin="upper": the ROI rectangle must cover the rows it names
    img = np.zeros((100, 100))
    img[10:30, 40:60] = 1.0
    fig = plt_image(img, display_origin="upper", roi=(slice(10, 30), slice(40, 60)))
    (rect,) = [p for p in fig.axes[0].patches]
    # y axis runs downward (row coordinates): the rectangle sits at y=10..30
    assert rect.get_y() == 10.0 and rect.get_height() == 20.0
    lo, hi = fig.axes[0].get_ylim()
    assert lo > hi  # inverted axis: row 0 at the top


def test_dir_advertises_lazy_surface():
    import barc4dip_tpu as dip

    for name in ("metrics", "io", "speckle_stats", "logbook_report",
                 "read_image", "preprocessing"):
        assert name in dir(dip), name


def test_uti_edffile_compat_path():
    """User code importing the reference's vendored module path must keep
    working (reference io/uti_EdfFile.py:175)."""
    from barc4dip_tpu.io.uti_EdfFile import EdfFile
    from barc4dip_tpu.io.edf import EdfFile as Canonical

    assert EdfFile is Canonical
