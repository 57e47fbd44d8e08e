# SPDX-License-Identifier: CECILL-2.1
"""Report + CLI end-to-end tests (Config A/B conformance path)."""
import numpy as np
import pytest

from barc4dip_tpu.io import save_h5, save_tiff
from barc4dip_tpu.metrics import sharpness_stats, speckle_stats
from barc4dip_tpu.report.cli import main
from barc4dip_tpu.report.markdown import logbook_report
from tests.conftest import make_speckle


@pytest.fixture(scope="module")
def field():
    rng = np.random.default_rng(41)
    return make_speckle(rng, shape=(400, 400), grain_px=5.0)


def test_logbook_speckles_sections(field):
    stats = speckle_stats(field, verbose=False)
    text = logbook_report(stats)
    assert text.startswith("# Speckle summary\n")
    assert "## Metadata" in text
    assert "- Image shape: 400 x 400 px" in text
    assert "- Image orientation: lower (detector-aligned, origin at bottom-left)" in text
    assert "- Tiles: tiles_3x3" in text
    assert "## Amplitude (full image)" in text
    assert "> visibility:" in text
    assert "## Grain (full image)" in text
    assert "## Moments (full image)" in text
    assert "## Bandwidth (full image)" in text
    assert "Visibility (tiles)" in text
    # 3x3 matrices: mean±std cells
    assert "±" in text
    # complete adds extra tile blocks
    text_c = logbook_report(stats, complete=True)
    assert "leq (tiles)" in text_c and "leq (tiles)" not in text
    # notes add explanations
    text_n = logbook_report(stats, notes=True)
    assert "Notes:" in text_n
    assert "Tile labels:" in text_n


def test_logbook_sharpness_sections(field):
    stats = sharpness_stats(field, verbose=False)
    text = logbook_report(stats, complete=True)
    assert text.startswith("# Sharpness summary\n")
    assert "## Tenengrad (full image)" in text
    assert "## Laplacian (full image)" in text
    assert "## Spectral entropy (full image)" in text
    assert "## Inverse autocorrelation width (full image)" in text
    assert "## Eigenvalues (full image)" in text
    # variance must be a number, not 'nan' (reference quirk fixed)
    line = next(l for l in text.splitlines() if l.startswith("> moments:"))
    assert "var=nan" not in line


def test_logbook_report_validation(field):
    with pytest.raises(TypeError):
        logbook_report("not a dict")
    with pytest.raises(ValueError):
        logbook_report({"full": {}})
    with pytest.raises(ValueError):
        logbook_report({"meta": {"kind": "bogus"}, "full": {}})


def test_logbook_write_to_file(field, tmp_path):
    stats = speckle_stats(field, metrics="amplitude", tiles=False, verbose=False)
    out = tmp_path / "report.md"
    text = logbook_report(stats, report_path=out)
    assert out.read_text(encoding="utf-8") == text
    with pytest.raises(FileNotFoundError):
        logbook_report(stats, report_path=tmp_path / "missing" / "r.md")


def test_cli_end_to_end_tiff(field, tmp_path, capsys):
    save_tiff(field.astype(np.float32) / field.max(), tmp_path / "speckle.tif")
    rc = main(["-s", str(tmp_path / "speckle.tif"), "-o", str(tmp_path / "rep.md")])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("# Speckle summary")
    # default groups: amplitude, grain, stats — no bandwidth
    assert "## Amplitude (full image)" in out
    assert "## Grain (full image)" in out
    assert "## Moments (full image)" in out
    assert "## Bandwidth (full image)" not in out
    assert (tmp_path / "rep.md").exists()


def test_cli_all_groups_and_no_tiles(field, tmp_path, capsys):
    save_tiff(field.astype(np.float32) / field.max(), tmp_path / "speckle.tif")
    rc = main(["-s", str(tmp_path / "speckle.tif"), "--all", "--no_tiles"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "## Bandwidth (full image)" in out
    assert "Visibility (tiles)" not in out


def test_cli_h5_with_flat_dark(tmp_path, capsys):
    rng = np.random.default_rng(42)
    base = make_speckle(rng, shape=(256, 256), grain_px=5.0).astype(np.float32)
    stack = np.stack([base, base * 1.1])
    flat = rng.normal(2000.0, 50.0, size=(256, 256)).astype(np.float32)
    save_h5(stack, tmp_path / "s.h5")
    save_tiff(flat, tmp_path / "flat.tif")

    rc = main(
        [
            "-s", str(tmp_path / "s.h5"),
            "-n", "1",
            "-f", str(tmp_path / "flat.tif"),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("# Speckle summary")
    assert "- Image shape: 256 x 256 px" in out


def test_logbook_stack_kind():
    """Stack dicts get a summary too (extension beyond the reference)."""
    stats = {
        "meta": {
            "kind": "speckle_stack_stats",
            "stack_shape": (5, 64, 64),
            "display_origin": "lower",
            "tracking": {"method": "template", "backend": "skimage",
                         "subpixel": True, "roi_size_yx": (31, 31),
                         "roi_step_yx": (16, 16)},
        },
        "full": {},
        "temporal": {
            "abs": {"dx": np.arange(5.0), "dy": np.zeros(5), "r": np.arange(5.0)},
            "inc": {"dx": np.ones(5), "dy": np.ones(5), "r": np.full(5, np.sqrt(2))},
        },
    }
    text = logbook_report(stats)
    assert "# Speckle stack summary" in text
    assert "## Tracking" in text
    assert "## Absolute displacement" in text


def test_batch_cli_h5_speckle(tmp_path, capsys):
    from barc4dip_tpu.report.batch_cli import main as batch_main

    rng = np.random.default_rng(43)
    base = make_speckle(rng, shape=(160, 160), grain_px=6.0).astype(np.float32)
    stack = np.stack([base * (1 + 0.01 * t) for t in range(4)])
    save_h5(stack, tmp_path / "run.h5")

    out_json = tmp_path / "summary.json"
    npz = tmp_path / "full.npz"
    report = tmp_path / "run.md"
    rc = batch_main([
        str(tmp_path / "run.h5"),
        "--metrics", "amplitude,stats",
        "--no-tiles",
        "--frame-chunk", "2",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--out", str(out_json),
        "--npz", str(npz),
        "--report", str(report),
    ])
    assert rc == 0

    import json

    summary = json.loads(out_json.read_text())
    assert summary["kind"] == "speckle_stack_stats"
    assert summary["n_frames"] == 4
    assert "tracking" in summary
    assert "amplitude.visibility" in summary["metric_series"]

    data = np.load(npz)
    assert data["temporal/abs/dx"].shape == (4,)
    assert report.read_text().startswith("# Speckle stack summary")
    assert list((tmp_path / "ckpt").glob("*.npz"))  # checkpoints written

    # resume path exercises checkpoint loads end-to-end
    rc = batch_main([
        str(tmp_path / "run.h5"), "--metrics", "amplitude,stats", "--no-tiles",
        "--frame-chunk", "2", "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--out", str(out_json),
    ])
    assert rc == 0


def test_batch_cli_sharpness_glob(tmp_path, capsys):
    from scipy.ndimage import gaussian_filter

    from barc4dip_tpu.report.batch_cli import main as batch_main

    rng = np.random.default_rng(44)
    base = make_speckle(rng, shape=(160, 160), grain_px=4.0)
    for t, s in enumerate((2.0, 0.0, 1.0)):
        save_tiff(
            (gaussian_filter(base, s) / base.max() * 30000).astype(np.float32),
            tmp_path / f"scan_{t}.tif",
        )

    rc = batch_main([str(tmp_path / "scan_*.tif"), "--kind", "sharpness",
                     "--metrics", "gradient", "--no-tiles"])
    assert rc == 0
    out = capsys.readouterr().out
    import json

    summary = json.loads(out)
    assert summary["kind"] == "sharpness_stack_stats"
    assert summary["focus"]["best_frame"] == 1


def test_batch_cli_search_radius(tmp_path, capsys):
    """--search-radius routes into windowed tracking and matches the
    default full-frame search on a drift-bounded stack."""
    import json

    from barc4dip_tpu.report.batch_cli import main as batch_main

    rng = np.random.default_rng(44)
    base = make_speckle(rng, shape=(160, 160), grain_px=6.0).astype(np.float32)
    stack = np.stack([np.roll(base, (t, -t), axis=(0, 1)) for t in range(3)])
    save_h5(stack, tmp_path / "run.h5")

    outs = {}
    for tag, extra in (("full", []), ("win", ["--search-radius", "12"])):
        out_json = tmp_path / f"{tag}.json"
        rc = batch_main([
            str(tmp_path / "run.h5"), "--metrics", "amplitude,stats",
            "--no-tiles", "--frame-chunk", "2", "--out", str(out_json),
        ] + extra)
        assert rc == 0
        outs[tag] = json.loads(out_json.read_text())
    t_full = outs["full"]["tracking"]
    t_win = outs["win"]["tracking"]
    for key in ("final_dy_px", "final_dx_px", "mean_r_px", "max_r_px"):
        np.testing.assert_allclose(t_win[key], t_full[key], atol=1e-5)


def test_batch_cli_register_removes_drift(tmp_path):
    """--register aligns a drifting stack before analysis: the summary
    carries the measured shifts and the residual tracking drops to ~0."""
    import json

    from barc4dip_tpu.report.batch_cli import main as batch_main

    rng = np.random.default_rng(45)
    base = make_speckle(rng, shape=(160, 160), grain_px=6.0).astype(np.float32)
    stack = np.stack([np.roll(base, (2 * t, -3 * t), axis=(0, 1)) for t in range(4)])
    save_h5(stack, tmp_path / "run.h5")

    outs = {}
    for tag, extra in (("raw", []), ("reg", ["--register", "first"])):
        out_json = tmp_path / f"{tag}.json"
        rc = batch_main([
            str(tmp_path / "run.h5"), "--metrics", "amplitude,stats",
            "--no-tiles", "--frame-chunk", "2", "--out", str(out_json),
        ] + extra)
        assert rc == 0
        outs[tag] = json.loads(out_json.read_text())

    # without registration the tracker sees the injected drift...
    assert outs["raw"]["tracking"]["max_r_px"] > 5.0
    # ...with it, the measured shifts are reported and the residual is ~0
    reg = outs["reg"]["registration"]
    assert reg["reference"] == "first"
    np.testing.assert_allclose(reg["final_dy_px"], 6.0, atol=0.05)
    np.testing.assert_allclose(reg["final_dx_px"], -9.0, atol=0.05)
    assert outs["reg"]["tracking"]["max_r_px"] < 0.1
    assert "registration" not in outs["raw"]


def test_batch_cli_flat_field(tmp_path):
    """--flat/--dark apply the calibration before analysis: a gain-field
    distortion of the visibility disappears after correction."""
    import json

    from barc4dip_tpu.report.batch_cli import main as batch_main

    rng = np.random.default_rng(46)
    base = make_speckle(rng, shape=(160, 160), grain_px=6.0).astype(np.float32)
    yy = np.linspace(0.5, 2.0, 160, dtype=np.float32)[:, None]
    gain = np.broadcast_to(yy, (160, 160)).copy()  # strong row-wise gain
    # detector-count levels so the TIFF uint16 conversion takes the
    # lossless clip path (mean > counts_threshold), not contrast-stretch
    dark = np.full((160, 160), 700.0, np.float32)
    stack = np.stack([base * (1 + 0.01 * t) * gain + dark for t in range(3)])
    save_h5(stack, tmp_path / "run.h5")
    save_tiff(gain * 100.0 + dark, tmp_path / "flat.tif")
    save_tiff(dark, tmp_path / "dark.tif")

    outs = {}
    for tag, extra in (
        ("raw", []),
        ("cal", ["--flat", str(tmp_path / "flat.tif"),
                 "--dark", str(tmp_path / "dark.tif")]),
    ):
        out_json = tmp_path / f"{tag}.json"
        rc = batch_main([
            str(tmp_path / "run.h5"), "--metrics", "amplitude,stats",
            "--no-tiles", "--frame-chunk", "2", "--out", str(out_json),
        ] + extra)
        assert rc == 0
        outs[tag] = json.loads(out_json.read_text())

    vis_raw = outs["raw"]["metric_series"]["amplitude.visibility"]["mean"]
    vis_cal = outs["cal"]["metric_series"]["amplitude.visibility"]["mean"]
    # the gain field inflates apparent visibility; the correction removes it
    vis_true = float(base.std() / base.mean())
    assert abs(vis_cal - vis_true) < 0.02
    assert abs(vis_raw - vis_true) > 0.1

    # a missing calibration file is a clean rc=2, not a traceback
    rc = batch_main([
        str(tmp_path / "run.h5"), "--flat", str(tmp_path / "nope.tif"),
    ])
    assert rc == 2


def test_logbook_wavefront_kinds(rng):
    """The extension kinds (displacement_field / wavefront_scan) format
    through the registry with displacement, quality, and wavefront blocks."""
    from barc4dip_tpu.models import WavefrontScanPipeline
    from barc4dip_tpu.signal import track_displacement_field

    base = make_speckle(rng, shape=(160, 160), grain_px=3.0).astype(np.float32)
    sample = np.roll(base, (2, -1), axis=(0, 1))

    field = track_displacement_field(sample, base, tile_size=25, step=16,
                                     search_radius=5)
    text = logbook_report(field)
    assert text.startswith("# Displacement field summary")
    assert "## Displacements" in text and "NCC peak" in text

    pipe = WavefrontScanPipeline(pixel_size=1e-6, distance=0.5,
                                 wavelength=1e-10, tile_size=25, step=16,
                                 search_radius=5)
    text = logbook_report(pipe(sample, base), notes=True)
    assert text.startswith("# Wavefront scan summary")
    assert "## Wavefront" in text and "phase PV" in text and "Notes:" in text

    from barc4dip_tpu.signal import wavefront_from_displacements

    wf = wavefront_from_displacements(field, pixel_size=1e-6, distance=0.5)
    assert logbook_report(wf).startswith("# Wavefront scan summary")
