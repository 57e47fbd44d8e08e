# SPDX-License-Identifier: CECILL-2.1
"""Model-layer tests: pipelines end-to-end."""
import numpy as np
import pytest
from scipy.ndimage import gaussian_filter

from barc4dip_tpu.models import SharpnessScanPipeline, SpeckleStackPipeline
from barc4dip_tpu.report import logbook_report
from tests.conftest import make_speckle


def test_sharpness_scan_pipeline_finds_focus():
    rng = np.random.default_rng(101)
    base = make_speckle(rng, shape=(192, 192), grain_px=4.0)
    sigmas = [2.5, 1.0, 0.0, 1.5, 3.0]
    stack = np.stack([gaussian_filter(base, s) for s in sigmas]).astype(np.float32)

    pipe = SharpnessScanPipeline()
    out = pipe(stack)
    assert out["meta"]["focus"]["best_frame"] == 2
    text = logbook_report(out)
    assert "# Sharpness stack summary" in text
    assert "argmax=frame 2" in text


def test_speckle_stack_pipeline_with_flat_field():
    rng = np.random.default_rng(102)
    base = make_speckle(rng, shape=(192, 192), grain_px=6.0)
    stack = np.stack([base, base * 1.05]).astype(np.float32)
    flat = np.full((192, 192), 2.0, np.float32) + rng.normal(0, 0.01, (192, 192)).astype(np.float32)

    pipe = SpeckleStackPipeline(metrics="amplitude,stats", tiles=False)
    out = pipe(stack * 2.0, flats=flat * 1000.0)
    assert out["meta"]["kind"] == "speckle_stack_stats"
    assert np.all(np.isfinite(out["temporal"]["abs"]["dx"]))
    text = logbook_report(out)
    assert "# Speckle stack summary" in text


def test_out_of_core_hdf5_pipeline(tmp_path):
    """speckle_stack_stats streamed from disk chunk-by-chunk (h5py dataset
    through the lazily-slicing view) matches the in-RAM result."""
    from barc4dip_tpu.io import save_h5

    rng = np.random.default_rng(103)
    base = make_speckle(rng, shape=(160, 160), grain_px=6.0).astype(np.float32)
    stack = np.stack([base * (1 + 0.01 * t) for t in range(5)])
    path = tmp_path / "run.h5"
    save_h5(stack, path)

    pipe = SpeckleStackPipeline(metrics="amplitude,stats", tiles=False, frame_chunk=2)
    ooc = pipe.run_hdf5(path)
    ram = pipe(stack)

    for g in ram["full"]:
        for k in ram["full"][g]:
            np.testing.assert_allclose(ooc["full"][g][k], ram["full"][g][k], rtol=1e-6)
    for blk in ("abs", "inc"):
        np.testing.assert_allclose(
            ooc["temporal"][blk]["dx"], ram["temporal"][blk]["dx"], atol=1e-5
        )


def test_edf_sequence_pipeline(tmp_path, monkeypatch):
    """Out-of-core EDF scan-series analysis (native codec routing enabled)
    matches the in-RAM stack result."""
    from tests.test_io import _make_edf_bytes

    rng = np.random.default_rng(104)
    base = make_speckle(rng, shape=(160, 160), grain_px=6.0)
    frames = [(base * (1 + 0.01 * t)).astype(np.float32) for t in range(5)]
    paths = []
    for t, f in enumerate(frames):
        p = tmp_path / f"scan_{t:04d}.edf"
        p.write_bytes(_make_edf_bytes([f]))
        paths.append(str(p))

    monkeypatch.setenv("BARC4DIP_TPU_NATIVE_IO", "1")
    pipe = SpeckleStackPipeline(metrics="amplitude,stats", tiles=False, frame_chunk=2)
    ooc = pipe.run_edf_files(paths)
    ram = pipe(np.stack(frames))

    for g in ram["full"]:
        for k in ram["full"][g]:
            np.testing.assert_allclose(ooc["full"][g][k], ram["full"][g][k], rtol=1e-6)
    np.testing.assert_allclose(
        ooc["temporal"]["abs"]["dx"], ram["temporal"]["abs"]["dx"], atol=1e-5
    )


def test_run_files_mixed_tiff_edf(tmp_path, monkeypatch):
    """Streaming path over a mixed EDF/TIFF scan series matches in-RAM."""
    from PIL import Image

    from tests.test_io import _make_edf_bytes

    rng = np.random.default_rng(13)
    base = make_speckle(rng, shape=(96, 96), grain_px=5.0).astype(np.float32)
    frames = [(base * (1 + 0.01 * t)) for t in range(4)]
    paths = []
    for t, f in enumerate(frames):
        if t % 2 == 0:
            p = tmp_path / f"scan_{t:04d}.edf"
            p.write_bytes(_make_edf_bytes([f.astype(np.uint16)]))
        else:
            p = tmp_path / f"scan_{t:04d}.tif"
            Image.fromarray(f.astype(np.uint16)).save(p)
        paths.append(str(p))

    monkeypatch.setenv("BARC4DIP_TPU_NATIVE_IO", "1")
    pipe = SpeckleStackPipeline(metrics="amplitude", tiles=False, frame_chunk=2)
    ooc = pipe.run_files(paths)
    ram = pipe(np.stack([f.astype(np.uint16).astype(np.float32) for f in frames]))

    for k in ram["full"]["amplitude"]:
        np.testing.assert_allclose(
            ooc["full"]["amplitude"][k], ram["full"]["amplitude"][k], rtol=1e-6
        )


def test_sharpness_run_files_streaming(tmp_path):
    """SharpnessScanPipeline.run_files streams a TIFF focus scan out-of-core."""
    from PIL import Image
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(14)
    base = make_speckle(rng, shape=(160, 160), grain_px=4.0)
    paths = []
    for t, sig in enumerate((2.5, 0.0, 1.5)):
        a = (gaussian_filter(base, sig) / base.max() * 30000).astype(np.uint16)
        p = tmp_path / f"f{t:02d}.tif"
        Image.fromarray(a).save(p)
        paths.append(str(p))

    pipe = SharpnessScanPipeline(metrics="gradient", tiles=False, frame_chunk=2)
    out = pipe.run_files(paths)
    assert out["meta"]["focus"]["best_frame"] == 1
    ram = pipe(np.stack([np.asarray(Image.open(p)) for p in paths]))
    np.testing.assert_allclose(
        out["full"]["gradient"]["tenengrad"],
        ram["full"]["gradient"]["tenengrad"], rtol=1e-6,
    )


def test_wavefront_scan_pipeline(rng, tmp_path):
    """WavefrontScanPipeline: 2D and stack inputs, plus the file-sequence
    path with an explicit reference file."""
    from barc4dip_tpu.io import write_image
    from barc4dip_tpu.models import WavefrontScanPipeline

    base = make_speckle(rng, shape=(160, 160), grain_px=3.0).astype(np.float32)
    sample = np.roll(base, (2, -1), axis=(0, 1))
    pipe = WavefrontScanPipeline(
        pixel_size=1e-6, distance=0.5, tile_size=25, step=16, search_radius=5
    )

    single = pipe(sample, base)
    assert single["meta"]["kind"] == "wavefront_scan"
    np.testing.assert_allclose(single["dy"], 2.0, atol=0.1)
    np.testing.assert_allclose(single["dx"], -1.0, atol=0.1)
    assert single["wavefront"].shape == single["dy"].shape

    stack = np.stack([base, sample])
    stacked = pipe(stack)
    assert stacked["dy"].shape[0] == 2
    np.testing.assert_allclose(stacked["dy"][1], single["dy"], atol=1e-5)

    ref_path = tmp_path / "ref.tif"
    write_image(base, ref_path, verbose=False)
    paths = []
    for t, frame in enumerate(stack):
        p = tmp_path / f"f{t}.tif"
        write_image(frame, p, verbose=False)
        paths.append(str(p))
    from_files = pipe.run_files(paths, reference_path=str(ref_path))
    assert from_files["dy"].shape[0] == 2

    with pytest.raises(ValueError, match="positive"):
        WavefrontScanPipeline(pixel_size=0, distance=1)
    with pytest.raises(ValueError, match="reference"):
        pipe(sample)  # a single frame against itself measures nothing
    # merged meta keeps BOTH unit families
    assert single["meta"]["units"]["dy"] == "px"
    assert "wavefront" in single["meta"]["units"]


def test_pipelines_accept_device_resident_stacks():
    # jax.Array stacks pass through to the aggregators (which slice them
    # on device) — np.asarray here would force a silent device->host
    # download of the whole stack
    import jax.numpy as jnp

    from barc4dip_tpu.models.pipeline import (
        SharpnessScanPipeline,
        SpeckleStackPipeline,
    )

    rng = np.random.default_rng(44)
    base = make_speckle(rng, shape=(160, 160), grain_px=5.0).astype(np.float32)
    stack = np.stack([base * (1 + 0.03 * t) for t in range(4)])

    sp = SpeckleStackPipeline(tiles=False, frame_chunk=2)
    host = sp(stack)
    dev = sp(jnp.asarray(stack))
    np.testing.assert_array_equal(
        host["full"]["amplitude"]["visibility"],
        dev["full"]["amplitude"]["visibility"],
    )

    sh = SharpnessScanPipeline(metrics="gradient", tiles=False, frame_chunk=2)
    np.testing.assert_array_equal(
        sh(stack)["full"]["gradient"]["tenengrad"],
        sh(jnp.asarray(stack))["full"]["gradient"]["tenengrad"],
    )
