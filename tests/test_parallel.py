# SPDX-License-Identifier: CECILL-2.1
"""Multi-device tests on the fake 8-device CPU mesh: sharded stack pipelines
must match the single-device results exactly."""
import numpy as np
import pytest

import jax

from barc4dip_tpu.metrics import sharpness_stack_stats, speckle_stack_stats
from barc4dip_tpu.parallel import frame_mesh, frames_sharding, shard_frames
from tests.conftest import make_speckle


def _shifted_frame(field, dy, dx):
    ny, nx = field.shape
    fy = np.fft.fftfreq(ny)[:, None]
    fx = np.fft.fftfreq(nx)[None, :]
    return np.real(
        np.fft.ifft2(np.fft.fft2(field) * np.exp(-2j * np.pi * (fy * dy + fx * dx)))
    )


@pytest.fixture(scope="module")
def stack():
    rng = np.random.default_rng(61)
    base = make_speckle(rng, shape=(192, 192), grain_px=6.0)
    shifts = [
        (0.0, 0.0), (1.0, -0.5), (2.5, 1.0), (-1.0, 2.0),
        (0.5, 0.5), (3.0, -2.0), (-2.0, -1.5), (1.5, 2.5),
    ]
    return np.stack([_shifted_frame(base, dy, dx) for dy, dx in shifts])


def test_mesh_has_8_devices():
    mesh = frame_mesh()
    assert mesh.size == 8


def test_shard_frames_places_across_devices(stack):
    mesh = frame_mesh()
    arr, _ = np.broadcast_arrays(stack[:8], stack[:8])
    sharded = shard_frames(np.ascontiguousarray(arr, dtype=np.float32), mesh)
    assert sharded.sharding == frames_sharding(mesh)
    assert len(sharded.sharding.device_set) == 8


def test_sharpness_stack_sharded_matches_single(stack):
    mesh = frame_mesh()
    kwargs = dict(metrics="gradient,laplacian,stats", tiles=False, verbose=False)
    single = sharpness_stack_stats(stack, **kwargs)
    sharded = sharpness_stack_stats(stack, mesh=mesh, **kwargs)
    for g in single["full"]:
        for k in single["full"][g]:
            np.testing.assert_allclose(
                sharded["full"][g][k], single["full"][g][k], rtol=1e-12, atol=1e-12,
                err_msg=f"{g}/{k}",
            )


def test_speckle_stack_sharded_matches_single(stack):
    mesh = frame_mesh()
    kwargs = dict(
        metrics="amplitude,stats", tiles=False, verbose=False, frame_chunk=8
    )
    single = speckle_stack_stats(stack, **kwargs)
    sharded = speckle_stack_stats(stack, mesh=mesh, **kwargs)

    for g in single["full"]:
        for k in single["full"][g]:
            np.testing.assert_allclose(
                sharded["full"][g][k], single["full"][g][k], rtol=1e-12, atol=1e-12
            )
    # tracking results (incl. the t-1 chain across shard boundaries)
    for blk in ("abs", "inc"):
        for k in ("dx", "dy", "r"):
            np.testing.assert_allclose(
                sharded["temporal"][blk][k],
                single["temporal"][blk][k],
                rtol=1e-5,
                atol=1e-5,
                err_msg=f"{blk}/{k}",
            )


@pytest.fixture(scope="module")
def stack_256():
    """Large-enough frames that grain/bandwidth AND 3x3 tiling all engage
    (the tiling policy needs >=128 px per tile => >=384 px per side)."""
    rng = np.random.default_rng(62)
    base = make_speckle(rng, shape=(384, 384), grain_px=7.0)
    shifts = [(0.3 * t * np.cos(0.6 * t), 0.3 * t * np.sin(0.6 * t)) for t in range(11)]
    return np.stack([_shifted_frame(base, dy, dx) for dy, dx in shifts])


def _assert_stats_equal(sharded, single, *, skip=("autocorr",)):
    for section in ("full", "tiles"):
        if section not in single:
            assert section not in sharded
            continue
        for g, fields in single[section].items():
            for k, v in fields.items():
                if k in skip:
                    continue
                got = sharded[section][g][k]
                if isinstance(v, dict):  # tile {"mean","std"} blocks
                    for kk in v:
                        np.testing.assert_allclose(
                            np.asarray(got[kk]), np.asarray(v[kk]),
                            rtol=1e-10, atol=1e-10,
                            err_msg=f"{section}/{g}/{k}/{kk}",
                        )
                else:
                    np.testing.assert_allclose(
                        np.asarray(got), np.asarray(v), rtol=1e-10, atol=1e-10,
                        err_msg=f"{section}/{g}/{k}",
                    )


def test_speckle_stack_all_metrics_tiles_sharded(stack_256):
    """The FFT-heavy groups (grain, bandwidth) and the tile executor under
    the mesh, with T=11 NOT a multiple of the 8-device mesh (tail-padded
    chunks) — must match single-device bit-for-bit on metrics."""
    mesh = frame_mesh()
    kwargs = dict(metrics="all", tiles=True, verbose=False, frame_chunk=4)
    single = speckle_stack_stats(stack_256, **kwargs)
    sharded = speckle_stack_stats(stack_256, mesh=mesh, **kwargs)

    assert "tiles" in single and "tiles" in sharded
    _assert_stats_equal(sharded, single)
    for blk in ("abs", "inc"):
        for k in ("dx", "dy", "r"):
            np.testing.assert_allclose(
                sharded["temporal"][blk][k], single["temporal"][blk][k],
                rtol=1e-5, atol=1e-5, err_msg=f"{blk}/{k}",
            )
    # lazy per-frame autocorr maps: same values through either path
    np.testing.assert_allclose(
        np.asarray(sharded["full"]["grain"]["autocorr"][3]),
        np.asarray(single["full"]["grain"]["autocorr"][3]),
        rtol=1e-10, atol=1e-10,
    )
    assert sharded["full"]["grain"]["autocorr"].shape == (11, 384, 384)


def test_sharpness_stack_sharded_odd_T(stack_256):
    mesh = frame_mesh()
    kwargs = dict(metrics="all", tiles=True, verbose=False, frame_chunk=4)
    single = sharpness_stack_stats(stack_256, **kwargs)
    sharded = sharpness_stack_stats(stack_256, mesh=mesh, **kwargs)
    _assert_stats_equal(sharded, single)


def test_speckle_checkpoint_resume_under_mesh(stack_256, tmp_path):
    """A second run against a populated ChunkStore must reproduce the fresh
    sharded run exactly (chunk reload path + host re-derived prev tail)."""
    mesh = frame_mesh()
    kwargs = dict(
        metrics="amplitude,grain,stats", tiles=False, verbose=False,
        frame_chunk=4, mesh=mesh,
    )
    ckdir = tmp_path / "ck"
    fresh = speckle_stack_stats(stack_256, checkpoint_dir=ckdir, **kwargs)
    assert any(ckdir.rglob("*")), "checkpoint dir should be populated"
    resumed = speckle_stack_stats(stack_256, checkpoint_dir=ckdir, **kwargs)
    _assert_stats_equal(resumed, fresh)
    for blk in ("abs", "inc"):
        for k in ("dx", "dy"):
            np.testing.assert_allclose(
                resumed["temporal"][blk][k], fresh["temporal"][blk][k],
                rtol=1e-6, atol=1e-6, err_msg=f"{blk}/{k}",
            )


def test_sharded_tracking_recovers_shifts(stack):
    mesh = frame_mesh()
    out = speckle_stack_stats(
        stack, metrics="stats", tiles=False, verbose=False, mesh=mesh
    )
    dy = out["temporal"]["abs"]["dy"]
    dx = out["temporal"]["abs"]["dx"]
    np.testing.assert_allclose(
        dy, [0.0, 1.0, 2.5, -1.0, 0.5, 3.0, -2.0, 1.5], atol=0.25
    )
    np.testing.assert_allclose(
        dx, [0.0, -0.5, 1.0, 2.0, 0.5, -2.0, -1.5, 2.5], atol=0.25
    )


def test_speckle_stack_windowed_search_under_mesh(stack_256):
    """tracking_search_radius composes with frame-axis sharding: sharded
    windowed tracking matches the single-device full-frame search."""
    mesh = frame_mesh()
    kwargs = dict(metrics="amplitude,stats", tiles=False, verbose=False,
                  frame_chunk=4)
    single_full = speckle_stack_stats(stack_256, **kwargs)
    sharded_win = speckle_stack_stats(
        stack_256, mesh=mesh, tracking_search_radius=20, **kwargs
    )
    for blk in ("abs", "inc"):
        for k in ("dx", "dy"):
            np.testing.assert_allclose(
                sharded_win["temporal"][blk][k],
                single_full["temporal"][blk][k],
                rtol=0, atol=1e-5,
            )


def test_displacement_stack_round_robin_mesh(stack_256):
    """track_displacement_stack with a mesh round-robins frames across
    devices and matches the single-device result exactly."""
    from barc4dip_tpu.signal import track_displacement_stack

    mesh = frame_mesh()
    sub = np.ascontiguousarray(stack_256[:5], dtype=np.float64)
    kw = dict(tile_size=25, step=24, search_radius=5, method="fft")
    single = track_displacement_stack(sub, **kw)
    meshy = track_displacement_stack(sub, mesh=mesh, **kw)
    np.testing.assert_allclose(meshy["dy"], single["dy"], rtol=0, atol=1e-12)
    np.testing.assert_allclose(meshy["dx"], single["dx"], rtol=0, atol=1e-12)
    np.testing.assert_allclose(meshy["peak"], single["peak"], rtol=0, atol=1e-12)


def test_spectral_summary_stack_sharded_matches_single(stack):
    # the scan-series quick-look through the frame mesh: per-frame radial
    # curves must equal the unsharded run exactly (pure data parallelism,
    # no cross-frame terms)
    from barc4dip_tpu.signal import spectral_summary_stack

    mesh = frame_mesh()
    single = spectral_summary_stack(stack, frame_chunk=4)
    sharded = spectral_summary_stack(stack, frame_chunk=4, mesh=mesh)
    for key in ("radial_binned", "radial_interpolated"):
        np.testing.assert_allclose(
            sharded[key], single[key], rtol=1e-12, atol=1e-12
        )


def test_spectral_summary_stack_resident_under_mesh(stack):
    # a device-resident stack re-shards across the mesh per chunk
    # (upload_padded_chunk's jax.Array branch + device_put to the frame
    # sharding) — must equal the numpy-input unsharded run exactly
    import jax.numpy as jnp

    from barc4dip_tpu.signal import spectral_summary_stack

    mesh = frame_mesh()
    single = spectral_summary_stack(stack, frame_chunk=4)
    resident = spectral_summary_stack(
        jnp.asarray(stack), frame_chunk=4, mesh=mesh
    )
    for key in ("radial_binned", "radial_interpolated"):
        np.testing.assert_allclose(
            resident[key], single[key], rtol=1e-12, atol=1e-12
        )
