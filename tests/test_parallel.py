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
