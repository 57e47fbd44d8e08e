# SPDX-License-Identifier: CECILL-2.1
"""Checkpoint/resume tests for stack pipelines."""
import numpy as np
import pytest

from barc4dip_tpu.metrics import sharpness_stack_stats, speckle_stack_stats
from barc4dip_tpu.utils.checkpoint import ChunkStore, config_hash
from tests.conftest import make_speckle


def test_chunkstore_roundtrip(tmp_path):
    store = ChunkStore(tmp_path, "test", {"a": 1, "shape": (3, 4)})
    tree = {
        "full": {"x": np.arange(6.0).reshape(2, 3), "y": np.float64(3.5)},
        "tiles": {"g/f": {"mean": np.ones((2, 3, 3))}},
    }
    assert not store.has(0)
    store.save(0, tree)
    assert store.has(0)
    loaded = store.load(0)
    np.testing.assert_array_equal(loaded["full"]["x"], tree["full"]["x"])
    np.testing.assert_array_equal(loaded["tiles"]["g/f"]["mean"], tree["tiles"]["g/f"]["mean"])
    assert float(loaded["full"]["y"]) == 3.5


def test_config_hash_sensitivity():
    a = config_hash({"groups": ["a", "b"], "chunk": 4})
    b = config_hash({"groups": ["a", "b"], "chunk": 8})
    c = config_hash({"chunk": 4, "groups": ["a", "b"]})
    assert a != b
    assert a == c  # key order irrelevant


def _stack():
    rng = np.random.default_rng(81)
    base = make_speckle(rng, shape=(160, 160), grain_px=6.0)
    return np.stack([base * (1 + 0.01 * t) for t in range(6)])


def test_speckle_stack_resume_matches(tmp_path):
    stack = _stack()
    kwargs = dict(metrics="amplitude,stats", tiles=False, verbose=False, frame_chunk=2)

    fresh = speckle_stack_stats(stack, **kwargs)
    first = speckle_stack_stats(stack, checkpoint_dir=tmp_path, **kwargs)
    files = list(tmp_path.glob("*.npz"))
    assert files  # chunks persisted

    # resume: all chunks come from the store
    resumed = speckle_stack_stats(stack, checkpoint_dir=tmp_path, **kwargs)
    for g in fresh["full"]:
        for k in fresh["full"][g]:
            np.testing.assert_allclose(first["full"][g][k], fresh["full"][g][k])
            np.testing.assert_allclose(resumed["full"][g][k], fresh["full"][g][k])
    for blk in ("abs", "inc"):
        for k in ("dx", "dy"):
            np.testing.assert_allclose(
                resumed["temporal"][blk][k], fresh["temporal"][blk][k]
            )


def test_partial_resume_after_lost_chunks(tmp_path):
    """Crash-recovery shape: some chunk files vanish (killed mid-run, disk
    cleanup) — the rerun recomputes exactly the missing chunks and the
    result still matches a fresh run, including the cross-chunk
    incremental-tracking chain."""
    stack = _stack()
    kwargs = dict(metrics="amplitude,stats", tiles=False, verbose=False, frame_chunk=2)

    fresh = speckle_stack_stats(stack, **kwargs)
    speckle_stack_stats(stack, checkpoint_dir=tmp_path, **kwargs)
    files = sorted(tmp_path.glob("*.npz"))
    assert len(files) >= 3
    files[0].unlink()   # first chunk gone
    files[-1].unlink()  # last chunk gone

    resumed = speckle_stack_stats(stack, checkpoint_dir=tmp_path, **kwargs)
    for g in fresh["full"]:
        for k in fresh["full"][g]:
            np.testing.assert_allclose(resumed["full"][g][k], fresh["full"][g][k])
    for blk in ("abs", "inc"):
        for k in ("dx", "dy"):
            np.testing.assert_allclose(
                resumed["temporal"][blk][k], fresh["temporal"][blk][k],
                rtol=1e-5, atol=1e-5,
            )
    # the recomputed chunks were re-persisted
    assert len(sorted(tmp_path.glob("*.npz"))) == len(files)


def test_resume_ignores_stale_config(tmp_path):
    stack = _stack()
    kwargs = dict(metrics="stats", tiles=False, verbose=False, frame_chunk=2)
    speckle_stack_stats(stack, checkpoint_dir=tmp_path, **kwargs)
    n_before = len(list(tmp_path.glob("*.npz")))
    # different groups -> different hash -> new chunk files, not reuse
    speckle_stack_stats(
        stack, metrics="amplitude,stats", tiles=False, verbose=False,
        frame_chunk=2, checkpoint_dir=tmp_path,
    )
    assert len(list(tmp_path.glob("*.npz"))) > n_before


def test_sharpness_stack_checkpoint(tmp_path):
    stack = _stack()
    kwargs = dict(metrics="gradient", tiles=False, verbose=False, frame_chunk=3)
    fresh = sharpness_stack_stats(stack, **kwargs)
    sharpness_stack_stats(stack, checkpoint_dir=tmp_path, **kwargs)
    resumed = sharpness_stack_stats(stack, checkpoint_dir=tmp_path, **kwargs)
    np.testing.assert_allclose(
        resumed["full"]["gradient"]["tenengrad"], fresh["full"]["gradient"]["tenengrad"]
    )


def test_checkpoint_hash_changes_with_effective_schedule(tmp_path, monkeypatch):
    """Chunks saved under one chunk layout must never resume under another:
    toggling BARC4DIP_TPU_RAMP changes the effective schedule, so it must
    change the checkpoint config hash (else a resumed run would load
    chunks with mismatched frame counts)."""
    from barc4dip_tpu.metrics.common import chunk_layout_signature

    T, B = 12, 4
    monkeypatch.delenv("BARC4DIP_TPU_RAMP", raising=False)
    ramped = chunk_layout_signature(T, B, None)
    monkeypatch.setenv("BARC4DIP_TPU_RAMP", "0")
    uniform = chunk_layout_signature(T, B, None)
    assert ramped != uniform
    assert ramped[0] == 0 and uniform == (0, 4, 8)
    from barc4dip_tpu.utils.checkpoint import config_hash

    assert config_hash({"schedule": ramped}) != config_hash({"schedule": uniform})
