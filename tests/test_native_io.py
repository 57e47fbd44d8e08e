# SPDX-License-Identifier: CECILL-2.1
"""Native I/O runtime tests: C++ EDF codec parity + async prefetcher."""
import numpy as np
import pytest

from barc4dip_tpu.io import EdfFile
from barc4dip_tpu.io.native import (
    AsyncStackLoader,
    NativeEdfFile,
    native_available,
    read_edf_native,
)
from tests.test_io import _make_edf_bytes

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native dipio runtime not available"
)


def test_native_matches_python_parser(tmp_path):
    arrs = [
        (np.arange(30, dtype=np.uint16) * 3).reshape(5, 6),
        np.random.default_rng(0).normal(size=(5, 6)).astype(np.float32),
    ]
    path = tmp_path / "multi.edf"
    path.write_bytes(_make_edf_bytes(arrs))

    nat = NativeEdfFile(path)
    py = EdfFile(path)
    assert nat.NumImages == py.NumImages == 2
    for i in range(2):
        np.testing.assert_array_equal(nat.GetData(i), py.GetData(i))
    nat.close()


def test_native_read_edf(tmp_path):
    arr = (np.arange(12, dtype=np.uint16)).reshape(3, 4)
    path = tmp_path / "one.edf"
    path.write_bytes(_make_edf_bytes([arr]))
    out = read_edf_native(path)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, arr)


def test_native_errors(tmp_path):
    bad = tmp_path / "bad.edf"
    bad.write_bytes(b"this is not an EDF file")
    with pytest.raises(OSError):
        NativeEdfFile(bad)
    with pytest.raises(OSError):
        NativeEdfFile(tmp_path / "missing.edf")

    arr = np.zeros((2, 2), np.uint16)
    ok = tmp_path / "ok.edf"
    ok.write_bytes(_make_edf_bytes([arr]))
    f = NativeEdfFile(ok)
    with pytest.raises(IndexError):
        f.GetData(5)
    f.close()


def test_async_stack_loader_order_and_values(tmp_path):
    rng = np.random.default_rng(1)
    arrs = [rng.integers(0, 60000, size=(16, 20)).astype(np.uint16) for _ in range(12)]
    paths = []
    for i, a in enumerate(arrs):
        p = tmp_path / f"f{i:03d}.edf"
        p.write_bytes(_make_edf_bytes([a]))
        paths.append(str(p))

    loader = AsyncStackLoader(paths, n_threads=3, window=4)
    assert len(loader) == 12
    frames = list(loader)
    assert len(frames) == 12
    for got, want in zip(frames, arrs):
        np.testing.assert_array_equal(got, want)


def test_async_loader_large_frames(tmp_path):
    # exceed the initial 1 MiB capacity guess to exercise the grow path
    arr = np.random.default_rng(2).integers(0, 60000, size=(800, 900)).astype(np.uint16)
    p = tmp_path / "big.edf"
    p.write_bytes(_make_edf_bytes([arr]))
    frames = list(AsyncStackLoader([str(p)] * 3, n_threads=2, window=2))
    assert len(frames) == 3
    np.testing.assert_array_equal(frames[0], arr)
