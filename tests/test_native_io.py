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


def test_native_512_padded_header(tmp_path):
    arr = (np.arange(20, dtype=np.uint16) * 9).reshape(4, 5)
    path = tmp_path / "pad512.edf"
    path.write_bytes(_make_edf_bytes([arr, arr + 2], block=512))
    f = NativeEdfFile(path)
    assert f.NumImages == 2
    np.testing.assert_array_equal(f.GetData(0), arr)
    np.testing.assert_array_equal(f.GetData(1), arr + 2)
    f.close()


def test_native_negative_dims_error_not_hang(tmp_path):
    good = _make_edf_bytes([np.zeros((2, 4), np.uint16)])
    bad = good.replace(b"Dim_1 = 4 ;", b"Dim_1 = -8 ;")
    path = tmp_path / "neg.edf"
    path.write_bytes(bad)
    with pytest.raises(OSError):
        NativeEdfFile(path)


def test_native_truncated_data_block_rejected(tmp_path):
    raw = _make_edf_bytes([np.zeros((64, 64), np.uint16)])
    path = tmp_path / "trunc.edf"
    path.write_bytes(raw[:-100])
    with pytest.raises(OSError):
        NativeEdfFile(path)


def test_async_loader_big_endian_edf(tmp_path):
    """HighByteFirst EDF payloads must come out of the prefetcher already
    byteswapped to native LE (values, not raw container bytes)."""
    arr = (np.arange(24, dtype=np.uint16) * 513 + 7).reshape(4, 6)
    p_be = tmp_path / "be.edf"
    p_be.write_bytes(_make_edf_bytes([arr], big_endian=True))
    p_le = tmp_path / "le.edf"
    p_le.write_bytes(_make_edf_bytes([arr]))
    frames = list(AsyncStackLoader([str(p_be), str(p_le)], n_threads=1, window=2))
    np.testing.assert_array_equal(frames[0], arr)
    np.testing.assert_array_equal(frames[1], arr)


def _make_tiff_bytes(arr: np.ndarray, *, big_endian=False, n_strips=1,
                     compression=1) -> bytes:
    """Handcraft a baseline grayscale TIFF (one page) for codec tests."""
    import struct

    bo = ">" if big_endian else "<"
    arr = np.ascontiguousarray(arr)
    h, w = arr.shape
    data = arr.astype(arr.dtype.newbyteorder(bo)).tobytes()
    bits = arr.dtype.itemsize * 8
    if arr.dtype.kind == "u":
        sf = 1
    elif arr.dtype.kind == "i":
        sf = 2
    else:
        sf = 3

    rows_per_strip = max(1, -(-h // n_strips))
    strips = []
    pos = 0
    row_bytes = w * arr.dtype.itemsize
    while pos < h:
        take = min(rows_per_strip, h - pos)
        strips.append(data[pos * row_bytes : (pos + take) * row_bytes])
        pos += take

    tags = []  # (tag, type, count, value)
    def add(tag, typ, count, value):
        tags.append((tag, typ, count, value))

    n = len(strips)
    header = struct.pack(bo + "2sHI", b"MM" if big_endian else b"II", 42, 8)
    # layout: header(8) | IFD | [offset arrays] | strip data
    n_tags = 10
    ifd_size = 2 + n_tags * 12 + 4
    extra_off = 8 + ifd_size
    extra = b""
    if n > 1:
        strip_off_pos = extra_off
        extra_off += 4 * n
        strip_cnt_pos = extra_off
        extra_off += 4 * n
    data_off = extra_off
    offsets, counts, cur = [], [], data_off
    for s in strips:
        offsets.append(cur)
        counts.append(len(s))
        cur += len(s)
    if n > 1:
        extra = struct.pack(bo + f"{n}I", *offsets) + struct.pack(bo + f"{n}I", *counts)
        off_val, cnt_val = strip_off_pos, strip_cnt_pos
    else:
        off_val, cnt_val = offsets[0], counts[0]

    add(256, 4, 1, w)            # ImageWidth
    add(257, 4, 1, h)            # ImageLength
    add(258, 3, 1, bits)         # BitsPerSample
    add(259, 3, 1, compression)  # Compression
    add(262, 3, 1, 1)            # Photometric: BlackIsZero
    add(273, 4, n, off_val)      # StripOffsets
    add(277, 3, 1, 1)            # SamplesPerPixel
    add(278, 4, 1, rows_per_strip)
    add(279, 4, n, cnt_val)      # StripByteCounts
    add(339, 3, 1, sf)           # SampleFormat

    ifd = struct.pack(bo + "H", n_tags)
    for tag, typ, count, value in sorted(tags):
        if typ == 3 and count == 1:
            val_bytes = struct.pack(bo + "H", value) + b"\x00\x00"
        else:
            val_bytes = struct.pack(bo + "I", value)
        ifd += struct.pack(bo + "HHI", tag, typ, count) + val_bytes
    ifd += struct.pack(bo + "I", 0)  # next IFD
    return header + ifd + extra + b"".join(strips)


class TestNativeTiff:
    def test_matches_pil_written_file(self, tmp_path):
        from PIL import Image

        from barc4dip_tpu.io.native import NativeTiffFile, read_tiff_native

        arr = np.random.default_rng(3).integers(0, 60000, size=(37, 23)).astype(np.uint16)
        p = tmp_path / "pil.tif"
        Image.fromarray(arr).save(p)

        f = NativeTiffFile(p)
        assert f.NumImages == 1
        np.testing.assert_array_equal(f.GetData(0), arr)
        f.close()
        np.testing.assert_array_equal(read_tiff_native(p), arr)

    @pytest.mark.parametrize("big_endian", [False, True])
    @pytest.mark.parametrize("n_strips", [1, 5])
    @pytest.mark.parametrize(
        "dtype", [np.uint8, np.uint16, np.int16, np.uint32, np.float32]
    )
    def test_handcrafted_layouts(self, tmp_path, big_endian, n_strips, dtype):
        from barc4dip_tpu.io.native import read_tiff_native

        rng = np.random.default_rng(4)
        if np.issubdtype(dtype, np.floating):
            arr = rng.normal(size=(19, 11)).astype(dtype)
        else:
            info = np.iinfo(dtype)
            arr = rng.integers(info.min, info.max, size=(19, 11)).astype(dtype)
        p = tmp_path / "hand.tif"
        p.write_bytes(_make_tiff_bytes(arr, big_endian=big_endian, n_strips=n_strips))
        got = read_tiff_native(p)
        assert got.dtype == arr.dtype
        np.testing.assert_array_equal(got, arr)

    def test_compressed_rejected(self, tmp_path):
        from barc4dip_tpu.io.native import NativeTiffFile

        arr = np.zeros((4, 4), np.uint16)
        p = tmp_path / "lzw.tif"
        p.write_bytes(_make_tiff_bytes(arr, compression=5))
        with pytest.raises(OSError, match="compression"):
            NativeTiffFile(p)

    def test_read_tiff_env_routing(self, tmp_path, monkeypatch):
        from PIL import Image

        from barc4dip_tpu.io import read_tiff

        arr = np.random.default_rng(5).integers(0, 60000, size=(12, 9)).astype(np.uint16)
        p = tmp_path / "route.tif"
        Image.fromarray(arr).save(p)
        monkeypatch.setenv("BARC4DIP_TPU_NATIVE_IO", "1")
        np.testing.assert_array_equal(read_tiff(str(p)), arr)
        # compressed file falls back to PIL transparently
        pc = tmp_path / "deflate.tif"
        Image.fromarray(arr).save(pc, compression="tiff_adobe_deflate")
        np.testing.assert_array_equal(read_tiff(str(pc)), arr)

    def test_async_loader_mixed_formats(self, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(6)
        arrs = [rng.integers(0, 60000, size=(16, 20)).astype(np.uint16) for _ in range(6)]
        paths = []
        for i, a in enumerate(arrs):
            if i % 2 == 0:
                p = tmp_path / f"f{i:02d}.edf"
                p.write_bytes(_make_edf_bytes([a]))
            else:
                p = tmp_path / f"f{i:02d}.tif"
                Image.fromarray(a).save(p)
            paths.append(str(p))

        frames = list(AsyncStackLoader(paths, n_threads=3, window=3))
        assert len(frames) == 6
        for got, want in zip(frames, arrs):
            np.testing.assert_array_equal(got, want)


def test_async_loader_corrupt_file_mid_sequence(tmp_path):
    """A corrupt file surfaces as OSError at its position, after the good
    frames before it were delivered in order."""
    rng = np.random.default_rng(7)
    arrs = [rng.integers(0, 60000, size=(8, 10)).astype(np.uint16) for _ in range(4)]
    paths = []
    for i, a in enumerate(arrs):
        p = tmp_path / f"f{i:02d}.edf"
        p.write_bytes(_make_edf_bytes([a]))
        paths.append(str(p))
    (tmp_path / "f02.edf").write_bytes(b"garbage, not a frame container")

    loader = AsyncStackLoader(paths, n_threads=2, window=2)
    got = []
    with pytest.raises(OSError):
        for frame in loader:
            got.append(frame)
    assert len(got) == 2
    for g, want in zip(got, arrs[:2]):
        np.testing.assert_array_equal(g, want)


def test_prefetch_buffer_growth_and_closed_loader(tmp_path):
    """Frames larger than the initial 1 MB capacity trigger the distinct
    grow-and-retry return code; a closed loader raises instead of passing
    NULL to the C side."""
    if not native_available():
        pytest.skip("native runtime unavailable")
    from barc4dip_tpu.io.edf import save_edf
    from barc4dip_tpu.io.native import AsyncStackLoader

    rng = np.random.default_rng(0)
    frames = [rng.normal(size=(600, 600)).astype(np.float64) for _ in range(2)]
    paths = []
    for i, f in enumerate(frames):  # 2.88 MB each > 1 MB initial cap
        p = tmp_path / f"big{i}.edf"
        save_edf(f, p)
        paths.append(str(p))

    loader = AsyncStackLoader(paths)
    got = [next(loader) for _ in range(2)]
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a, b)
    a0 = got[0]
    a0[0, 0] = 1.0  # returned frames are writable views

    # closing an UNconsumed loader: next() must be a Python error, never a
    # NULL handle passed across the C ABI
    fresh = AsyncStackLoader(paths)
    fresh.close()
    with pytest.raises(RuntimeError, match="closed"):
        next(fresh)
