# SPDX-License-Identifier: CECILL-2.1
"""I/O tests: TIFF/HDF5 round-trips, EDF parser on synthetic files,
dispatcher behaviour."""
import gzip

import numpy as np
import pytest

from barc4dip_tpu.io import (
    EdfFile,
    read_edf,
    read_h5,
    read_image,
    save_h5,
    save_tiff,
    write_image,
)


def _make_edf_bytes(
    frames: list[np.ndarray], *, block: int = 1024, big_endian: bool = False
) -> bytes:
    """Build a multi-frame EDF file per the format spec: ASCII headers padded
    inside the braces to a ``block`` multiple (512 and 1024 both exist in
    the wild) followed by raw binary data."""
    out = b""
    order = ">" if big_endian else "<"
    for arr in frames:
        dtype_name = {
            np.dtype("uint16"): "UnsignedShort",
            np.dtype("float32"): "FloatValue",
            np.dtype("int32"): "SignedInteger",
        }[arr.dtype]
        data = arr.astype(arr.dtype.newbyteorder(order)).tobytes()
        body = (
            f"\nHeaderID = EH:000001:000000:000000 ;\n"
            f"ByteOrder = {'HighByteFirst' if big_endian else 'LowByteFirst'} ;\n"
            f"DataType = {dtype_name} ;\n"
            f"Dim_1 = {arr.shape[1]} ;\n"
            f"Dim_2 = {arr.shape[0]} ;\n"
            f"Size = {len(data)} ;\n"
        )
        header = "{" + body
        # pad so that len(header) + 2 (for '}\n') is a multiple of the block
        pad = (-(len(header) + 2)) % block
        header = header + " " * pad + "}\n"
        out += header.encode("latin-1") + data
    return out


def test_edf_single_frame(tmp_path):
    arr = (np.arange(12, dtype=np.uint16) * 7).reshape(3, 4)
    path = tmp_path / "one.edf"
    path.write_bytes(_make_edf_bytes([arr]))

    f = EdfFile(path)
    assert f.NumImages == 1
    np.testing.assert_array_equal(f.GetData(0), arr)

    loaded = read_edf(str(path))
    assert loaded.dtype == np.float32
    np.testing.assert_allclose(loaded, arr)


def test_edf_multi_frame_and_float(tmp_path):
    a = np.random.default_rng(0).normal(size=(5, 6)).astype(np.float32)
    b = (a * 2).astype(np.float32)
    path = tmp_path / "two.edf"
    path.write_bytes(_make_edf_bytes([a, b]))

    f = EdfFile(path)
    assert f.GetNumImages() == 2
    np.testing.assert_allclose(f.GetData(1), b)
    hdr = f.GetHeader(0)
    assert hdr["DataType"] == "FloatValue"


def test_edf_gzip(tmp_path):
    arr = np.arange(20, dtype=np.uint16).reshape(4, 5)
    path = tmp_path / "z.edf.gz"
    path.write_bytes(gzip.compress(_make_edf_bytes([arr])))
    np.testing.assert_allclose(read_edf(str(path)), arr)
    # dispatcher recognises .edf.gz too
    np.testing.assert_allclose(read_image(str(path)), arr)


def test_edf_sequence_stack(tmp_path):
    arrs = [np.full((3, 3), i, dtype=np.uint16) for i in range(3)]
    paths = []
    for i, a in enumerate(arrs):
        p = tmp_path / f"f{i}.edf"
        p.write_bytes(_make_edf_bytes([a]))
        paths.append(str(p))
    stack = read_edf(paths)
    assert stack.shape == (3, 3, 3)
    np.testing.assert_allclose(stack[2], 2.0)


def test_edf_512_padded_header(tmp_path):
    """fabio/ESRF writers pad headers to 512-byte multiples; data must be
    located right after '}\\n', not at an assumed 1024-byte boundary."""
    arr = (np.arange(20, dtype=np.uint16) * 11).reshape(4, 5)
    path = tmp_path / "pad512.edf"
    path.write_bytes(_make_edf_bytes([arr, arr + 1], block=512))
    f = EdfFile(path)
    assert f.NumImages == 2
    np.testing.assert_array_equal(f.GetData(0), arr)
    np.testing.assert_array_equal(f.GetData(1), arr + 1)


def test_edf_big_endian_frame(tmp_path):
    arr = (np.arange(12, dtype=np.uint16) * 257).reshape(3, 4)
    path = tmp_path / "be.edf"
    path.write_bytes(_make_edf_bytes([arr], big_endian=True))
    np.testing.assert_array_equal(EdfFile(path).GetData(0), arr)


def test_edf_negative_dims_rejected(tmp_path):
    """A corrupt Dim_1 must raise, not loop forever re-scanning the frame."""
    good = _make_edf_bytes([np.zeros((2, 4), np.uint16)])
    bad = good.replace(b"Dim_1 = 4 ;", b"Dim_1 = -8 ;")
    path = tmp_path / "neg.edf"
    path.write_bytes(bad)
    with pytest.raises(OSError, match="[Ii]nvalid EDF dimensions"):
        EdfFile(path)


def test_edf_size_smaller_than_payload_rejected(tmp_path):
    good = _make_edf_bytes([np.zeros((2, 4), np.uint16)])
    bad = good.replace(b"Size = 16 ;", b"Size = 3 ;")
    path = tmp_path / "small.edf"
    path.write_bytes(bad)
    with pytest.raises(OSError, match="Size"):
        EdfFile(path)


def test_edf_oversized_size_skips_padding(tmp_path):
    """Size larger than the payload is legal block padding: the scan must
    advance by Size so the next frame is still found."""
    a = np.arange(8, dtype=np.uint16).reshape(2, 4)
    b = a + 100
    raw = _make_edf_bytes([a])
    padded = raw.replace(b"Size = 16 ;", b"Size = 24 ;") + b"\x00" * 8
    path = tmp_path / "padded.edf"
    path.write_bytes(padded + _make_edf_bytes([b]))
    f = EdfFile(path)
    assert f.NumImages == 2
    np.testing.assert_array_equal(f.GetData(0), a)
    np.testing.assert_array_equal(f.GetData(1), b)


def test_edf_get_region(tmp_path):
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 60000, size=(16, 12)).astype(np.uint16)
    path = tmp_path / "reg.edf"
    path.write_bytes(_make_edf_bytes([arr]))
    f = EdfFile(path)
    region = f.GetRegion(0, (3, 2), (5, 7))
    np.testing.assert_array_equal(region, arr[3:8, 2:9])
    with pytest.raises(ValueError):
        f.GetRegion(0, (14, 0), (5, 5))  # spills past the bottom edge
    with pytest.raises(ValueError):
        f.GetRegion(0, (0, 0), (0, 3))


def test_edf_wrapped_tiff_container(tmp_path):
    """A .edf path whose payload is actually a TIFF (MarCCD-style) must
    dispatch by magic and decode, like the reference's wrapping parser."""
    img = (np.arange(48, dtype=np.uint16) * 100).reshape(6, 8)
    wrapped = tmp_path / "marccd_like.edf"
    save_tiff(img, tmp_path / "tmp.tif")
    wrapped.write_bytes((tmp_path / "tmp.tif").read_bytes())
    out = read_edf(str(wrapped))
    np.testing.assert_allclose(out, img)
    with pytest.raises(IndexError):
        read_edf(str(wrapped), index=3)  # single page: same contract as EDF


def test_tiff_roundtrip_2d(tmp_path):
    img = (np.random.default_rng(1).integers(0, 60000, size=(32, 40))).astype(np.uint16)
    out = tmp_path / "img.tif"
    save_tiff(img, out)
    loaded = read_image(str(out))
    np.testing.assert_array_equal(loaded, img)


def test_tiff_stack_one_file_per_frame(tmp_path):
    stack = np.random.default_rng(2).integers(0, 60000, size=(3, 16, 16)).astype(np.uint16)
    save_tiff(stack, tmp_path / "s.tif")
    files = sorted(p.name for p in tmp_path.glob("s_*.tif"))
    assert files == ["s_0000.tif", "s_0001.tif", "s_0002.tif"]
    # frames differ (the reference bug wrote the whole array to every file)
    loaded = read_image([str(tmp_path / f) for f in files])
    np.testing.assert_array_equal(loaded, stack)


def test_tiff_float32_dtype_is_lossless(tmp_path):
    """dtype="float32" (extension) writes values verbatim — the uint16
    default would contrast-stretch this low-mean calibration frame
    (to_uint16's counts heuristic) and destroy its scale."""
    dark = np.full((16, 20), 7.25, np.float32) + np.linspace(
        0, 0.5, 20, dtype=np.float32
    )
    out = tmp_path / "dark.tif"
    save_tiff(dark, out, dtype="float32")
    loaded = read_image(str(out))
    assert loaded.dtype == np.float32
    np.testing.assert_array_equal(loaded, dark)
    # stacks too
    save_tiff(np.stack([dark, dark * 2]), tmp_path / "dk.tif", dtype="float32")
    loaded = read_image([str(tmp_path / "dk_0000.tif"), str(tmp_path / "dk_0001.tif")])
    np.testing.assert_array_equal(loaded[1], dark * 2)
    import pytest

    with pytest.raises(ValueError, match="dtype"):
        save_tiff(dark, out, dtype="int8")


def test_h5_roundtrip_and_frame_select(tmp_path):
    stack = np.random.default_rng(3).normal(size=(4, 8, 8)).astype(np.float32)
    out = tmp_path / "d.h5"
    save_h5(stack, out)

    full = read_h5(str(out))
    np.testing.assert_allclose(full, stack)
    np.testing.assert_allclose(read_h5(str(out), image_number=2), stack[2])
    np.testing.assert_allclose(read_h5(str(out), image_number=-1), stack[3])
    with pytest.raises(ValueError):
        read_h5(str(out), image_number=10)
    with pytest.raises(OSError):
        save_h5(stack, out)  # refuse overwrite


def test_h5_sequence_concat(tmp_path):
    a = np.zeros((2, 4, 4), np.float32)
    b = np.ones((3, 4, 4), np.float32)
    pa, pb = tmp_path / "a.h5", tmp_path / "b.h5"
    save_h5(a, pa)
    save_h5(b, pb)
    stacked = read_h5([str(pa), str(pb)])
    assert stacked.shape == (5, 4, 4)


def test_read_image_mean_collapse(tmp_path):
    stack = np.stack([np.zeros((4, 4)), np.ones((4, 4)) * 2]).astype(np.float32)
    out = tmp_path / "m.h5"
    save_h5(stack, out)
    m = read_image(str(out), mean=True)
    np.testing.assert_allclose(m, 1.0)


def test_write_image_dispatch(tmp_path):
    img = np.ones((8, 8), dtype=np.uint16)
    with pytest.raises(ValueError, match="EDF is not supported"):
        write_image(img, tmp_path / "x.edf")
    with pytest.raises(ValueError, match="Unsupported"):
        read_image(str(tmp_path / "x.png"))
    write_image(img, tmp_path / "ok.h5", verbose=False)
    assert (tmp_path / "ok.h5").exists()


class TestSaveEdf:
    """save_edf round-trips through every reader (parity with the reference
    writer, io/uti_EdfFile.py:834)."""

    @pytest.mark.parametrize(
        "dtype", [np.uint8, np.uint16, np.int16, np.int32, np.uint32,
                  np.int64, np.float32, np.float64]
    )
    def test_roundtrip_dtypes(self, tmp_path, dtype):
        from barc4dip_tpu.io import EdfFile, save_edf

        rng = np.random.default_rng(8)
        if np.issubdtype(dtype, np.floating):
            arr = rng.normal(size=(13, 17)).astype(dtype)
        else:
            info = np.iinfo(dtype)
            lo, hi = max(info.min, -(2**31)), min(info.max, 2**31 - 1)
            arr = rng.integers(lo, hi, size=(13, 17)).astype(dtype)
        p = tmp_path / "w.edf"
        save_edf(arr, p)
        got = EdfFile(p).GetData(0)
        assert got.dtype.newbyteorder("=") == np.dtype(dtype)
        np.testing.assert_array_equal(got, arr)

    def test_multiframe_and_reference_reader(self, tmp_path):
        import sys

        from barc4dip_tpu.io import EdfFile, save_edf

        rng = np.random.default_rng(9)
        stack = rng.integers(0, 60000, size=(3, 21, 15)).astype(np.uint16)
        p = tmp_path / "stack.edf"
        save_edf(stack, p)

        f = EdfFile(p)
        assert f.NumImages == 3
        for i in range(3):
            np.testing.assert_array_equal(f.GetData(i), stack[i])

        # the actual reference reader must accept our files
        sys.path.insert(0, "/root/reference/src")
        try:
            from barc4dip.io.uti_EdfFile import EdfFile as RefEdfFile
        except ImportError:
            pytest.skip("reference reader unavailable")
        rf = RefEdfFile(str(p), access="rb")
        assert rf.GetNumImages() == 3
        for i in range(3):
            np.testing.assert_array_equal(rf.GetData(i), stack[i])

    def test_native_codec_reads_written_file(self, tmp_path):
        from barc4dip_tpu.io import save_edf
        from barc4dip_tpu.io.native import native_available

        if not native_available():
            pytest.skip("native runtime unavailable")
        from barc4dip_tpu.io.native import NativeEdfFile

        arr = np.random.default_rng(10).normal(size=(19, 23)).astype(np.float32)
        p = tmp_path / "n.edf"
        save_edf(arr, p)
        np.testing.assert_array_equal(NativeEdfFile(p).GetData(0), arr)

    def test_save_edf_validation(self, tmp_path):
        from barc4dip_tpu.io import save_edf

        with pytest.raises(TypeError):
            save_edf([[1, 2]], tmp_path / "x.edf")
        with pytest.raises(ValueError):
            save_edf(np.zeros(4), tmp_path / "x.edf")
        with pytest.raises(OSError):
            save_edf(np.zeros((4, 4)), tmp_path / "missing" / "x.edf")
        with pytest.raises(ValueError):
            save_edf(np.zeros((4, 4), dtype=np.complex64), tmp_path / "x.edf")


class TestWrappedContainers:
    """CBF / SPE wrapped-format dispatch (reference uti_EdfFile.py:277-295)."""

    @staticmethod
    def _byte_offset_encode(values: np.ndarray) -> bytes:
        out = bytearray()
        prev = 0
        for v in values.ravel().tolist():
            d = v - prev
            prev = v
            if -127 <= d <= 127:
                out += int(d).to_bytes(1, "little", signed=True)
            elif -32767 <= d <= 32767:
                out += b"\x80" + int(d).to_bytes(2, "little", signed=True)
            else:
                out += b"\x80" + b"\x00\x80" + int(d).to_bytes(4, "little", signed=True)
        return bytes(out)

    def _write_cbf(self, path, img):
        ny, nx = img.shape
        header = (
            "###CBF: VERSION 1.5\r\n"
            "conversions=\"x-CBF_BYTE_OFFSET\"\r\n"
            "Content-Transfer-Encoding: BINARY\r\n"
            f"X-Binary-Number-of-Elements: {img.size}\r\n"
            f"X-Binary-Size-Fastest-Dimension: {nx}\r\n"
            f"X-Binary-Size-Second-Dimension: {ny}\r\n\r\n"
        ).encode()
        payload = self._byte_offset_encode(img)
        path.write_bytes(header + b"\x0c\x1a\x04\xd5" + payload)

    def _write_spe(self, path, img):
        ny, nx = img.shape
        head = bytearray(4100)
        head[42:44] = int(nx).to_bytes(2, "little", signed=True)
        head[656:658] = int(ny).to_bytes(2, "little", signed=True)
        path.write_bytes(bytes(head) + img.astype("<u2").tobytes())

    def test_cbf_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 70000, size=(23, 17)).astype(np.int64)
        img[4, 5] = 0  # big negative delta
        img[4, 6] = 1_000_000  # forces the int32 escape
        p = tmp_path / "frame.cbf"
        self._write_cbf(p, img)
        out = read_edf(str(p))
        assert out.dtype == np.float32
        np.testing.assert_allclose(out, img.astype(np.float32))

    def test_spe_roundtrip(self, tmp_path):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 65535, size=(11, 9)).astype(np.uint16)
        p = tmp_path / "frame.spe"
        self._write_spe(p, img)
        out = read_edf(str(p))
        np.testing.assert_allclose(out, img.astype(np.float32))

    def test_wrapped_single_frame_contract(self, tmp_path):
        img = np.arange(12, dtype=np.uint16).reshape(3, 4)
        p = tmp_path / "frame.spe"
        self._write_spe(p, img)
        with pytest.raises(IndexError):
            read_edf(str(p), index=1)

    def test_edf_payload_in_cbf_extension_falls_through(self, tmp_path):
        # a .cbf whose first byte is '{' is a real EDF (reference contract)
        from barc4dip_tpu.io import save_edf

        img = np.arange(20, dtype=np.float32).reshape(4, 5)
        p = tmp_path / "really_edf.cbf"
        save_edf(img, str(p))
        np.testing.assert_allclose(read_edf(str(p)), img)

    def test_read_image_routes_wrapped_containers(self, tmp_path):
        from barc4dip_tpu.io import read_image

        img = np.arange(30, dtype=np.uint16).reshape(5, 6)
        p = tmp_path / "frame.spe"
        self._write_spe(p, img)
        np.testing.assert_allclose(read_image(str(p), verbose=False), img)


class TestIndependentOriginFixtures:
    """Committed binary fixtures under tests/data/ that NO repo code wrote
    (tests/data/make_fixtures.py): the EDF files come from the reference's
    vendored PyMca writer (reference io/uti_EdfFile.py:834), the SPE file
    is hand-built from the v2 spec and cross-validated by the reference's
    own SPE wrapper (uti_EdfFile.py:545-577) at generation time, and the
    CBF file is hand-built from the public byte-offset spec with the
    expected pixels stored alongside. Kills the self-round-trip blind
    spot (VERDICT r3 item 6)."""

    DATA = __import__("pathlib").Path(__file__).parent / "data"

    def test_reference_written_edf_u16(self):
        from barc4dip_tpu.io.edf import EdfFile

        expected = np.load(self.DATA / "fixture_u16_expected.npy")
        e = EdfFile(self.DATA / "fixture_u16.edf")
        assert e.NumImages == 2
        for i in range(2):
            got = e.GetData(i)
            assert got.dtype == np.uint16
            np.testing.assert_array_equal(got, expected[i])
        assert e.GetHeader(1).get("frame") == "1"

    def test_reference_written_edf_f32(self):
        from barc4dip_tpu.io.edf import EdfFile

        expected = np.load(self.DATA / "fixture_f32_expected.npy")
        e = EdfFile(self.DATA / "fixture_f32.edf")
        np.testing.assert_allclose(e.GetData(0), expected, rtol=0, atol=0)

    def test_reference_written_edf_gz(self):
        from barc4dip_tpu.io.edf import EdfFile

        expected = np.load(self.DATA / "fixture_u16_expected.npy")
        e = EdfFile(self.DATA / "fixture_u16.edf.gz")
        np.testing.assert_array_equal(e.GetData(1), expected[1])

    def test_reference_written_edf_region(self):
        from barc4dip_tpu.io.edf import EdfFile

        expected = np.load(self.DATA / "fixture_u16_expected.npy")
        e = EdfFile(self.DATA / "fixture_u16.edf")
        np.testing.assert_array_equal(
            e.GetRegion(0, (5, 3), (10, 17)), expected[0][5:15, 3:20]
        )

    def test_spe_fixture(self):
        expected = np.load(self.DATA / "fixture_spe_expected.npy")
        got = read_edf(str(self.DATA / "fixture.spe"))
        assert got.shape == expected.shape
        np.testing.assert_array_equal(got, expected.astype(got.dtype))

    def test_cbf_fixture_all_escape_levels(self):
        # the fixture's deltas span int8, the int16 escape and the int32
        # escape, plus a Pilatus -1 dead-pixel marker
        expected = np.load(self.DATA / "fixture_cbf_expected.npy")
        got = read_edf(str(self.DATA / "fixture.cbf"))
        assert got.shape == expected.shape
        np.testing.assert_array_equal(got, expected.astype(got.dtype))

    def test_native_codecs_on_fixtures(self, monkeypatch):
        # the C++ reader path must agree with the Python decoders on
        # files neither implementation wrote
        from barc4dip_tpu.io import native

        if not native.native_available():
            pytest.skip("native io library unavailable")
        monkeypatch.setenv("BARC4DIP_TPU_NATIVE_IO", "1")
        expected = np.load(self.DATA / "fixture_u16_expected.npy")
        got = read_edf(str(self.DATA / "fixture_u16.edf"))
        np.testing.assert_array_equal(got, expected[0].astype(got.dtype))


def test_cbf_byte_offset_int64_escape():
    """Full CBF spec: int32 payload == -2^31 escapes to an 8-byte int64
    delta. Pilatus never emits it, but the decoder must not misalign."""
    import struct

    from barc4dip_tpu.io.edf import _byte_offset_decode

    big = 2**31 + 5
    stream = (
        struct.pack("<b", 10)  # value 10
        + struct.pack("<b", -128) + struct.pack("<h", -32768)
        + struct.pack("<i", -(2**31)) + struct.pack("<q", big)  # +big
        + struct.pack("<b", -3)  # back down a little
        + struct.pack("<b", -128) + struct.pack("<h", -32768)
        + struct.pack("<i", -(2**31)) + struct.pack("<q", -big)  # -big
        + struct.pack("<b", 1)
    )
    got = _byte_offset_decode(stream, 5)
    expected = np.cumsum([10, big, -3, -big, 1])
    np.testing.assert_array_equal(got, expected)


@pytest.mark.skipif(
    not __import__("pathlib").Path("/root/reference/src").exists(),
    reason="reference package not mounted",
)
def test_edf_differential_fuzz_vs_reference(tmp_path):
    """Differential validation: random arrays written by the REFERENCE's
    vendored PyMca EdfFile writer must decode identically through our
    clean-room parser (dtype map, header padding, multi-frame layout)."""
    import sys as _sys

    _sys.path.insert(0, "/root/reference/src")
    try:
        from barc4dip.io.uti_EdfFile import EdfFile as RefEdf
    finally:
        _sys.path.remove("/root/reference/src")

    from barc4dip_tpu.io.edf import EdfFile as OurEdf

    rng = np.random.default_rng(42)
    cases = []
    for dt in (np.uint16, np.int32, np.float32, np.float64, np.uint8):
        h, w = (int(v) for v in rng.integers(1, 40, 2))
        n = int(rng.integers(1, 4))
        if np.issubdtype(dt, np.floating):
            arrs = [rng.normal(0, 1e4, (h, w)).astype(dt) for _ in range(n)]
        else:
            info = np.iinfo(dt)
            arrs = [
                rng.integers(info.min, info.max, (h, w), dtype=dt)
                for _ in range(n)
            ]
        cases.append(arrs)

    for ci, arrs in enumerate(cases):
        path = tmp_path / f"fuzz_{ci}.edf"
        ref = RefEdf(str(path), access="ab")
        for i, a in enumerate(arrs):
            ref.WriteImage({"case": f"{ci}:{i}"}, a)
        del ref
        ours = OurEdf(path)
        assert ours.NumImages == len(arrs), (ci, ours.NumImages)
        for i, a in enumerate(arrs):
            got = ours.GetData(i)
            assert got.dtype == a.dtype, (ci, i, got.dtype, a.dtype)
            np.testing.assert_array_equal(got, a, err_msg=f"case {ci} frame {i}")
