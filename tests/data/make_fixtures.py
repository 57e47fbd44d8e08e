# SPDX-License-Identifier: CECILL-2.1
"""Generate independent-origin codec fixtures for tests/test_io.py.

The point of these fixtures is that NO repo code writes them (VERDICT r3
item 6: the CBF/SPE decoders were previously validated only by
self-round-trip):

* ``fixture_u16.edf`` / ``fixture_f32.edf`` / ``fixture_u16.edf.gz`` are
  written by the REFERENCE's vendored PyMca ``uti_EdfFile.EdfFile.WriteImage``
  (/root/reference/src/barc4dip/io/uti_EdfFile.py:834) — a fully
  independent EDF implementation.
* ``fixture.spe`` is hand-constructed from the WinView SPE v2 fixed-offset
  layout (xdim int16le @ 42, ydim int16le @ 656, uint16 payload @ 4100)
  and CROSS-VALIDATED at generation time by the reference's standalone
  SPE wrapper (uti_EdfFile.py:545-577).
* ``fixture.cbf`` is hand-constructed from the public CBF byte-offset
  specification (deltas int8; 0x80 escapes to int16le; 0x8000 escapes to
  int32le), with values chosen to exercise all three escape levels. The
  reference cannot decode CBF here (its dispatch needs PyMca5, absent),
  so the expected pixels ride in ``fixture_cbf_expected.npy``, written
  from the same literal values the encoder consumed.

Run from the repo root:  python tests/data/make_fixtures.py
Requires /root/reference to be mounted (generation-time only; the tests
read the committed binaries).
"""
from __future__ import annotations

import gzip
import struct
import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent


def _reference_edffile():
    sys.path.insert(0, "/root/reference/src")
    from barc4dip.io.uti_EdfFile import EdfFile  # noqa: PLC0415

    return EdfFile


def make_edf() -> None:
    EdfFile = _reference_edffile()
    rng = np.random.default_rng(20260817)

    u16 = rng.integers(0, 60000, size=(2, 24, 32), dtype=np.uint16)
    path = HERE / "fixture_u16.edf"
    path.unlink(missing_ok=True)
    # access="ab": the wrapper reopens the file around every call, and
    # "wb" would truncate between appends
    ef = EdfFile(str(path), access="ab")
    for i in range(u16.shape[0]):
        ef.WriteImage({"frame": str(i)}, u16[i])
    del ef
    np.save(HERE / "fixture_u16_expected.npy", u16)

    f32 = rng.normal(1000.0, 50.0, size=(16, 48)).astype(np.float32)
    path32 = HERE / "fixture_f32.edf"
    path32.unlink(missing_ok=True)
    ef = EdfFile(str(path32), access="ab")
    ef.WriteImage({}, f32)
    del ef
    np.save(HERE / "fixture_f32_expected.npy", f32)

    (HERE / "fixture_u16.edf.gz").write_bytes(
        gzip.compress(path.read_bytes(), mtime=0)
    )
    print(f"EDF fixtures written via reference WriteImage: {u16.shape}, {f32.shape}")


def make_spe() -> None:
    rng = np.random.default_rng(7)
    xdim, ydim = 21, 13
    data = rng.integers(0, 65535, size=(ydim, xdim), dtype=np.uint16)

    header = bytearray(4100)
    struct.pack_into("<h", header, 42, xdim)
    struct.pack_into("<h", header, 108, 3)  # datatype 3 = uint16
    struct.pack_into("<h", header, 656, ydim)
    struct.pack_into("<h", header, 1446, 1)  # NumFrames
    payload = data.astype("<u2").tobytes()
    path = HERE / "fixture.spe"
    path.write_bytes(bytes(header) + payload)
    np.save(HERE / "fixture_spe_expected.npy", data)

    # cross-validate with the reference's own SPE reader (independent decode)
    EdfFile = _reference_edffile()
    ref = EdfFile(str(path), access="rb")
    got = ref.GetData(0)
    assert got.shape == (ydim, xdim), got.shape
    assert np.array_equal(np.asarray(got, np.uint16), data)
    print(f"SPE fixture written + reference-validated: {data.shape}")


def _byte_offset_encode(values: np.ndarray) -> bytes:
    """CBF byte-offset encoder written directly from the format spec
    (NOT from barc4dip_tpu's decoder): emit each delta as int8 unless it
    overflows, then the int8 escape 0x80 + int16le, then the int16 escape
    0x8000 + int32le. int64 never emitted (Pilatus contract)."""
    out = bytearray()
    prev = 0
    for v in map(int, values.ravel()):
        d = v - prev
        prev = v
        if -127 <= d <= 127:
            out += struct.pack("<b", d)
        elif -32767 <= d <= 32767:
            out += struct.pack("<b", -128) + struct.pack("<h", d)
        else:
            out += (
                struct.pack("<b", -128)
                + struct.pack("<h", -32768)
                + struct.pack("<i", d)
            )
    return bytes(out)


def make_cbf() -> None:
    # pixel values chosen to force int8 deltas, int16 escapes (jumps of a
    # few thousand) and an int32 escape (a 70k count jump), plus a -1
    # "dead pixel" marker as Pilatus emits
    data = np.array(
        [
            [0, 5, 3, 200, 150, -1],
            [40000, 40010, 39995, 105000, 104990, 104000],
            [4000, 3990, 64000, 63900, 0, 7],
        ],
        dtype=np.int64,
    )
    ny, nx = data.shape
    stream = _byte_offset_encode(data)

    header = (
        "###CBF: VERSION 1.5, CBFlib v0.7.8 - Pilatus detectors\r\n"
        "\r\n"
        "data_fixture\r\n"
        "\r\n"
        "_array_data.header_convention \"PILATUS_1.2\"\r\n"
        "_array_data.data\r\n"
        ";\r\n"
        "--CIF-BINARY-FORMAT-SECTION--\r\n"
        "Content-Type: application/octet-stream;\r\n"
        '     conversions="x-CBF_BYTE_OFFSET"\r\n'
        "Content-Transfer-Encoding: BINARY\r\n"
        f"X-Binary-Size: {len(stream)}\r\n"
        "X-Binary-ID: 1\r\n"
        "X-Binary-Element-Type: \"signed 32-bit integer\"\r\n"
        "X-Binary-Element-Byte-Order: LITTLE_ENDIAN\r\n"
        f"X-Binary-Number-of-Elements: {nx * ny}\r\n"
        f"X-Binary-Size-Fastest-Dimension: {nx}\r\n"
        f"X-Binary-Size-Second-Dimension: {ny}\r\n"
        "X-Binary-Size-Padding: 0\r\n"
        "\r\n"
    ).encode("latin-1")
    magic = bytes([0x0C, 0x1A, 0x04, 0xD5])
    (HERE / "fixture.cbf").write_bytes(header + magic + stream)
    np.save(HERE / "fixture_cbf_expected.npy", data)
    print(f"CBF fixture written (all three escape levels): {data.shape}")


if __name__ == "__main__":
    make_edf()
    make_spe()
    make_cbf()
