"""Golden byte-layout fixtures.

Locks the on-disk layout against regressions: exact bytes for tiny pages of
every codec family (layouts per SURVEY §1.1 / reference serialize code), plus
footer structure invariants.  If one of these changes, the format broke.
"""

import numpy as np
import pytest

from strawboat_tpu.codecs import WriteOptions
from strawboat_tpu.codecs.boolean import compress_boolean
from strawboat_tpu.codecs.integer import (
    bitpack_encode,
    compress_integer,
    delta_bitpack_encode,
)
from strawboat_tpu.constants import Compression
from strawboat_tpu.util import roaring
from strawboat_tpu.util.bits import pack_block128


def test_compress_header_layout():
    # [codec u8][compressed u32][uncompressed u32] + body (NONE = raw LE)
    buf = compress_integer(
        np.array([1, 2], dtype=np.int64), None, WriteOptions()
    )
    assert buf == bytes(
        [0, 16, 0, 0, 0, 16, 0, 0, 0]
    ) + (1).to_bytes(8, "little") + (2).to_bytes(8, "little")


def test_one_value_layout():
    buf = compress_integer(
        np.full(10, 7, dtype=np.int32),
        None,
        WriteOptions(default_compress_ratio=1.0),
    )
    # codec 12, body = single i32 LE
    assert buf[0] == 12
    assert buf[1:5] == (4).to_bytes(4, "little")
    assert buf[5:9] == (40).to_bytes(4, "little")
    assert buf[9:] == (7).to_bytes(4, "little")


def test_rle_layout():
    import os

    os.environ["STRAWBOAT_RLE_COMPRESSION"] = "1"
    try:
        buf = compress_integer(
            np.array([5, 5, 5, 9], dtype=np.int16), None, WriteOptions()
        )
    finally:
        del os.environ["STRAWBOAT_RLE_COMPRESSION"]
    # [u32 3][i16 5][u32 1][i16 9]
    assert buf[0] == 10
    body = buf[9:]
    assert body == (3).to_bytes(4, "little") + (5).to_bytes(2, "little") + (
        1
    ).to_bytes(4, "little") + (9).to_bytes(2, "little")


def test_bitpack_block_layout():
    # 128 values of 1 → num_bits 1 → header byte 1 + 16 bytes of 0xFF
    vals = np.ones(128, dtype=np.uint32)
    enc = bitpack_encode(vals)
    assert enc == bytes([1]) + b"\xff" * 16
    # num_bits from OR; BitPacker4x interleave: v[4t+l] = bit t of word-lane l
    vals2 = np.zeros(128, dtype=np.uint32)
    vals2[0] = 1  # lane 0, t 0 → lowest bit of first u32
    enc2 = bitpack_encode(vals2)
    assert enc2[0] == 1
    assert enc2[1:] == (1).to_bytes(4, "little") + bytes(12)


def test_delta_bitpack_num_bits_from_raw():
    vals = np.arange(128, dtype=np.uint32)  # max 127 → 7 bits (raw)
    enc = delta_bitpack_encode(vals)
    assert enc[0] == 7  # width from RAW values even though deltas are 1
    assert len(enc) == 1 + 7 * 16


def test_boolean_layout():
    buf = compress_boolean(
        np.array([1, 0, 1, 1, 0, 0, 0, 1, 1], dtype=bool), None, WriteOptions()
    )
    # uncompressed_size field = row count (boolean/mod.rs:58)
    assert buf[0] == 0
    assert int.from_bytes(buf[5:9], "little") == 9
    assert buf[9:] == bytes([0b10001101, 0b00000001])


def test_roaring_layout():
    ser = roaring.serialize(np.array([1, 5, 100000], dtype=np.uint32))
    # no-run cookie, 2 containers
    assert int.from_bytes(ser[0:4], "little") == 12346
    assert int.from_bytes(ser[4:8], "little") == 2
    # descriptive headers: key 0 card-1 1; key 1 card-1 0
    assert int.from_bytes(ser[8:10], "little") == 0
    assert int.from_bytes(ser[10:12], "little") == 1
    assert int.from_bytes(ser[12:14], "little") == 1
    assert int.from_bytes(ser[14:16], "little") == 0
    # offsets section present, then array containers
    assert int.from_bytes(ser[24:26], "little") == 1
    assert int.from_bytes(ser[26:28], "little") == 5
    assert int.from_bytes(ser[28:30], "little") == 100000 - 65536


def test_file_skeleton(tmp_path):
    import pyarrow as pa

    from strawboat_tpu.api import write_file

    path = str(tmp_path / "g.str")
    write_file(
        path,
        pa.table({"a": pa.array([1, 2, 3], type=pa.int64())}),
        options=WriteOptions(),
    )
    raw = open(path, "rb").read()
    assert raw[:8] == b"ARROW2\x00\x00"
    assert raw[-8:] == b"\xff\xff\xff\xff" + bytes(4)
    meta_size = int.from_bytes(raw[-12:-8], "little")
    schema_size = int.from_bytes(raw[-16:-12], "little")
    # meta block: u64 n_cols=1, offset=8, pages=1, [length, num_values=3]
    meta = raw[-16 - meta_size : -16]
    assert int.from_bytes(meta[0:8], "little") == 1
    assert int.from_bytes(meta[8:16], "little") == 8
    assert int.from_bytes(meta[16:24], "little") == 1
    assert int.from_bytes(meta[32:40], "little") == 3
