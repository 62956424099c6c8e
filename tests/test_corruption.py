"""Corrupt-input handling: truncated/garbled files raise OutOfSpecError
(reference behavior: explicit size guards, e.g. integer/dict.rs:80-86)."""

import numpy as np
import pyarrow as pa
import pytest

from strawboat_tpu.api import read_table, write_file
from strawboat_tpu.codecs import WriteOptions
from strawboat_tpu.constants import Compression
from strawboat_tpu.errors import OutOfSpecError, StrawboatError


@pytest.fixture
def valid_file(tmp_path):
    path = str(tmp_path / "v.str")
    table = pa.table({"a": pa.array(np.arange(1000, dtype=np.int64))})
    write_file(
        path,
        table,
        options=WriteOptions(default_compression=Compression.LZ4, max_page_size=256),
    )
    return path


def _mutate(path, out, fn):
    raw = bytearray(open(path, "rb").read())
    fn(raw)
    with open(out, "wb") as f:
        f.write(raw)
    return out


def test_truncated_footer(valid_file, tmp_path):
    out = str(tmp_path / "t.str")
    raw = open(valid_file, "rb").read()
    with open(out, "wb") as f:
        f.write(raw[: len(raw) // 2])
    with pytest.raises(Exception):
        read_table(out)


def test_corrupt_codec_id(valid_file, tmp_path):
    out = _mutate(
        valid_file, str(tmp_path / "c.str"), lambda raw: raw.__setitem__(8, 99)
    )
    with pytest.raises(StrawboatError):
        read_table(out)


def test_corrupt_compressed_body(valid_file, tmp_path):
    def clobber(raw):
        for i in range(20, 60):
            raw[i] = 0xAB

    out = _mutate(valid_file, str(tmp_path / "b.str"), clobber)
    with pytest.raises(Exception):
        read_table(out)


def test_writer_state_machine(tmp_path):
    import io

    from strawboat_tpu.write.writer import NativeWriter

    table = pa.table({"a": pa.array([1], type=pa.int64())})
    w = NativeWriter(io.BytesIO(), table.schema, WriteOptions())
    with pytest.raises(OutOfSpecError):
        w.write(table)  # not started
    w.start()
    with pytest.raises(OutOfSpecError):
        w.start()  # double start
    w.write(table)
    with pytest.raises(OutOfSpecError):
        w.write(table)  # single row group only
    w.finish()
    with pytest.raises(OutOfSpecError):
        w.finish()
