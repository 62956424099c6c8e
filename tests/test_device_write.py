"""Device-encoder writer: codec choice from HBM-resident page stats
(reference hot loops integer/mod.rs:179-347 as batched device reductions)."""

import numpy as np
import pyarrow as pa

from strawboat_tpu.api import read_table, write_file
from strawboat_tpu.codecs import WriteOptions
from strawboat_tpu.constants import Compression
from strawboat_tpu.exec import scan_file
from strawboat_tpu.read.reader import infer_schema, open_readers, read_meta
from strawboat_tpu.stat import stat_simple
from strawboat_tpu.write.device import write_device_table


def _page_kinds(path):
    """column name → set of page body kinds (via the stat layer)."""
    with open(path, "rb") as f:
        schema = infer_schema(f)
        metas = read_meta(f)
    out = {}
    for i, field in enumerate(schema):
        readers = open_readers(path, [metas[i]])
        info = stat_simple(readers[0], field)
        for r in readers:
            r.page_reader.close()
        out[field.name] = {p.body.kind for p in info.pages}
    return out


def _roundtrip(tmp_path, table, **opt_kw):
    """arrow → file → DeviceTable → device-encode → rescan → arrow."""
    src = str(tmp_path / "src.str")
    dst = str(tmp_path / "dst.str")
    write_file(
        src,
        table,
        options=WriteOptions(
            default_compression=Compression.LZ4, max_page_size=1024
        ),
    )
    dt = scan_file(src)
    write_device_table(
        dst,
        dt,
        WriteOptions(
            default_compression=Compression.LZ4,
            max_page_size=1024,
            **opt_kw,
        ),
    )
    return read_table(dst), dst


def test_numeric_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 5000
    table = pa.table(
        {
            "i": pa.array(rng.integers(-1000, 1000, n).astype(np.int64)),
            "f": pa.array(rng.random(n)),
            "u": pa.array(rng.integers(0, 1 << 20, n).astype(np.uint32)),
        }
    )
    got, _ = _roundtrip(tmp_path, table)
    assert got.equals(table.cast(got.schema))


def test_adaptive_choices_from_device_stats(tmp_path):
    """Constant page → OneValue, sorted u32 → (delta-)bitpack, low-cardinality
    → Dict: all chosen from device reductions (ratio competition on)."""
    n = 2048
    table = pa.table(
        {
            "const": pa.array(np.full(n, 7, dtype=np.int64)),
            "sorted_u32": pa.array(
                np.arange(n, dtype=np.uint32) * 3, pa.uint32()
            ),
            "lowcard": pa.array(
                np.random.default_rng(1).integers(0, 4, n).astype(np.int64)
            ),
        }
    )
    got, dst = _roundtrip(tmp_path, table, default_compress_ratio=1.0)
    assert got.equals(table.cast(got.schema))
    kinds = _page_kinds(dst)
    assert kinds["const"] == {"one_value"}
    assert kinds["sorted_u32"] <= {"delta_bitpack", "bitpack"}
    assert kinds["lowcard"] == {"dict"}


def test_nullable_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    n = 4000
    vals = rng.integers(0, 100, n).astype(np.int64)
    mask = rng.random(n) < 0.25
    table = pa.table(
        {"x": pa.array(vals, mask=mask), "y": pa.array(rng.random(n))}
    )
    got, _ = _roundtrip(tmp_path, table)
    assert got.column("x").to_pylist() == table.column("x").to_pylist()
    assert got.column("y").to_pylist() == table.column("y").to_pylist()


def test_string_dict_direct_roundtrip(tmp_path, monkeypatch):
    """String columns re-encode as Dict pages straight from device codes —
    per-row string materialization (dictionary_encode / python row loops)
    must never run."""
    import os

    rng = np.random.default_rng(3)
    n = 4000
    words = [f"city-{i}" for i in range(23)]
    vals = [words[i] for i in rng.integers(0, len(words), n)]
    table = pa.table({"s": pa.array(vals, pa.string())})
    src = str(tmp_path / "src.str")
    dst = str(tmp_path / "dst.str")
    os.environ["STRAWBOAT_DICT_COMPRESSION"] = "1"
    try:
        write_file(
            src,
            table,
            options=WriteOptions(
                default_compression=Compression.LZ4, max_page_size=1024
            ),
        )
    finally:
        del os.environ["STRAWBOAT_DICT_COMPRESSION"]
    dt = scan_file(src)

    import strawboat_tpu.codecs.binary as binary_codec

    def boom(*a, **k):
        raise AssertionError("row-wise binary dict_encode ran on device path")

    monkeypatch.setattr(binary_codec, "dict_encode", boom)
    write_device_table(
        dst,
        dt,
        WriteOptions(default_compression=Compression.LZ4, max_page_size=1024),
    )
    got = read_table(dst)
    assert got.column("s").to_pylist() == vals
    assert _page_kinds(dst)["s"] == {"dict"}


def test_nullable_string_roundtrip(tmp_path):
    import os

    rng = np.random.default_rng(7)
    n = 3000
    vals = [
        None if rng.random() < 0.2 else f"w{int(i)}"
        for i in rng.integers(0, 30, n)
    ]
    table = pa.table({"s": pa.array(vals, pa.string())})
    src = str(tmp_path / "src.str")
    dst = str(tmp_path / "dst.str")
    os.environ["STRAWBOAT_DICT_COMPRESSION"] = "1"
    try:
        write_file(
            src,
            table,
            options=WriteOptions(
                default_compression=Compression.LZ4, max_page_size=1024
            ),
        )
    finally:
        del os.environ["STRAWBOAT_DICT_COMPRESSION"]
    dt = scan_file(src)
    write_device_table(
        dst,
        dt,
        WriteOptions(default_compression=Compression.LZ4, max_page_size=1024),
    )
    got = read_table(dst)
    assert got.column("s").to_pylist() == vals


def test_shuffle_then_device_encode(tmp_path):
    """The SURVEY §7 step-3 story: scan → device transform → re-encode →
    rescan equality, with the sorted key column compressing structurally."""
    import jax.numpy as jnp

    from strawboat_tpu.exec.scan import DeviceColumn, DeviceTable

    rng = np.random.default_rng(4)
    n = 6000
    table = pa.table(
        {
            "k": pa.array(rng.integers(0, 64, n).astype(np.int64)),
            "v": pa.array(rng.integers(0, 1 << 30, n).astype(np.int64)),
        }
    )
    src = str(tmp_path / "src.str")
    dst = str(tmp_path / "dst.str")
    write_file(
        src,
        table,
        options=WriteOptions(
            default_compression=Compression.LZ4, max_page_size=2048
        ),
    )
    dt = scan_file(src)
    # device shuffle: sort by key (a deterministic stand-in for the
    # all_to_all exchange — rows re-ordered on device, then re-encoded)
    order = jnp.argsort(dt["k"].values)
    shuffled = DeviceTable(
        {
            name: DeviceColumn(name, c.dtype, c.values[order], None)
            for name, c in dt.columns.items()
        },
        dt.num_rows,
    )
    write_device_table(
        dst,
        shuffled,
        WriteOptions(
            default_compression=Compression.LZ4,
            max_page_size=2048,
            default_compress_ratio=1.0,
        ),
    )
    got = read_table(dst)
    got_k = np.asarray(got.column("k"))
    assert (np.diff(got_k) >= 0).all()  # shuffle order preserved
    assert sorted(
        zip(got_k.tolist(), np.asarray(got.column("v")).tolist())
    ) == sorted(
        zip(
            np.asarray(table.column("k")).tolist(),
            np.asarray(table.column("v")).tolist(),
        )
    )
    kinds = _page_kinds(dst)
    assert kinds["k"] & {"rle", "dict", "delta_bitpack", "bitpack", "one_value"}


def test_empty_table(tmp_path):
    table = pa.table({"a": pa.array([], pa.int64())})
    got, _ = _roundtrip(tmp_path, table)
    assert got.num_rows == 0


def test_decimal_roundtrip(tmp_path):
    """decimal128(≤18) rides as unscaled int64 on device; re-encode emits
    the i128 byte-matrix family back."""
    from decimal import Decimal

    vals = [Decimal("1.23"), Decimal("-45.10"), None, Decimal("999.99")] * 300
    table = pa.table({"d": pa.array(vals, pa.decimal128(12, 2))})
    got, _ = _roundtrip(tmp_path, table)
    assert got.column("d").to_pylist() == vals
