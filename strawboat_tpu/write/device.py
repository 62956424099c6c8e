"""Device-table writer: codec selection from HBM-resident stats.

SURVEY §7 step 3 — the post-shuffle re-encode case.  The reference writer's
two hot loops are a per-page host stats scan (integer/mod.rs:179-229) and
sampled trial compression (integer/mod.rs:231-347).  Here loop 1 runs as ONE
batched device reduction over every page of a column
(:func:`..kernels.encode.paged_stats_device` — masked min/max, run counts,
sortedness, hashed distinct estimate), and the codec chooser consumes those
scalars; only the chosen codec's byte serialization runs on the host, over
values fetched once per column.

Dictionary-coded string columns never materialize row strings: each page
emits a Dict page body (reference binary/dict.rs:55-141 layout) directly
from the device codes + the host dictionary.

Notes vs the host writer:
- FREQ is never chosen (it needs the exact mode; the device stats carry a
  distinct *estimate* only).  Any codec choice is format-legal — roundtrip
  equality, not byte-parity with the host writer, is the contract.
- boolean / decimal / list columns fall back to the host encoder.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..codecs import WriteOptions, common, write_header
from ..codecs._family import FamilyStats
from ..codecs import integer as integer_codec
from ..codecs import double as double_codec
from ..constants import Compression
from ..errors import NotYetImplementedError
from ..kernels.encode import paged_stats_device
from ..meta import ColumnMeta, PageMeta
from .serialize import _validity_prelude
from .writer import NativeWriter, _STATE_WRITTEN


def _family_stats_from_device(
    page_vals: np.ndarray,
    page_validity: Optional[np.ndarray],
    d: dict,
    i: int,
) -> FamilyStats:
    n = len(page_vals)
    dtype = page_vals.dtype
    null_count = int(d["null_count"][i])
    set_count = int(d["set_count"][i])
    run_count = int(d["run_count"][i])
    vmin = dtype.type(d["min"][i])
    vmax = dtype.type(d["max"][i])
    if set_count == 0:
        unique = 0
    elif vmin == vmax:
        unique = 1 if null_count == 0 else 2
    else:
        unique = max(2, int(d["unique_est"][i]))
    return FamilyStats(
        values=page_vals,
        validity=page_validity,
        tuple_count=n,
        total_bytes=n * dtype.itemsize,
        null_count=null_count,
        average_run_length=(n / run_count) if run_count else float("inf"),
        is_sorted=bool(d["is_sorted"][i]),
        min=vmin,
        max=vmax,
        unique_count=unique,
        top_value=vmin,  # FREQ disabled: estimate-only stats have no mode
        max_count=0,
        set_count=set_count,
    )


def _encode_numeric_page(
    vals: np.ndarray,
    validity: Optional[np.ndarray],
    stats: FamilyStats,
    options: WriteOptions,
) -> bytes:
    mod = double_codec if vals.dtype.kind == "f" else integer_codec
    opts = options.forbid(Compression.FREQ)
    codec = mod.choose_compressor(stats, opts)
    if codec.raw_mode:
        body = common.compress(
            codec, vals.astype(vals.dtype.newbyteorder("<"), copy=False).tobytes()
        )
    else:
        body = mod._codec_compress(codec, vals, validity, stats, opts)
    return write_header(codec, len(body), len(vals) * vals.dtype.itemsize) + body


def _encode_dict_string_page(
    codes: np.ndarray,
    validity: Optional[np.ndarray],
    dict_offsets: np.ndarray,
    dict_values: np.ndarray,
    options: WriteOptions,
) -> bytes:
    """Dict page body straight from codes: [indices page][u32 n][sets]."""
    uniq, inv = np.unique(codes, return_inverse=True)
    body = bytearray()
    body += integer_codec.compress_integer(
        inv.astype(np.uint32), None, options.forbid(Compression.DICT)
    )
    body += np.uint32(len(uniq)).tobytes()
    total_set_bytes = 0
    for u in uniq:
        s, e = int(dict_offsets[u]), int(dict_offsets[u + 1])
        body += np.uint64(e - s).tobytes()
        body += dict_values[s:e].tobytes()
        total_set_bytes += e - s
    # uncompressed_size for binary pages = the row value bytes
    lens = np.diff(dict_offsets)[codes]
    return (
        write_header(Compression.DICT, len(body), int(lens.sum()))
        + bytes(body)
    )


def write_device_table(path_or_file, table, options: WriteOptions = None):
    """Write a DeviceTable to a strawboat file, choosing codecs from
    device-computed page stats.  Returns the column metas.

    Roundtrip contract: ``scan_file(write_device_table(path, t)) == t``
    row-for-row (test: tests/test_device_write.py).
    """
    options = options or WriteOptions()
    page_size = int(options.max_page_size or max(table.num_rows, 1))
    page_size = max(min(page_size, max(table.num_rows, 1)), 1)

    fields = []
    for name, col in table.columns.items():
        if getattr(col, "offsets", None) is not None:
            raise NotYetImplementedError(
                f"device write of list column {name!r}"
            )
        dtype = col.dtype
        if dtype is None:
            dtype = pa.from_numpy_dtype(np.asarray(col.values[:1]).dtype)
        fields.append(pa.field(name, dtype, nullable=col.validity is not None))
    schema = pa.schema(fields)

    own = isinstance(path_or_file, str)
    f = open(path_or_file, "wb") if own else path_or_file
    try:
        w = NativeWriter(f, schema, options)
        w.start()
        for (name, col), field in zip(table.columns.items(), schema):
            start = w.offset
            pages = []
            for body, n_rows in _encode_column_pages(
                col, field, page_size, options
            ):
                page_start = w.offset
                w._write(body)
                pages.append(PageMeta(w.offset - page_start, n_rows))
            w.metas.append(ColumnMeta(start, pages))
        w._state = _STATE_WRITTEN
        w.finish()
        return w.metas
    finally:
        if own:
            f.close()


def _encode_column_pages(col, field, page_size: int, options: WriteOptions):
    """Yield (page_bytes, num_rows) for one device column."""
    is_string = col.dictionary is not None
    np_validity = None if col.validity is None else np.asarray(col.validity)
    n = len(col)
    if n == 0:  # host writer emits zero pages for an empty chunk
        return

    if is_string:
        codes = np.asarray(col.values).astype(np.int64)
        d = col.dictionary.cast(pa.large_binary())
        from ..columns import from_arrow

        dcol = from_arrow(d)
        for off in range(0, n, page_size):
            ln = min(page_size, n - off)
            pv = None if np_validity is None else np_validity[off : off + ln]
            out = bytearray()
            if field.nullable:
                out += _validity_prelude(
                    None if pv is None or pv.all() else pv, ln
                )
            out += _encode_dict_string_page(
                codes[off : off + ln], pv, dcol.offsets, dcol.values, options
            )
            yield bytes(out), ln
        return

    vals_dev = col.values
    np_vals = (
        col.host_exact
        if getattr(col, "host_exact", None) is not None
        else np.asarray(vals_dev)
    )
    if field.type is not None and pa.types.is_decimal(field.type):
        # device layout is unscaled int64; file layout is the i128/i256
        # byte matrix (reference decimal family)
        from ..codecs.decimal import compress_decimal

        W = field.type.bit_width // 8
        v = np_vals.astype(np.int64)
        limbs = np.empty((len(v), W // 8), dtype="<i8")
        limbs[:, 0] = v
        if W > 8:
            limbs[:, 1:] = (v >> 63)[:, None]
        mat = limbs.view(np.uint8).reshape(len(v), W)
        for off in range(0, n, page_size):
            ln = min(page_size, n - off)
            pv = None if np_validity is None else np_validity[off : off + ln]
            out = bytearray()
            if field.nullable:
                out += _validity_prelude(
                    None if pv is None or pv.all() else pv, ln
                )
            out += compress_decimal(mat[off : off + ln], pv, options, W)
            yield bytes(out), ln
        return

    if np_vals.dtype == np.bool_:
        # host fallback: boolean bitmap family
        from ..codecs import compress_boolean

        for off in range(0, n, page_size):
            ln = min(page_size, n - off)
            pv = None if np_validity is None else np_validity[off : off + ln]
            out = bytearray()
            if field.nullable:
                out += _validity_prelude(
                    None if pv is None or pv.all() else pv, ln
                )
            out += compress_boolean(np_vals[off : off + ln], pv, options)
            yield bytes(out), ln
        return

    # numeric: ONE batched device stats call for every page of the column
    d = paged_stats_device(vals_dev, col.validity, page_size)
    d = {k: np.asarray(v) for k, v in d.items()}
    for i, off in enumerate(range(0, n, page_size)):
        ln = min(page_size, n - off)
        pv = None if np_validity is None else np_validity[off : off + ln]
        out = bytearray()
        if field.nullable:
            out += _validity_prelude(
                None if pv is None or pv.all() else pv, ln
            )
        page_vals = np_vals[off : off + ln]
        stats = _family_stats_from_device(page_vals, pv, d, i)
        out += _encode_numeric_page(page_vals, pv, stats, options)
        yield bytes(out), ln
