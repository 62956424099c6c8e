"""Binary/Utf8 codec family (reference src/compression/binary/).

Raw-mode pages are TWO back-to-back 9-byte-headed blocks — re-zeroed offsets,
then the sliced values (binary/mod.rs:44-91).  Structured codecs: Dict
(indices page + [u64 len][bytes] sets), Freq (top slice + roaring exception
bitmap + plain exceptions), OneValue ([u32 len][bytes]).
Codec choice uses analytic ratios only (no trial sampling) — binary/mod.rs:293-348.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

from ..constants import Compression, get_bits_needed
from ..errors import OutOfSpecError
from ..util import env, roaring
from . import WriteOptions, common, read_header, write_header
from ._family import MIN_DICT_RATIO
from .integer import compress_integer, decompress_integer


@dataclass
class BinaryStats:
    """reference binary/mod.rs:254-291 — distinct over ALL positions."""

    tuple_count: int
    total_bytes: int
    unique_count: int
    total_unique_size: int
    null_count: int
    max_count: int  # count of the most frequent slice
    top_value: bytes
    # the dictionary_encode of the page's array (over ALL slots) — stats
    # and dict_encode used to each run their own hash pass over every
    # slice; one pass now serves both (dict_encode reuses this whenever
    # the push rule doesn't reorder, i.e. no nulls)
    denc: object = None


def gen_stats(
    offsets: np.ndarray, values: np.ndarray, validity: Optional[np.ndarray]
) -> BinaryStats:
    n = len(offsets) - 1
    null_count = 0 if validity is None else int(n - np.count_nonzero(validity))
    arr = _to_pa(offsets, values, None)  # no validity: distinct over all slots
    denc = arr.dictionary_encode()
    uniques = denc.dictionary
    idx = denc.indices.to_numpy(zero_copy_only=False)
    counts = np.bincount(idx, minlength=len(uniques)) if n else np.zeros(0, np.int64)
    if len(counts):
        top_i = int(np.argmax(counts))
        max_count = int(counts[top_i])
        top_value = uniques[top_i].as_py() or b""
        if isinstance(top_value, str):
            top_value = top_value.encode()
    else:
        max_count, top_value = 0, b""
    # total unique size: sum over distinct slices of (len + 8)
    uniq_lens = pa.compute.binary_length(uniques).to_numpy(zero_copy_only=False)
    return BinaryStats(
        tuple_count=n,
        total_bytes=int(offsets[-1] - offsets[0]) + (n + 1) * offsets.dtype.itemsize,
        unique_count=len(uniques),
        total_unique_size=int(uniq_lens.sum()) + 8 * len(uniques),
        null_count=null_count,
        max_count=max_count,
        top_value=top_value,
        denc=denc,
    )


def _to_pa(
    offsets: np.ndarray, values: np.ndarray, validity: Optional[np.ndarray]
) -> pa.Array:
    from ..util.bits import pack_bitmap

    offs = offsets
    vals = values
    if len(offs) and offs[0] != 0:
        vals = values[offs[0] : offs[-1]]
        offs = offs - offs[0]
    typ = pa.large_binary() if offs.dtype == np.int64 else pa.binary()
    vbuf = pa.py_buffer(pack_bitmap(validity)) if validity is not None else None
    return pa.Array.from_buffers(
        typ,
        len(offs) - 1,
        [vbuf, pa.py_buffer(offs.tobytes()), pa.py_buffer(vals.tobytes())],
    )


# ---------------------------------------------------------------------------
# structured codecs


def one_value_encode(
    offsets: np.ndarray, values: np.ndarray, validity: Optional[np.ndarray]
) -> bytes:
    n = len(offsets) - 1
    val = b""
    if validity is None:
        idx = 0 if n else None
    else:
        nz = np.flatnonzero(validity)
        idx = int(nz[0]) if len(nz) else None
    if idx is not None:
        val = values[offsets[idx] : offsets[idx + 1]].tobytes()
    return np.uint32(len(val)).tobytes() + val


def one_value_decode(
    buf, pos: int, length: int, odtype: np.dtype
) -> Tuple[np.ndarray, np.ndarray, int]:
    ln = int(np.frombuffer(buf, "<u4", 1, pos)[0])
    pos += 4
    if pos + ln > len(buf):
        raise OutOfSpecError(f"data size is less than {ln}")
    val = np.frombuffer(buf, np.uint8, ln, pos)
    pos += ln
    offsets = (np.arange(length + 1, dtype=np.int64) * ln).astype(odtype)
    return offsets, np.tile(val, length), pos


def dict_encode(
    offsets: np.ndarray,
    values: np.ndarray,
    validity: Optional[np.ndarray],
    options: WriteOptions,
    stats: Optional[BinaryStats] = None,
) -> bytes:
    n = len(offsets) - 1
    # push rule (binary/dict.rs:66-76): nulls repeat the last index, except a
    # null at position 0 which pushes its (usually empty) slice.
    if validity is None:
        pushed = np.ones(n, dtype=bool)
    else:
        pushed = validity.copy()
        if n:
            pushed[0] = True
    if validity is None and stats is not None and stats.denc is not None:
        # no nulls → the push rule keeps every slot in order, so the
        # stats pass's dictionary_encode IS the encode's (one hash pass
        # per page instead of two)
        dict_enc = stats.denc
    else:
        arr = _to_pa(offsets, values, None)
        dict_enc = arr.take(np.flatnonzero(pushed)).dictionary_encode()
    codes_pushed = dict_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    sets = dict_enc.dictionary
    codes = np.full(n, -1, dtype=np.int64)
    codes[pushed] = codes_pushed
    idx = np.where(codes >= 0, np.arange(n), -1)
    np.maximum.accumulate(idx, out=idx)
    codes = codes[idx] if n else codes
    out = bytearray()
    out += compress_integer(
        codes.astype(np.uint32), None, options.forbid(Compression.DICT)
    )
    out += np.uint32(len(sets)).tobytes()
    from ..columns import from_arrow as _from_arrow

    set_col = _from_arrow(sets.cast(pa.large_binary()))
    so, sv = set_col.offsets, set_col.values
    for i in range(len(sets)):
        s, e = int(so[i]), int(so[i + 1])
        out += np.uint64(e - s).tobytes()
        out += sv[s:e].tobytes()
    return bytes(out)


def dict_decode(
    buf, pos: int, length: int, odtype: np.dtype
) -> Tuple[np.ndarray, np.ndarray, int]:
    indices, pos = decompress_integer(buf, pos, length, np.dtype(np.uint32))
    count = int(np.frombuffer(buf, "<u4", 1, pos)[0])
    pos += 4
    data_offs = np.zeros(count + 1, dtype=np.int64)
    parts = []
    for i in range(count):
        ln = int(np.frombuffer(buf, "<u8", 1, pos)[0])
        pos += 8
        if pos + ln > len(buf):
            raise OutOfSpecError(f"data size is less than {ln}")
        parts.append(np.frombuffer(buf, np.uint8, ln, pos))
        pos += ln
        data_offs[i + 1] = data_offs[i] + ln
    data = np.concatenate(parts) if parts else np.empty(0, dtype=np.uint8)
    lens = np.diff(data_offs)[indices] if count else np.zeros(len(indices), np.int64)
    offsets = np.zeros(length + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    # gather slices
    if count and data_offs[-1]:
        starts = data_offs[indices]
        out_vals = np.empty(int(offsets[-1]), dtype=np.uint8)
        _gather_slices(data, starts, lens, offsets, out_vals)
    else:
        out_vals = np.empty(0, dtype=np.uint8)
    return offsets.astype(odtype), out_vals, pos


def _gather_slices(data, starts, lens, out_offsets, out_vals):
    """Copy data[starts[i]:starts[i]+lens[i]] → out_vals[out_offsets[i]:...]."""
    # vectorized gather: build per-byte source indices
    total = int(out_offsets[-1])
    if total == 0:
        return
    reps = lens.astype(np.int64)
    base = np.repeat(starts.astype(np.int64) - out_offsets[:-1], reps)
    idx = base + np.arange(total, dtype=np.int64)
    out_vals[:] = data[idx]


def freq_encode(
    offsets: np.ndarray,
    values: np.ndarray,
    validity: Optional[np.ndarray],
    stats: BinaryStats,
    options: WriteOptions,
) -> bytes:
    n = len(offsets) - 1
    top_is_null = stats.tuple_count and stats.null_count / stats.tuple_count >= 0.9
    top = b"" if top_is_null else stats.top_value
    arr = _to_pa(offsets, values, None)
    if top_is_null:
        mask = np.ones(n, dtype=bool)
    else:
        eq = pa.compute.equal(arr, pa.scalar(top, type=arr.type)).to_numpy(
            zero_copy_only=False
        )
        mask = ~eq.astype(bool)
    if validity is not None:
        mask &= validity
    positions = np.flatnonzero(mask).astype(np.uint32)
    bitmap = roaring.serialize(positions)
    out = bytearray()
    out += np.uint64(len(top)).tobytes()
    out += top
    out += np.uint32(len(bitmap)).tobytes()
    out += bitmap
    # plain-encoded exceptions (binary/freq.rs:95-99)
    for i in positions:
        s, e = int(offsets[i]), int(offsets[i + 1])
        out += np.uint64(e - s).tobytes()
        out += values[s:e].tobytes()
    return bytes(out)


def freq_decode(
    buf, pos: int, length: int, odtype: np.dtype
) -> Tuple[np.ndarray, np.ndarray, int]:
    top_len = int(np.frombuffer(buf, "<u8", 1, pos)[0])
    pos += 8
    top = bytes(buf[pos : pos + top_len])
    pos += top_len
    bm_size = int(np.frombuffer(buf, "<u4", 1, pos)[0])
    pos += 4
    positions = roaring.deserialize(bytes(buf[pos : pos + bm_size]))
    pos += bm_size
    is_exc = np.zeros(length, dtype=bool)
    is_exc[positions] = True
    exc_parts = []
    exc_lens = np.zeros(len(positions), dtype=np.int64)
    for j in range(len(positions)):
        ln = int(np.frombuffer(buf, "<u8", 1, pos)[0])
        pos += 8
        if pos + ln > len(buf):
            raise OutOfSpecError(f"data size is less than {ln}")
        exc_parts.append(np.frombuffer(buf, np.uint8, ln, pos))
        pos += ln
        exc_lens[j] = ln
    lens = np.full(length, len(top), dtype=np.int64)
    lens[positions] = exc_lens
    offsets = np.zeros(length + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    top_arr = np.frombuffer(top, dtype=np.uint8)
    exc_data = np.concatenate(exc_parts) if exc_parts else np.empty(0, np.uint8)
    exc_offs = np.zeros(len(positions) + 1, dtype=np.int64)
    np.cumsum(exc_lens, out=exc_offs[1:])
    total = int(offsets[-1])
    # vectorized assembly: per-byte source indices into a [top | exc] pool
    pool = np.concatenate([top_arr, exc_data])
    src_start = np.zeros(length, dtype=np.int64)  # top rows read pool[0:]
    src_start[positions] = len(top_arr) + exc_offs[:-1]
    base = np.repeat(src_start - offsets[:-1], lens)
    idx = base + np.arange(total, dtype=np.int64)
    out_vals = pool[idx] if total else np.empty(0, np.uint8)
    return offsets.astype(odtype), out_vals, pos


# ---------------------------------------------------------------------------
# ratios (binary/dict.rs:44-55, binary/freq.rs:131-152, one_value.rs:44-50)


def _dict_ratio(stats: BinaryStats) -> float:
    if stats.unique_count * MIN_DICT_RATIO >= stats.tuple_count:
        return 0.0
    after = stats.total_unique_size + stats.tuple_count * (
        get_bits_needed(stats.unique_count) // 8
    )
    after += stats.tuple_count * 2 // 128
    return stats.total_bytes / after if after else 0.0


def _freq_ratio(stats: BinaryStats) -> float:
    if stats.unique_count <= 1:
        return 0.0
    if stats.tuple_count and stats.null_count / stats.tuple_count >= 0.9:
        return float(stats.tuple_count - 1)
    if stats.tuple_count and stats.max_count / stats.tuple_count >= 0.9:
        return float(stats.tuple_count - 1)
    return 0.0


def _one_value_ratio(stats: BinaryStats) -> float:
    return float(stats.tuple_count) if stats.unique_count <= 1 else 0.0


def choose_compressor(stats: BinaryStats, options: WriteOptions) -> Compression:
    forbidden = options.forbidden_compressions
    if env.check_freq_env() and Compression.FREQ not in forbidden:
        return Compression.FREQ
    if env.check_dict_env() and Compression.DICT not in forbidden:
        return Compression.DICT
    result = options.default_compression
    if options.default_compress_ratio is None:
        return result
    max_ratio = options.default_compress_ratio
    for codec, ratio_fn in (
        (Compression.ONE_VALUE, _one_value_ratio),
        (Compression.FREQ, _freq_ratio),
        (Compression.DICT, _dict_ratio),
    ):
        if codec in forbidden:
            continue
        r = ratio_fn(stats)
        if r > max_ratio:
            max_ratio = r
            result = codec
            if r == float(stats.tuple_count):
                break
    return result


# ---------------------------------------------------------------------------
# driver (binary/mod.rs:26-217)


def compress_binary(
    offsets: np.ndarray,
    values: np.ndarray,
    validity: Optional[np.ndarray],
    options: WriteOptions,
) -> bytes:
    if options.default_compress_ratio is None and not (
        env.check_freq_env() or env.check_dict_env()
    ):
        stats = None
        codec = options.default_compression
    else:
        stats = gen_stats(offsets, values, validity)
        codec = choose_compressor(stats, options)
    from ..util.obs import log_codec_choice

    log_codec_choice("binary", codec)
    out = bytearray()
    if codec.raw_mode:
        # block 1: zero-based offsets
        offs = offsets if (len(offsets) == 0 or offsets[0] == 0) else offsets - offsets[0]
        raw = offs.astype(offs.dtype.newbyteorder("<")).tobytes()
        body = common.compress(codec, raw)
        out += write_header(codec, len(body), len(raw))
        out += body
        # block 2: sliced values
        vals = values[offsets[0] : offsets[-1]] if len(offsets) else values[:0]
        raw2 = vals.tobytes()
        body2 = common.compress(codec, raw2)
        out += write_header(codec, len(body2), len(raw2))
        out += body2
        return bytes(out)
    if codec == Compression.ONE_VALUE:
        body = one_value_encode(offsets, values, validity)
    elif codec == Compression.DICT:
        body = dict_encode(offsets, values, validity, options, stats)
    elif codec == Compression.FREQ:
        body = freq_encode(offsets, values, validity, stats, options)
    else:
        raise OutOfSpecError(f"unknown binary codec {codec}")
    nvals = int(offsets[-1] - offsets[0]) if len(offsets) else 0
    out += write_header(codec, len(body), nvals)
    out += body
    return bytes(out)


def decompress_binary(
    buf, pos: int, length: int, odtype: np.dtype
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Returns (offsets[length+1], values, new_pos)."""
    odtype = np.dtype(odtype)
    codec, csize, _usize, body_pos = read_header(buf, pos)
    if codec.raw_mode:
        raw = common.decompress(
            codec, bytes(buf[body_pos : body_pos + csize]), (length + 1) * odtype.itemsize
        )
        offsets = np.frombuffer(raw, dtype=odtype)
        pos = body_pos + csize
        codec2, csize2, usize2, body_pos2 = read_header(buf, pos)
        raw2 = common.decompress(
            codec2, bytes(buf[body_pos2 : body_pos2 + csize2]), usize2
        )
        values = np.frombuffer(raw2, dtype=np.uint8)
        return offsets, values, body_pos2 + csize2
    end = body_pos + csize
    if codec == Compression.ONE_VALUE:
        offsets, values, _ = one_value_decode(buf, body_pos, length, odtype)
    elif codec == Compression.DICT:
        offsets, values, _ = dict_decode(buf, body_pos, length, odtype)
    elif codec == Compression.FREQ:
        offsets, values, _ = freq_decode(buf, body_pos, length, odtype)
    else:
        raise OutOfSpecError(f"unknown binary codec {codec}")
    return offsets, values, end
