"""Boolean codec family (reference src/compression/boolean/).

Raw-mode body is the packed bitmap bytes; the header's uncompressed_size field
is the *row count* (boolean/mod.rs:58).  Structured codecs: RLE
([u32 run_len][u8 value], nulls merged into runs) and OneValue (one byte).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from ..constants import SAMPLE_COUNT, SAMPLE_SIZE, Compression
from ..errors import OutOfSpecError
from ..util import env
from ..util.bits import pack_bitmap, unpack_bitmap
from . import WriteOptions, common, read_header, write_header
from ._family import rle_encode


@dataclass
class BooleanStats:
    """reference boolean/mod.rs:139-192."""

    values: np.ndarray
    validity: Optional[np.ndarray]
    rows: int
    total_bytes: int
    null_count: int
    false_count: int
    true_count: int
    average_run_length: float


def gen_stats(values: np.ndarray, validity: Optional[np.ndarray]) -> BooleanStats:
    n = len(values)
    if validity is None:
        null_count = 0
        valid_vals = values
    else:
        null_count = int(n - np.count_nonzero(validity))
        valid_vals = values[validity]
    true_count = int(np.count_nonzero(valid_vals))
    false_count = len(valid_vals) - true_count
    # run count: last_value seeded from element 0 (valid or not), then counts
    # transitions over valid values (boolean/mod.rs:155-180)
    run_count = 0
    if n:
        last = bool(values[0]) if (validity is None or validity[0]) else False
        if len(valid_vals):
            prev = np.empty_like(valid_vals)
            prev[0] = last
            prev[1:] = valid_vals[:-1]
            run_count = int(np.count_nonzero(valid_vals != prev))
    return BooleanStats(
        values=values,
        validity=validity,
        rows=n,
        total_bytes=n // 8,
        null_count=null_count,
        false_count=false_count,
        true_count=true_count,
        average_run_length=(n / 8.0 / run_count) if run_count else float("inf"),
    )


def rle_bool_encode(values: np.ndarray, validity: Optional[np.ndarray]) -> bytes:
    return rle_encode(values.astype(np.uint8), validity)


def rle_bool_decode(buf, pos: int, length: int) -> Tuple[np.ndarray, int]:
    if length == 0:
        return np.empty(0, dtype=bool), pos
    rec = np.dtype(
        {"names": ["len", "val"], "formats": ["<u4", "u1"], "offsets": [0, 4], "itemsize": 5}
    )
    avail = (len(buf) - pos) // 5
    recs = np.frombuffer(buf, dtype=rec, count=avail, offset=pos)
    cum = np.cumsum(recs["len"].astype(np.int64))
    k = int(np.searchsorted(cum, length, side="left")) + 1
    if k > avail or (k > 0 and cum[k - 1] < length):
        raise OutOfSpecError("boolean RLE truncated")
    out = np.repeat(recs["val"][:k] != 0, recs["len"][:k].astype(np.int64))[:length]
    return out, pos + k * 5


def one_value_encode(values: np.ndarray, validity: Optional[np.ndarray]) -> bytes:
    if validity is None:
        val = bool(values[0]) if len(values) else False
    else:
        nz = np.flatnonzero(validity)
        val = bool(values[nz[0]]) if len(nz) else False
    return bytes([1 if val else 0])


def one_value_decode(buf, pos: int, length: int) -> Tuple[np.ndarray, int]:
    if pos >= len(buf):
        raise OutOfSpecError("data size is less than 1")
    return np.full(length, buf[pos] > 0, dtype=bool), pos + 1


def _rle_ratio(stats: BooleanStats, rng: np.random.Generator) -> float:
    n = stats.rows
    values, validity = stats.values, stats.validity
    if n // SAMPLE_COUNT > SAMPLE_SIZE:
        separator = n // SAMPLE_COUNT
        remainder = n % SAMPLE_COUNT
        vp, mp = [], []
        for i in range(SAMPLE_COUNT):
            range_end = (
                separator + remainder if i == SAMPLE_COUNT - 1 else separator
            ) - SAMPLE_SIZE
            begin = i * separator + int(rng.integers(0, range_end))
            vp.append(values[begin : begin + SAMPLE_SIZE])
            if validity is not None:
                mp.append(validity[begin : begin + SAMPLE_SIZE])
        values = np.concatenate(vp)
        validity = np.concatenate(mp) if validity is not None else None
        total = len(values) // 8
    else:
        total = stats.total_bytes
    size = len(rle_bool_encode(values, validity))
    return total / size if size else float(total)


def choose_compressor(stats: BooleanStats, options: WriteOptions) -> Compression:
    forbidden = options.forbidden_compressions
    if env.check_rle_env() and Compression.RLE not in forbidden:
        return Compression.RLE
    result = options.default_compression
    if options.default_compress_ratio is None:
        return result
    rng = np.random.default_rng(options.sample_seed)
    max_ratio = options.default_compress_ratio
    # OneValue then RLE (boolean/mod.rs:215-218)
    if Compression.ONE_VALUE not in forbidden:
        r = float(stats.rows) if (stats.true_count == 0 or stats.false_count == 0) else 0.0
        if r > max_ratio:
            return Compression.ONE_VALUE
    if Compression.RLE not in forbidden:
        r = _rle_ratio(stats, rng)
        if r > max_ratio:
            result = Compression.RLE
    return result


def compress_boolean(
    values: np.ndarray,
    validity: Optional[np.ndarray],
    options: WriteOptions,
) -> bytes:
    if options.default_compress_ratio is None and not env.check_rle_env():
        stats = None
        codec = options.default_compression
    else:
        stats = gen_stats(values, validity)
        codec = choose_compressor(stats, options)
    from ..util.obs import log_codec_choice

    log_codec_choice("boolean", codec)
    if codec.raw_mode:
        body = common.compress(codec, pack_bitmap(values))
    elif codec == Compression.RLE:
        body = rle_bool_encode(values, validity)
    elif codec == Compression.ONE_VALUE:
        body = one_value_encode(values, validity)
    else:
        raise OutOfSpecError(f"unknown boolean codec {codec}")
    return write_header(codec, len(body), len(values)) + body


def decompress_boolean(buf, pos: int, length: int) -> Tuple[np.ndarray, int]:
    codec, csize, _usize, body_pos = read_header(buf, pos)
    end = body_pos + csize
    if end > len(buf):
        raise OutOfSpecError("boolean page truncated")
    if codec.raw_mode:
        nbytes = (length + 7) // 8
        raw = common.decompress(codec, bytes(buf[body_pos:end]), nbytes)
        return unpack_bitmap(raw, length), end
    if codec == Compression.RLE:
        out, _ = rle_bool_decode(buf, body_pos, length)
    elif codec == Compression.ONE_VALUE:
        out, _ = one_value_decode(buf, body_pos, length)
    else:
        raise OutOfSpecError(f"unknown boolean codec {codec}")
    return out, end
