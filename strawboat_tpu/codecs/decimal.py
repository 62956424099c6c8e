"""Decimal128/Decimal256 (i128/i256) codec family.

The reference treats i128/i256 as ``IntegerType`` with the full codec set
(src/compression/integer/traits.rs:30-39).  numpy has no native 128/256-bit
integers, so values travel as ``(n, W)`` little-endian byte matrices
(W = 16 or 32 — exactly the arrow decimal buffer layout) and the structured
codecs operate on void views: RLE runs / Dict interning / Freq tops compare
raw bytes, which equals integer equality for fixed-width two's-complement.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..constants import Compression
from ..errors import OutOfSpecError
from ..util import env, roaring
from . import WriteOptions, common, read_header, write_header
from .integer import compress_integer, decompress_integer

MIN_DICT_RATIO = 3


def _void(values: np.ndarray) -> np.ndarray:
    """(n, W) u8 → (n,) void view for unique/equality."""
    W = values.shape[1]
    return np.ascontiguousarray(values).view([("b", f"V{W}")])["b"]


def _max_as_i64(values: np.ndarray) -> int:
    """max(value) as Rust ``as i64`` (low 64 bits, wrapped)."""
    if len(values) == 0:
        return 0
    # sortable key: most-significant byte (sign-flipped) as primary lexsort key
    key = values.copy()
    key[:, -1] ^= 0x80
    order = np.lexsort(key.T)  # columns LSB..MSB; last key (MSB) is primary
    top = values[int(order[-1])]
    lo = int.from_bytes(top[:8].tobytes(), "little")
    return ((lo + (1 << 63)) % (1 << 64)) - (1 << 63)


def rle_encode(values: np.ndarray, validity: Optional[np.ndarray]) -> bytes:
    n, W = values.shape
    if n == 0:
        return b""
    if validity is None or bool(validity.all()):
        valid_idx = np.arange(n)
        vv = values
    else:
        valid_idx = np.flatnonzero(validity)
        vv = values[valid_idx]
    if len(vv) == 0:
        return np.uint32(n).tobytes() + bytes(W)
    vvv = _void(vv).reshape(-1)
    neq = np.empty(len(vv), dtype=bool)
    neq[0] = True
    neq[1:] = vvv[1:] != vvv[:-1]
    starts_v = np.flatnonzero(neq)
    run_vals = vv[starts_v]
    starts_full = valid_idx[starts_v]
    starts_full[0] = 0
    ends_full = np.empty_like(starts_full)
    ends_full[:-1] = starts_full[1:]
    ends_full[-1] = n
    counts = (ends_full - starts_full).astype("<u4")
    rec = np.zeros((len(counts), 4 + W), dtype=np.uint8)
    rec[:, :4] = counts.view(np.uint8).reshape(-1, 4)
    rec[:, 4:] = run_vals
    return rec.tobytes()


def rle_decode(buf, pos: int, length: int, W: int) -> Tuple[np.ndarray, int]:
    rec_size = 4 + W
    if length == 0:
        return np.empty((0, W), dtype=np.uint8), pos
    avail = (len(buf) - pos) // rec_size
    raw = np.frombuffer(buf, np.uint8, avail * rec_size, pos).reshape(avail, rec_size)
    counts = raw[:, :4].copy().view("<u4").reshape(-1).astype(np.int64)
    cum = np.cumsum(counts)
    k = int(np.searchsorted(cum, length, side="left")) + 1
    if k > avail:
        raise OutOfSpecError("decimal RLE truncated")
    out = np.repeat(raw[:k, 4:], counts[:k], axis=0)[:length]
    return out, pos + k * rec_size


def one_value_encode(values: np.ndarray, validity: Optional[np.ndarray]) -> bytes:
    n, W = values.shape
    if validity is None:
        return values[0].tobytes() if n else bytes(W)
    nz = np.flatnonzero(validity)
    return values[nz[0]].tobytes() if len(nz) else bytes(W)


def one_value_decode(buf, pos: int, length: int, W: int) -> Tuple[np.ndarray, int]:
    val = np.frombuffer(buf, np.uint8, W, pos)
    return np.tile(val, (length, 1)), pos + W


def dict_encode(
    values: np.ndarray, validity: Optional[np.ndarray], options: WriteOptions
) -> bytes:
    n, W = values.shape
    if validity is None:
        pushed = np.ones(n, dtype=bool)
        eff = values
    else:
        pushed = validity.copy()
        eff = values
        if n and not pushed[0]:
            eff = values.copy()
            eff[0] = 0
            pushed[0] = True
    vv = _void(eff[pushed]).reshape(-1)
    uniq, first_idx, inv = np.unique(vv, return_index=True, return_inverse=True)
    order = np.argsort(first_idx, kind="stable")
    rank = np.empty(len(uniq), dtype=np.int64)
    rank[order] = np.arange(len(uniq))
    codes_pushed = rank[inv]
    sets = eff[pushed][first_idx[order]]
    codes = np.full(n, -1, dtype=np.int64)
    codes[pushed] = codes_pushed
    idx = np.where(codes >= 0, np.arange(n), -1)
    np.maximum.accumulate(idx, out=idx)
    codes = codes[idx] if n else codes
    out = bytearray()
    out += compress_integer(codes.astype(np.uint32), None, options.forbid(Compression.DICT))
    out += np.uint32(len(sets)).tobytes()
    out += sets.tobytes()
    return bytes(out)


def dict_decode(buf, pos: int, length: int, W: int) -> Tuple[np.ndarray, int]:
    indices, pos = decompress_integer(buf, pos, length, np.dtype(np.uint32))
    count = int(np.frombuffer(buf, "<u4", 1, pos)[0])
    pos += 4
    data = np.frombuffer(buf, np.uint8, count * W, pos).reshape(count, W)
    pos += count * W
    out = data[indices] if count else np.empty((0, W), np.uint8)
    return out, pos


def freq_encode(
    values: np.ndarray,
    validity: Optional[np.ndarray],
    options: WriteOptions,
) -> bytes:
    n, W = values.shape
    null_count = 0 if validity is None else int(n - np.count_nonzero(validity))
    top_is_null = n and null_count / n >= 0.9
    if top_is_null:
        top = np.zeros(W, dtype=np.uint8)
        mask = np.ones(n, dtype=bool)
    else:
        vv = _void(values).reshape(-1)
        uniq, counts = np.unique(vv, return_counts=True)
        top_v = uniq[int(np.argmax(counts))]
        top = np.frombuffer(top_v.tobytes(), np.uint8)
        mask = vv != top_v
    if validity is not None:
        mask = mask & validity
    positions = np.flatnonzero(mask).astype(np.uint32)
    bitmap = roaring.serialize(positions)
    out = bytearray()
    out += top.tobytes()
    out += np.uint32(len(bitmap)).tobytes()
    out += bitmap
    out += compress_decimal_body(values[mask], None, options.forbid(Compression.FREQ), W)
    return bytes(out)


def freq_decode(buf, pos: int, length: int, W: int) -> Tuple[np.ndarray, int]:
    top = np.frombuffer(buf, np.uint8, W, pos)
    pos += W
    bm = int(np.frombuffer(buf, "<u4", 1, pos)[0])
    pos += 4
    positions = roaring.deserialize(bytes(buf[pos : pos + bm]))
    pos += bm
    exceptions, pos = decompress_decimal_body(buf, pos, len(positions), W)
    out = np.tile(top, (length, 1))
    out[positions] = exceptions
    return out, pos


# ---------------------------------------------------------------------------
# driver


def _stats(values: np.ndarray, validity: Optional[np.ndarray]):
    n, W = values.shape
    vv = _void(values).reshape(-1)
    uniq, counts = np.unique(vv, return_counts=True)
    null_count = 0 if validity is None else int(n - np.count_nonzero(validity))
    return n, W, len(uniq), (int(counts.max()) if len(counts) else 0), null_count


def choose_compressor(values, validity, options: WriteOptions) -> Compression:
    forbidden = options.forbidden_compressions
    if env.check_freq_env() and Compression.FREQ not in forbidden:
        return Compression.FREQ
    if env.check_dict_env() and Compression.DICT not in forbidden:
        return Compression.DICT
    if env.check_rle_env() and Compression.RLE not in forbidden:
        return Compression.RLE
    result = options.default_compression
    if options.default_compress_ratio is None:
        return result
    n, W, unique, max_count, null_count = _stats(values, validity)
    total = n * W
    max_ratio = options.default_compress_ratio
    # OneValue
    if Compression.ONE_VALUE not in forbidden and unique <= 1 and n and float(n) > max_ratio:
        return Compression.ONE_VALUE
    # Freq (integer family gate: max.as_i64 >= 256)
    if Compression.FREQ not in forbidden and unique > 1 and n:
        if (null_count / n >= 0.9) or (
            max_count / n >= 0.9 and _max_as_i64(values) >= (1 << 8)
        ):
            r = float(n - 1)
            if r > max_ratio:
                max_ratio = r
                result = Compression.FREQ
    # Dict
    if Compression.DICT not in forbidden and unique * MIN_DICT_RATIO < n:
        from ..constants import get_bits_needed

        after = unique * W + n * (get_bits_needed(unique) // 8) + n * 2 // 128
        r = total / after if after else 0.0
        if r > max_ratio:
            max_ratio = r
            result = Compression.DICT
    # RLE (actual trial on full data — sampling omitted for byte-matrix type)
    if Compression.RLE not in forbidden and n:
        size = len(rle_encode(values, validity))
        r = total / size if size else float(n)
        if r > max_ratio:
            max_ratio = r
            result = Compression.RLE
    return result


def compress_decimal_body(values, validity, options: WriteOptions, W: int) -> bytes:
    """Framed page body for a (n, W) byte-matrix decimal column."""
    codec = choose_compressor(values, validity, options)
    if codec.raw_mode:
        body = common.compress(codec, values.tobytes())
    elif codec == Compression.RLE:
        body = rle_encode(values, validity)
    elif codec == Compression.DICT:
        body = dict_encode(values, validity, options)
    elif codec == Compression.ONE_VALUE:
        body = one_value_encode(values, validity)
    elif codec == Compression.FREQ:
        body = freq_encode(values, validity, options)
    else:
        raise OutOfSpecError(f"unknown decimal codec {codec}")
    return write_header(codec, len(body), values.shape[0] * W) + body


def decompress_decimal_body(buf, pos: int, length: int, W: int) -> Tuple[np.ndarray, int]:
    codec, csize, _us, body = read_header(buf, pos)
    end = body + csize
    if codec.raw_mode:
        raw = common.decompress(codec, bytes(buf[body:end]), length * W)
        return np.frombuffer(raw, np.uint8).reshape(length, W), end
    if codec == Compression.RLE:
        out, _ = rle_decode(buf, body, length, W)
    elif codec == Compression.DICT:
        out, _ = dict_decode(buf, body, length, W)
    elif codec == Compression.ONE_VALUE:
        out, _ = one_value_decode(buf, body, length, W)
    elif codec == Compression.FREQ:
        out, _ = freq_decode(buf, body, length, W)
    else:
        raise OutOfSpecError(f"unknown decimal codec {codec}")
    return out, end


compress_decimal = compress_decimal_body
decompress_decimal = decompress_decimal_body
