"""Double (float) codec family: driver + Patas.

Mirrors src/compression/double/mod.rs (driver) and patas.rs (DuckDB-style
PATAS float compression: per-value XOR against a ring-buffer reference).
Shared RLE / Dict / OneValue / Freq come from ``_family`` — the same codecs
the reference reuses for DoubleType (double/{dict,freq,rle,one_value}.rs).

f32 note: the reference's Patas unpack turns ``significant_bytes == 0`` into
8 whenever ``trailing_zeros < 63`` (patas.rs:155-162), which breaks the
equal-value marker for f32 (trailing_zeros field == 31): ``read_value_custom``
then copies those 8 bytes into the 4-byte ``T::Bytes`` buffer (out-of-bounds,
patas.rs:165-181) and ``consume``s 8 bytes the encoder never wrote
(patas.rs:124-125) — the stream desyncs, so reference f32 streams containing
equal values cannot round-trip at all.  We instead treat
``trailing_zeros == bit_width - 1`` as the equal marker for the actual value
width: bit-identical to the reference for f64 (fixture:
test_golden.test_patas_f64_layout), fixture-locked for f32
(test_patas_f32_layout_fixture_locked), and read-compatible with
reference-layout f32 streams that contain no equal markers
(test_patas_f32_reads_reference_layout_stream).  (tz=31, sig=0) is
unambiguous: a genuine xor with tz=31 has sig_bits=1, sig_bytes=1.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..constants import Compression
from ..errors import OutOfSpecError
from ..util import env
from . import WriteOptions, common, read_header, write_header
from ._family import (
    FamilyStats,
    compress_sample_ratio,
    dict_decode,
    dict_encode,
    dict_ratio,
    freq_decode,
    freq_encode,
    freq_ratio,
    gen_stats,
    one_value_decode,
    one_value_encode,
    rle_decode,
    rle_encode,
)
from .integer import decompress_integer

# ---------------------------------------------------------------------------
# Patas (reference double/patas.rs:34-202)

_RING = 128


def patas_encode(values: np.ndarray) -> bytes:
    from .. import native

    if len(values) > 256:
        out = native.patas_encode_native(values) if native.available() else None
        if out is not None:
            return out
    return _patas_encode_py(values)


def _patas_encode_py(values: np.ndarray) -> bytes:
    dtype = values.dtype
    width = dtype.itemsize  # 4 or 8
    wbits = width * 8
    bits = values.view(f"<u{width}")
    n = len(bits)
    out = bytearray()
    if n == 0:
        return b""
    indices: dict = {}
    bl = bits.tolist()  # python ints, fast loop
    out += int(bl[0]).to_bytes(width, "little")
    indices[bl[0]] = 0
    mask = (1 << wbits) - 1
    for i in range(1, n):
        val = bl[i]
        ref_idx = indices.get(val, 0)
        if ref_idx > i or (i - ref_idx) >= _RING:
            ref_idx = i - 1
        diff = i - ref_idx
        refer = bl[i - diff]
        xor = val ^ refer
        if xor == 0:
            tz = wbits
        else:
            tz = (xor & -xor).bit_length() - 1
        lz = wbits - xor.bit_length() if xor else wbits
        is_equal = 1 if tz == wbits else 0
        if is_equal:
            sig_bits = 0
        else:
            sig_bits = wbits - tz - lz
        sig_bytes = (sig_bits >> 3) + (1 if (sig_bits & 7) else 0)
        packed = ((diff & 0x7F) << 9) | ((sig_bytes & 7) << 6) | (tz - is_equal)
        out += packed.to_bytes(2, "little")
        if sig_bytes:
            payload = (xor >> (tz - is_equal)) & mask
            out += payload.to_bytes(width, "little")[:sig_bytes]
        indices[val] = i
    return bytes(out)


def patas_decode(buf, pos: int, length: int, dtype: np.dtype) -> Tuple[np.ndarray, int]:
    from .. import native

    dtype = np.dtype(dtype)
    if length > 256 and native.available():
        out = native.patas_decode_native(np.asarray(buf, dtype=np.uint8), pos, length, dtype)
        if out is not None:
            # consumed size is not tracked by the native path; the framing
            # layer advances by compressed_size, so return pos unchanged-safe
            return out, pos
    return _patas_decode_py(buf, pos, length, dtype)


def _patas_decode_py(buf, pos: int, length: int, dtype: np.dtype) -> Tuple[np.ndarray, int]:
    dtype = np.dtype(dtype)
    width = dtype.itemsize
    wbits = width * 8
    equal_tz = wbits - 1
    mask = (1 << wbits) - 1
    if pos + width > len(buf):
        raise OutOfSpecError("patas page truncated")
    mv = bytes(buf[pos : pos + length * (width + 2) + width])  # upper bound slice
    p = 0
    first = int.from_bytes(mv[p : p + width], "little")
    p += width
    out = [0] * length
    if length:
        out[0] = first
    for i in range(1, length):
        packed = int.from_bytes(mv[p : p + 2], "little")
        p += 2
        diff = (packed >> 9) & 0x7F
        sig = (packed >> 6) & 0x7
        tz = packed & 0x3F
        if tz < equal_tz and sig == 0:
            sig = 8
        if sig > width and tz < 8:
            sig = width
        if sig > width:
            val = 0
            p += sig
        else:
            val = int.from_bytes(mv[p : p + sig], "little")
            p += sig
        prev = out[i - diff]
        out[i] = ((val << tz) & mask) ^ prev
    arr = np.asarray(out, dtype=np.uint64).astype(f"<u{width}").view(dtype)
    return arr, pos + p


# ---------------------------------------------------------------------------
# driver (reference double/mod.rs:32-307)


def _codec_compress(
    codec: Compression,
    values: np.ndarray,
    validity: Optional[np.ndarray],
    stats: FamilyStats,
    options: WriteOptions,
) -> bytes:
    if codec == Compression.RLE:
        return rle_encode(values, validity)
    if codec == Compression.DICT:
        return dict_encode(values, validity, options, _compress_indices, stats)
    if codec == Compression.ONE_VALUE:
        return one_value_encode(values, validity)
    if codec == Compression.FREQ:
        return freq_encode(values, validity, stats, options, compress_double)
    if codec == Compression.PATAS:
        return patas_encode(values)
    raise OutOfSpecError(f"unknown double codec {codec}")


def _compress_indices(values, validity, options):
    # dict indices are a u32 page compressed with the *integer* family
    from .integer import compress_integer

    return compress_integer(values, validity, options)


def _ratio(codec: Compression, stats: FamilyStats, rng: np.random.Generator) -> float:
    if codec == Compression.ONE_VALUE:
        return float(stats.tuple_count) if stats.unique_count <= 1 else 0.0
    if codec == Compression.FREQ:
        return freq_ratio(stats, require_big_max=False)
    if codec == Compression.DICT:
        return dict_ratio(stats)
    if codec == Compression.PATAS:
        return compress_sample_ratio(
            lambda v, m, s, o: patas_encode(v), stats, rng, WriteOptions
        )
    if codec == Compression.RLE:
        return compress_sample_ratio(
            lambda v, m, s, o: rle_encode(v, m), stats, rng, WriteOptions
        )
    return 0.0


_CHOICE_ORDER = (
    Compression.ONE_VALUE,
    Compression.FREQ,
    Compression.DICT,
    Compression.PATAS,
    Compression.RLE,
)


def choose_compressor(stats: FamilyStats, options: WriteOptions) -> Compression:
    forbidden = options.forbidden_compressions
    if env.check_freq_env() and Compression.FREQ not in forbidden:
        return Compression.FREQ
    if env.check_dict_env() and Compression.DICT not in forbidden:
        return Compression.DICT
    if env.check_rle_env() and Compression.RLE not in forbidden:
        return Compression.RLE
    if env.check_patas_env() and Compression.PATAS not in forbidden:
        return Compression.PATAS
    result = options.default_compression
    if options.default_compress_ratio is None:
        return result
    rng = np.random.default_rng(options.sample_seed)
    max_ratio = options.default_compress_ratio
    for codec in _CHOICE_ORDER:
        if codec in forbidden:
            continue
        r = _ratio(codec, stats, rng)
        if r > max_ratio:
            max_ratio = r
            result = codec
            if r == float(stats.tuple_count):
                break
    return result


def compress_double(
    values: np.ndarray,
    validity: Optional[np.ndarray],
    options: WriteOptions,
) -> bytes:
    if options.default_compress_ratio is None and not (
        env.check_freq_env()
        or env.check_dict_env()
        or env.check_rle_env()
        or env.check_patas_env()
    ):
        stats = None
        codec = options.default_compression
    else:
        stats = gen_stats(values, validity)
        codec = choose_compressor(stats, options)
    from ..util.obs import log_codec_choice

    log_codec_choice("double", codec)
    if codec.raw_mode:
        body = common.compress(
            codec, values.astype(values.dtype.newbyteorder("<"), copy=False).tobytes()
        )
    else:
        body = _codec_compress(codec, values, validity, stats, options)
    header = write_header(codec, len(body), len(values) * values.dtype.itemsize)
    return header + body


def decompress_double(buf, pos: int, length: int, dtype: np.dtype) -> Tuple[np.ndarray, int]:
    dtype = np.dtype(dtype)
    codec, csize, _usize, body_pos = read_header(buf, pos)
    end = body_pos + csize
    if end > len(buf):
        raise OutOfSpecError("double page truncated")
    if codec.raw_mode:
        raw = common.decompress(codec, bytes(buf[body_pos:end]), length * dtype.itemsize)
        return np.frombuffer(raw, dtype=dtype), end
    if codec == Compression.RLE:
        out, _ = rle_decode(buf, body_pos, length, dtype)
    elif codec == Compression.DICT:
        out, _ = dict_decode(buf, body_pos, length, dtype, decompress_integer)
    elif codec == Compression.ONE_VALUE:
        out, _ = one_value_decode(buf, body_pos, length, dtype)
    elif codec == Compression.FREQ:
        out, _ = freq_decode(buf, body_pos, length, dtype, decompress_double)
    elif codec == Compression.PATAS:
        out, _ = patas_decode(buf, body_pos, length, dtype)
    else:
        raise OutOfSpecError(f"unknown double codec {codec}")
    return out, end
