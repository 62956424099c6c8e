"""Integer codec family: driver + Bitpacking / DeltaBitpacking.

Mirrors src/compression/integer/mod.rs (driver, stats, chooser) and
bp.rs / delta_bp.rs (BitPacker4x-compatible 128-value blocks).
Shared RLE / Dict / OneValue / Freq live in ``_family``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..constants import SAMPLE_COUNT, SAMPLE_SIZE, Compression
from ..errors import OutOfSpecError
from ..util import env
from ..util.bits import BLOCK_LEN, num_bits_u32, pack_block128, unpack_block128
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

INTEGER_DTYPES = frozenset("bBhHiIlLqQ")  # numpy kinds i/u at widths 1..8


# ---------------------------------------------------------------------------
# Bitpacking (reference bp.rs:36-101)


def bitpack_encode(values: np.ndarray) -> bytes:
    """Per 128-value block: [u8 num_bits][BitPacker4x packed bytes]."""
    v = values.view(np.uint32) if values.dtype != np.uint32 else values
    if len(v) % BLOCK_LEN != 0:
        raise OutOfSpecError("bitpacking requires len % 128 == 0")
    blocks = v.reshape(-1, BLOCK_LEN)
    return _encode_blocks(blocks, blocks)


def _encode_blocks(payload_blocks: np.ndarray, width_blocks: np.ndarray) -> bytes:
    """Grouped-by-width vectorized block encoder ([u8 nb][packed] per block)."""
    from .. import native

    if payload_blocks.shape[0] >= 8 and native.available():
        res = native.bp_encode(payload_blocks, width_blocks)
        if res is not None:
            return res
    from ..util.bits import pack_blocks

    n_blocks = payload_blocks.shape[0]
    nbs = np.zeros(n_blocks, dtype=np.int64)
    acc = np.bitwise_or.reduce(width_blocks, axis=1)
    nz = acc != 0
    nbs[nz] = np.floor(np.log2(acc[nz].astype(np.float64))).astype(np.int64) + 1
    # float log2 is exact for < 2^53; fix up boundary just in case
    for i in np.flatnonzero(nbs > 32):
        nbs[i] = int(acc[i]).bit_length()
    sizes = 1 + nbs * 16
    offsets = np.zeros(n_blocks + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    out = np.empty(int(offsets[-1]), dtype=np.uint8)
    out[offsets[:-1]] = nbs
    for nb in np.unique(nbs):
        nb = int(nb)
        if nb == 0:
            continue
        sel = np.flatnonzero(nbs == nb)
        packed = pack_blocks(payload_blocks[sel], nb).view(np.uint8).reshape(
            len(sel), nb * 16
        )
        idx = offsets[sel][:, None] + 1 + np.arange(nb * 16)
        out[idx] = packed
    return out.tobytes()


def bitpack_decode(buf, pos: int, length: int, dtype: np.dtype) -> Tuple[np.ndarray, int]:
    n_blocks = (length + BLOCK_LEN - 1) // BLOCK_LEN
    from ..util.bits import unpack_blocks

    # native one-pass decode (mixed widths included) when the runtime exists
    from .. import native

    if n_blocks and native.available():
        res = native.bp_decode(
            buf if isinstance(buf, np.ndarray) else np.frombuffer(buf, np.uint8),
            pos,
            n_blocks,
        )
        if res is not None:
            vals, end = res
            return vals[:length].view(dtype), end

    # fast path: uniform width (one reshape instead of per-block gathers)
    if n_blocks:
        nb0 = int(buf[pos])
        stride = 1 + nb0 * 16
        if pos + n_blocks * stride <= len(buf):
            hdr = np.frombuffer(buf, np.uint8, n_blocks * stride, pos).reshape(
                n_blocks, stride
            )
            if (hdr[:, 0] == nb0).all():
                words = hdr[:, 1:].copy().view(np.uint32) if nb0 else None
                out = (
                    unpack_blocks(words, nb0)
                    if nb0
                    else np.zeros((n_blocks, BLOCK_LEN), np.uint32)
                )
                return (
                    out.reshape(-1)[:length].view(dtype),
                    pos + n_blocks * stride,
                )
    # mixed widths: parse headers, batch-decode groups of equal width
    nbs = np.empty(n_blocks, dtype=np.int64)
    offs = np.empty(n_blocks, dtype=np.int64)
    p = pos
    for b in range(n_blocks):
        if p >= len(buf):
            raise OutOfSpecError("bitpacked page truncated")
        nbs[b] = int(buf[p])
        offs[b] = p + 1
        p += 1 + int(buf[p]) * 16
    out = np.empty((n_blocks, BLOCK_LEN), dtype=np.uint32)
    for nb in np.unique(nbs):
        nb = int(nb)
        sel = np.flatnonzero(nbs == nb)
        if nb == 0:
            out[sel] = 0
            continue
        words = np.empty((len(sel), nb * 4), dtype=np.uint32)
        for j, bi in enumerate(sel):
            words[j] = np.frombuffer(buf, np.uint8, nb * 16, int(offs[bi])).view(
                np.uint32
            )
        out[sel] = unpack_blocks(words, nb)
    return out.reshape(-1)[:length].view(dtype), p


# ---------------------------------------------------------------------------
# DeltaBitpacking (reference delta_bp.rs:36-109)


def delta_bitpack_encode(values: np.ndarray) -> bytes:
    v = values.view(np.uint32) if values.dtype != np.uint32 else values
    if len(v) % BLOCK_LEN != 0:
        raise OutOfSpecError("delta bitpacking requires len % 128 == 0")
    # num_bits is computed on the RAW values (delta_bp.rs:52); the packed
    # payload is the sequential deltas.
    deltas = np.diff(v, prepend=np.uint32(0)).astype(np.uint32)
    return _encode_blocks(
        deltas.reshape(-1, BLOCK_LEN), v.reshape(-1, BLOCK_LEN)
    )


def delta_bitpack_decode(buf, pos: int, length: int, dtype: np.dtype) -> Tuple[np.ndarray, int]:
    deltas, pos = bitpack_decode(buf, pos, length, np.dtype(np.uint32))
    out = np.cumsum(deltas, dtype=np.uint32)
    return out.view(dtype), pos


def _bp_eligible(stats: FamilyStats) -> bool:
    if stats.values.dtype.itemsize != 4:
        return False
    if stats.tuple_count % BLOCK_LEN != 0:
        return False
    # min.as_i64() < 0 check (bp.rs:93)
    mn = int(stats.min)
    if stats.values.dtype.kind == "i" and mn < 0:
        return False
    return True


# ---------------------------------------------------------------------------
# driver


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
        return dict_encode(values, validity, options, compress_integer, stats)
    if codec == Compression.ONE_VALUE:
        return one_value_encode(values, validity)
    if codec == Compression.FREQ:
        return freq_encode(values, validity, stats, options, compress_integer)
    if codec == Compression.BITPACKING:
        return bitpack_encode(values)
    if codec == Compression.DELTA_BITPACKING:
        return delta_bitpack_encode(values)
    raise OutOfSpecError(f"unknown integer codec {codec}")


def _ratio(
    codec: Compression, stats: FamilyStats, rng: np.random.Generator
) -> float:
    if codec == Compression.ONE_VALUE:
        return float(stats.tuple_count) if stats.unique_count <= 1 else 0.0
    if codec == Compression.FREQ:
        return freq_ratio(stats, require_big_max=True)
    if codec == Compression.DICT:
        return dict_ratio(stats)
    if codec == Compression.RLE:
        return compress_sample_ratio(
            lambda v, m, s, o: rle_encode(v, m), stats, rng, WriteOptions
        )
    if codec == Compression.BITPACKING:
        if not _bp_eligible(stats):
            return 0.0
        return compress_sample_ratio(
            lambda v, m, s, o: bitpack_encode(v), stats, rng, WriteOptions
        )
    if codec == Compression.DELTA_BITPACKING:
        if not _bp_eligible(stats) or not stats.is_sorted or stats.null_count > 0:
            return 0.0
        return (
            compress_sample_ratio(
                lambda v, m, s, o: bitpack_encode(v), stats, rng, WriteOptions
            )
            * 1.5
        )
    return 0.0


_CHOICE_ORDER = (
    Compression.ONE_VALUE,
    Compression.FREQ,
    Compression.DICT,
    Compression.RLE,
    Compression.BITPACKING,
    Compression.DELTA_BITPACKING,
)


def choose_compressor(
    stats: FamilyStats, options: WriteOptions
) -> Compression:
    """reference integer/mod.rs:231-308 (env forcing + ratio competition)."""
    forbidden = options.forbidden_compressions
    if env.check_freq_env() and Compression.FREQ not in forbidden:
        return Compression.FREQ
    if env.check_dict_env() and Compression.DICT not in forbidden:
        return Compression.DICT
    if env.check_rle_env() and Compression.RLE not in forbidden:
        return Compression.RLE
    if (
        env.check_bitpack_env()
        and Compression.BITPACKING not in forbidden
        and stats.values.dtype.itemsize == 4
        and stats.tuple_count % 128 == 0
    ):
        # unlike the reference we keep the shape gate under forcing — the
        # BitPacker4x layout only exists for full 128-value u32 blocks
        return Compression.BITPACKING
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


def compress_integer(
    values: np.ndarray,
    validity: Optional[np.ndarray],
    options: WriteOptions,
) -> bytes:
    """Frame + compress one integer page (reference integer/mod.rs:35-70)."""
    if options.default_compress_ratio is None and not (
        env.check_freq_env()
        or env.check_dict_env()
        or env.check_rle_env()
        or env.check_bitpack_env()
    ):
        # no ratio competition and no forcing: the default codec wins and
        # stats are never consulted (skip the reference's wasted scan)
        stats = None
        codec = options.default_compression
    else:
        stats = gen_stats(values, validity)
        codec = choose_compressor(stats, options)
    from ..util.obs import log_codec_choice

    log_codec_choice("integer", codec)
    if codec.raw_mode:
        body = common.compress(codec, values.astype(values.dtype.newbyteorder("<"), copy=False).tobytes())
    else:
        body = _codec_compress(codec, values, validity, stats, options)
    header = write_header(codec, len(body), len(values) * values.dtype.itemsize)
    return header + body


def decompress_integer(
    buf, pos: int, length: int, dtype: np.dtype
) -> Tuple[np.ndarray, int]:
    """Decode one integer page at ``pos`` (reference integer/mod.rs:72-117).

    Returns (values, new_pos); new_pos always advances by header+compressed
    size, matching the reference's ``consume(compressed_size)``.
    """
    dtype = np.dtype(dtype)
    codec, csize, _usize, body_pos = read_header(buf, pos)
    end = body_pos + csize
    if end > len(buf):
        raise OutOfSpecError("integer page truncated")
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
        out, _ = freq_decode(buf, body_pos, length, dtype, decompress_integer)
    elif codec == Compression.BITPACKING:
        out, _ = bitpack_decode(buf, body_pos, length, dtype)
    elif codec == Compression.DELTA_BITPACKING:
        out, _ = delta_bitpack_decode(buf, body_pos, length, dtype)
    else:
        raise OutOfSpecError(f"unknown integer codec {codec}")
    return out, end
