"""Parquet hybrid RLE / bit-packed level encoding (vectorized numpy).

This is the codec for validity def-levels and nested rep/def levels.  The
reference uses parquet2's ``hybrid_rle`` (src/read/read_basic.rs:30-34,
49-62, 85-87) and arrow2's ``write_def_levels`` / ``write_rep_and_def``.

Wire format (parquet spec, *no* length prefix — V2 data page style):
    run := header(ULEB128 varint) payload
    header & 1 == 1: bit-packed run; (header >> 1) = number of 8-value groups,
                     payload = groups * bit_width bytes, values LSB-first.
    header & 1 == 0: RLE run; (header >> 1) = repeat count,
                     payload = ceil(bit_width / 8) bytes (LE value).

The simple-validity writer emits a single bit-packed run — required because
the reference's ``read_validity`` only accepts bit-packed runs there
(src/read/read_basic.rs:52-60).
"""

from __future__ import annotations

import numpy as np

from ..errors import OutOfSpecError


def get_bit_width(max_level: int) -> int:
    """parquet2 ``get_bit_width`` (bits needed to store ``max_level``)."""
    return int(max_level).bit_length()


def _uleb128(value: int) -> bytes:
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uleb128(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise OutOfSpecError("truncated ULEB128 varint in levels")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def encode_bitpacked(values: np.ndarray, bit_width: int) -> bytes:
    """Encode all values as one bit-packed run."""
    n = len(values)
    if bit_width == 0 or n == 0:
        return b""
    groups = (n + 7) // 8
    padded = np.zeros(groups * 8, dtype=np.uint32)
    padded[:n] = values
    # bitstream: value i occupies bits [i*w, (i+1)*w), LSB-first within bytes
    k = np.arange(bit_width, dtype=np.uint32)
    bits = ((padded[:, None] >> k[None, :]) & np.uint32(1)).reshape(-1)
    payload = np.packbits(bits.astype(np.uint8), bitorder="little").tobytes()
    header = _uleb128((groups << 1) | 1)
    return header + payload


def encode_rle_run(value: int, count: int, bit_width: int) -> bytes:
    header = _uleb128(count << 1)
    nbytes = (bit_width + 7) // 8
    return header + int(value).to_bytes(nbytes, "little")


def encode_levels(values: np.ndarray, bit_width: int) -> bytes:
    """Encode a level sequence, choosing RLE for long constant runs.

    Interior bit-packed runs must cover a multiple of 8 values (the decoder
    consumes whole 8-value groups), so run selection works on 8-value groups:
    consecutive all-constant groups of one value become an RLE run, everything
    else is bit-packed; only the final (tail) run may be padded.
    """
    values = np.asarray(values, dtype=np.uint32)
    n = len(values)
    if n == 0 or bit_width == 0:
        return b""
    n_groups = n // 8
    out = bytearray()
    if n_groups == 0:
        return bytes(encode_bitpacked(values, bit_width))
    g = values[: n_groups * 8].reshape(n_groups, 8)
    const = (g == g[:, :1]).all(axis=1)
    gval = g[:, 0]
    # merge consecutive constant groups with equal value into RLE runs
    i = 0
    bp_start = None  # first group of a pending bitpacked stretch
    while i < n_groups:
        if const[i]:
            j = i + 1
            while j < n_groups and const[j] and gval[j] == gval[i]:
                j += 1
            if j - i >= 2:  # >= 16 values: RLE pays off
                if bp_start is not None:
                    out += encode_bitpacked(
                        values[bp_start * 8 : i * 8], bit_width
                    )
                    bp_start = None
                out += encode_rle_run(int(gval[i]), (j - i) * 8, bit_width)
                i = j
                continue
        if bp_start is None:
            bp_start = i
        i += 1
    tail = n - n_groups * 8
    if bp_start is not None:
        out += encode_bitpacked(values[bp_start * 8 :], bit_width)
    elif tail:
        out += encode_bitpacked(values[n_groups * 8 :], bit_width)
    return bytes(out)


def decode_levels(buf: bytes, bit_width: int, num_values: int) -> np.ndarray:
    """Decode ``num_values`` levels (parquet2 ``HybridRleDecoder`` semantics)."""
    if bit_width == 0:
        return np.zeros(num_values, dtype=np.uint32)
    out = np.empty(num_values, dtype=np.uint32)
    filled = 0
    pos = 0
    while filled < num_values:
        header, pos = _read_uleb128(buf, pos)
        if header & 1:
            groups = header >> 1
            nbytes = groups * bit_width
            if pos + nbytes > len(buf):
                raise OutOfSpecError("truncated bit-packed run")
            raw = np.frombuffer(buf, dtype=np.uint8, count=nbytes, offset=pos)
            pos += nbytes
            bits = np.unpackbits(raw, bitorder="little")
            vals = bits.reshape(groups * 8, bit_width)
            weights = (np.uint32(1) << np.arange(bit_width, dtype=np.uint32)).astype(
                np.uint32
            )
            decoded = (vals.astype(np.uint32) * weights).sum(axis=1, dtype=np.uint32)
            take = min(len(decoded), num_values - filled)
            out[filled : filled + take] = decoded[:take]
            filled += take
        else:
            count = header >> 1
            nbytes = (bit_width + 7) // 8
            if pos + nbytes > len(buf):
                raise OutOfSpecError("truncated RLE run")
            value = int.from_bytes(buf[pos : pos + nbytes], "little")
            pos += nbytes
            take = min(count, num_values - filled)
            out[filled : filled + take] = value
            filled += take
    return out


def encode_validity_bitpacked(validity: np.ndarray) -> bytes:
    """Simple-page def levels: one bit-packed run of the validity bitmap.

    Mirrors arrow2 ``write_def_levels`` V2 for a nullable leaf
    (used at reference src/write/serialize.rs:200-215).
    """
    return encode_bitpacked(np.asarray(validity, dtype=np.uint32), 1)


def decode_validity(buf: bytes, length: int) -> np.ndarray:
    """Decode simple-page def levels into a boolean validity array.

    Mirrors reference ``read_validity`` (src/read/read_basic.rs:36-63): only
    bit-packed runs are legal here.
    """
    out = np.empty(length, dtype=bool)
    filled = 0
    pos = 0
    while filled < length:
        header, pos = _read_uleb128(buf, pos)
        if not (header & 1):
            raise OutOfSpecError("RLE run in simple validity levels")
        groups = header >> 1
        nbytes = groups
        raw = np.frombuffer(buf, dtype=np.uint8, count=nbytes, offset=pos)
        pos += nbytes
        bits = np.unpackbits(raw, bitorder="little")
        take = min(len(bits), length - filled)
        out[filled : filled + take] = bits[:take].astype(bool)
        filled += take
    return out
