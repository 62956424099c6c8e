"""Bit-packing primitives (vectorized numpy).

``pack_block128`` / ``unpack_block128`` reproduce the byte layout of the
``bitpacking`` crate's ``BitPacker4x`` used by the reference
(src/compression/integer/bp.rs:36-86, delta_bp.rs:36-109): 128 u32 values per
block, packed as 4 interleaved 32-value lanes — lane ``l`` holds values
``v[l::4]`` packed LSB-first at ``num_bits`` bits into 32-bit words, and the 4
lanes' words are interleaved at u32 granularity (word ``w`` of lane ``l`` is
u32 index ``w*4 + l`` of the output).

``num_bits`` for a block is the bit width of the OR of all values.
"""

from __future__ import annotations

import numpy as np

BLOCK_LEN = 128  # BitPacker4x::BLOCK_LEN
_LANES = 4
_PER_LANE = BLOCK_LEN // _LANES  # 32 values per lane


def num_bits_u32(values: np.ndarray) -> int:
    """Bit width needed for a block (bitpacking crate ``num_bits``)."""
    acc = np.bitwise_or.reduce(values.astype(np.uint32, copy=False))
    return int(acc).bit_length()


def pack_block128(values: np.ndarray, num_bits: int) -> bytes:
    """Pack exactly 128 u32 values at ``num_bits`` bits → ``num_bits*16`` bytes."""
    assert values.shape == (BLOCK_LEN,)
    if num_bits == 0:
        return b""
    v = values.astype(np.uint32, copy=False)
    # lanes[l, t] = v[4t + l]
    lanes = v.reshape(_PER_LANE, _LANES).T  # (4, 32)
    # bits[l, t, k] = bit k of lanes[l, t]
    k = np.arange(num_bits, dtype=np.uint32)
    bits = (lanes[:, :, None] >> k[None, None, :]) & np.uint32(1)
    # per-lane bitstream (t-major, LSB-first) → words of 32 bits
    stream = bits.reshape(_LANES, _PER_LANE * num_bits)
    words = stream.reshape(_LANES, num_bits, 32)
    weights = (np.uint64(1) << np.arange(32, dtype=np.uint64)).astype(np.uint64)
    lane_words = (words.astype(np.uint64) * weights).sum(axis=2).astype(np.uint32)
    # interleave: out[w*4 + l] = lane_words[l, w]
    out = lane_words.T.reshape(-1)  # (num_bits*4,) u32
    return out.tobytes()


def unpack_block128(data: bytes | np.ndarray, num_bits: int) -> np.ndarray:
    """Inverse of :func:`pack_block128`; returns 128 u32 values."""
    if num_bits == 0:
        return np.zeros(BLOCK_LEN, dtype=np.uint32)
    raw = np.frombuffer(data, dtype=np.uint32, count=num_bits * _LANES)
    lane_words = raw.reshape(num_bits, _LANES).T  # (4, num_bits)
    # expand words to bits
    kk = np.arange(32, dtype=np.uint32)
    bits = (lane_words[:, :, None] >> kk[None, None, :]) & np.uint32(1)
    stream = bits.reshape(_LANES, num_bits * 32)  # per-lane bitstream
    per_val = stream.reshape(_LANES, _PER_LANE, num_bits)
    weights = (np.uint32(1) << np.arange(num_bits, dtype=np.uint32)).astype(np.uint32)
    lanes = (per_val.astype(np.uint64) * weights.astype(np.uint64)).sum(axis=2)
    lanes = lanes.astype(np.uint32)  # (4, 32), lanes[l, t] = v[4t+l]
    return lanes.T.reshape(-1).copy()


def unpack_blocks(words: np.ndarray, num_bits: int) -> np.ndarray:
    """Vectorized unpack of N same-width blocks: (n, num_bits*4) u32 → (n, 128).

    Word-level shift algorithm (same as the device kernel): value ``t`` of a
    lane spans at most two of that lane's words.
    """
    n = words.shape[0]
    b = num_bits
    if b == 0:
        return np.zeros((n, BLOCK_LEN), dtype=np.uint32)
    lanes = words.reshape(n, b, _LANES)
    mask = np.uint32((1 << b) - 1) if b < 32 else np.uint32(0xFFFFFFFF)
    out = np.empty((n, _PER_LANE, _LANES), dtype=np.uint32)
    for t in range(_PER_LANE):
        s = t * b
        w0, sh = s // 32, s % 32
        v = lanes[:, w0, :] >> np.uint32(sh)
        if sh + b > 32:
            v = v | (lanes[:, w0 + 1, :] << np.uint32(32 - sh))
        out[:, t, :] = v & mask
    return out.reshape(n, BLOCK_LEN)


def pack_blocks(values: np.ndarray, num_bits: int) -> np.ndarray:
    """Vectorized pack of N blocks: (n, 128) u32 → (n, num_bits*4) u32 words."""
    n = values.shape[0]
    b = num_bits
    if b == 0:
        return np.zeros((n, 0), dtype=np.uint32)
    v = values.reshape(n, _PER_LANE, _LANES)
    words = np.zeros((n, b, _LANES), dtype=np.uint32)
    for t in range(_PER_LANE):
        s = t * b
        w0, sh = s // 32, s % 32
        vt = v[:, t, :]
        words[:, w0, :] |= (vt << np.uint32(sh)) if sh else vt
        if sh + b > 32:
            words[:, w0 + 1, :] |= vt >> np.uint32(32 - sh)
    return words.reshape(n, b * _LANES)


def pack_bitmap(bools: np.ndarray) -> bytes:
    """Pack booleans into LSB-first bytes (arrow bitmap layout)."""
    return np.packbits(bools.astype(np.uint8), bitorder="little").tobytes()


def unpack_bitmap(data: bytes | np.ndarray, length: int) -> np.ndarray:
    """Unpack LSB-first bitmap bytes into a boolean array of ``length``."""
    raw = np.frombuffer(data, dtype=np.uint8)
    bits = np.unpackbits(raw, count=length, bitorder="little")
    return bits.astype(bool)
