"""Roaring bitmap portable serialization (numpy).

The Freq codec stores exception positions as a roaring bitmap
(reference src/compression/integer/freq.rs:74-78 / binary/freq.rs:84-88,
serialized with the Rust ``roaring`` crate's portable format).

Portable format (RoaringFormatSpec):
  no-run form : u32 cookie=12346, u32 n_containers,
                then per container [u16 key, u16 cardinality-1],
                then per container u32 byte offset (from stream start),
                then container bodies.
  run form    : u32 (12347 | (n_containers-1) << 16), run-flag bitset
                ((n+7)/8 bytes), headers, offsets only if n >= 4 and
                no... (we always accept), bodies.
  container   : cardinality <= 4096 → sorted u16 array;
                else → 8 KiB bitset (1024 u64 LE words).
  run container: u16 n_runs then n_runs * [u16 start, u16 len-1].

The writer emits the no-run form only — the reference never calls
``run_optimize`` so its own files contain no run containers either.
"""

from __future__ import annotations

import numpy as np

from ..errors import OutOfSpecError

SERIAL_COOKIE_NO_RUNCONTAINER = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4
_ARRAY_LIMIT = 4096


def serialize(values: np.ndarray) -> bytes:
    """Serialize sorted unique u32 positions as a portable roaring bitmap."""
    values = np.asarray(values, dtype=np.uint32)
    if len(values) == 0:
        return (
            np.uint32(SERIAL_COOKIE_NO_RUNCONTAINER).tobytes()
            + np.uint32(0).tobytes()
        )
    keys = (values >> 16).astype(np.uint16)
    lows = (values & 0xFFFF).astype(np.uint16)
    boundaries = np.flatnonzero(np.diff(keys)) + 1
    starts = np.concatenate(([0], boundaries))
    ends = np.concatenate((boundaries, [len(values)]))
    container_keys = keys[starts]
    n = len(starts)

    header = bytearray()
    header += np.uint32(SERIAL_COOKIE_NO_RUNCONTAINER).tobytes()
    header += np.uint32(n).tobytes()
    bodies = []
    cards = []
    for s, e in zip(starts, ends):
        card = e - s
        cards.append(card)
        vals = lows[s:e]
        if card <= _ARRAY_LIMIT:
            bodies.append(vals.astype("<u2").tobytes())
        else:
            words = np.zeros(1024, dtype=np.uint64)
            idx = vals.astype(np.uint32)
            np.bitwise_or.at(
                words, idx >> 6, (np.uint64(1) << (idx & 63).astype(np.uint64))
            )
            bodies.append(words.astype("<u8").tobytes())
    desc = np.empty(n * 2, dtype="<u2")
    desc[0::2] = container_keys
    desc[1::2] = np.asarray(cards, dtype=np.uint32) - 1
    header += desc.tobytes()
    # offsets section (always present for the no-run cookie)
    offset0 = 8 + 4 * n + 4 * n
    offsets = np.empty(n, dtype="<u4")
    acc = offset0
    for i, b in enumerate(bodies):
        offsets[i] = acc
        acc += len(b)
    header += offsets.tobytes()
    return bytes(header) + b"".join(bodies)


def serialized_size(values: np.ndarray) -> int:
    return len(serialize(values))


def deserialize(buf: bytes) -> np.ndarray:
    """Deserialize a portable roaring bitmap into sorted u32 positions."""
    if len(buf) < 4:
        raise OutOfSpecError("roaring bitmap truncated")
    cookie = int.from_bytes(buf[0:4], "little")
    pos = 4
    run_flags = None
    if (cookie & 0xFFFF) == SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        nbytes = (n + 7) // 8
        run_flags = np.unpackbits(
            np.frombuffer(buf, dtype=np.uint8, count=nbytes, offset=pos),
            bitorder="little",
        )[:n].astype(bool)
        pos += nbytes
    elif cookie == SERIAL_COOKIE_NO_RUNCONTAINER:
        n = int.from_bytes(buf[4:8], "little")
        pos = 8
    else:
        raise OutOfSpecError(f"bad roaring cookie {cookie}")

    desc = np.frombuffer(buf, dtype="<u2", count=2 * n, offset=pos)
    pos += 4 * n
    keys = desc[0::2].astype(np.uint32)
    cards = desc[1::2].astype(np.int64) + 1

    has_offsets = run_flags is None or n >= NO_OFFSET_THRESHOLD
    if has_offsets:
        pos += 4 * n  # we read containers sequentially; offsets are redundant

    chunks = []
    for i in range(n):
        card = int(cards[i])
        base = keys[i] << 16
        if run_flags is not None and run_flags[i]:
            n_runs = int.from_bytes(buf[pos : pos + 2], "little")
            pos += 2
            runs = np.frombuffer(buf, dtype="<u2", count=2 * n_runs, offset=pos)
            pos += 4 * n_runs
            starts_r = runs[0::2].astype(np.uint32)
            lens_r = runs[1::2].astype(np.uint32) + 1
            vals = np.concatenate(
                [np.arange(s, s + l, dtype=np.uint32) for s, l in zip(starts_r, lens_r)]
            ) if n_runs else np.empty(0, dtype=np.uint32)
        elif card <= _ARRAY_LIMIT:
            vals = np.frombuffer(buf, dtype="<u2", count=card, offset=pos).astype(
                np.uint32
            )
            pos += 2 * card
        else:
            words = np.frombuffer(buf, dtype="<u8", count=1024, offset=pos)
            pos += 8192
            bits = np.unpackbits(
                words.view(np.uint8), bitorder="little"
            )
            vals = np.flatnonzero(bits).astype(np.uint32)
        chunks.append(base + vals)
    if not chunks:
        return np.empty(0, dtype=np.uint32)
    return np.concatenate(chunks).astype(np.uint32)


def consumed_size(buf: bytes) -> int:
    """Byte length of the bitmap at the head of ``buf`` (for stream parsing)."""
    # The Freq layout prefixes the bitmap with its u32 size, so this is only a
    # fallback; compute by re-walking the structure.
    cookie = int.from_bytes(buf[0:4], "little")
    if cookie == SERIAL_COOKIE_NO_RUNCONTAINER:
        n = int.from_bytes(buf[4:8], "little")
        pos = 8
        desc = np.frombuffer(buf, dtype="<u2", count=2 * n, offset=pos)
        pos += 4 * n + 4 * n
        cards = desc[1::2].astype(np.int64) + 1
        for i in range(n):
            pos += 2 * int(cards[i]) if cards[i] <= _ARRAY_LIMIT else 8192
        return pos
    raise OutOfSpecError("cannot size run-container roaring bitmap")
