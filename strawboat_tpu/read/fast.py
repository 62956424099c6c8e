"""Fast whole-column host read: plan pages, batch-decompress on native threads
directly into one output buffer, wrap zero-copy as arrow.

The host-side analogue of the reference's batch read
(`/root/reference/src/read/batch_read.rs:27-64` — all pages of a column into
one growing Vec) redesigned around the planning idiom: page headers parse in
one host pass, then ALL page bodies decompress in parallel C++ threads at
their final offsets — no per-page allocation, no concatenate, no copy.

Covers simple fixed-width columns whose pages are all common-codec
(None/LZ4/Zstd/Snappy).  Everything else returns None and the caller uses
the general streaming reader.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

from .. import native
from ..codecs import read_header
from ..constants import Compression
from ..errors import OutOfSpecError
from ..meta import ColumnMeta
from .levels import read_validity


class ReadArena:
    """Recycled output buffers for repeated host reads.

    The decoded column's memory is the read path's dominant cost once decode
    runs on native threads: a fresh allocation pays kernel page-zeroing +
    first-touch faults for every byte (a full extra memory pass).  An arena
    hands back the *same* buffers on the next read — the host-read analogue
    of the reference's page-buffer recycling (``PageIterator::swap_buffer``,
    /root/reference/src/read/mod.rs:26-57, recycled per page at
    src/read/array/integer.rs:84).

    Contract (same as ``swap_buffer``): arrays returned by a read that used
    this arena alias arena memory and are INVALIDATED by the next read that
    passes the same arena.  Callers that need the data past that point copy
    it out (or simply don't pass an arena).
    """

    def __init__(self) -> None:
        import threading

        self._free: Dict[int, List[np.ndarray]] = {}
        self._lent: List[np.ndarray] = []
        # read_table drives read_column_fast from a thread pool with one
        # shared arena; get/recycle must be atomic or two threads racing on
        # the same size bucket can both pop a 1-element list
        self._lock = threading.Lock()

    def get(self, nbytes: int) -> np.ndarray:
        """A uint8 buffer of exactly ``nbytes`` (recycled when possible)."""
        with self._lock:
            bucket = self._free.get(nbytes)
            buf = bucket.pop() if bucket else np.empty(nbytes, dtype=np.uint8)
            self._lent.append(buf)
        return buf

    def recycle(self) -> None:
        """Reclaim every buffer handed out since the last recycle.

        Called at the START of a read: anything the previous read returned
        is now fair game (the documented invalidation point).
        """
        with self._lock:
            for buf in self._lent:
                self._free.setdefault(buf.nbytes, []).append(buf)
            self._lent.clear()


def _arrow_fixed_np_dtype(t: pa.DataType) -> Optional[np.dtype]:
    """numpy dtype whose byte layout equals the arrow values buffer, or None."""
    if pa.types.is_integer(t):
        return np.dtype(t.to_pandas_dtype())
    if pa.types.is_floating(t) and t.bit_width in (32, 64):
        return np.dtype(np.float32 if t.bit_width == 32 else np.float64)
    if pa.types.is_date32(t):
        return np.dtype(np.int32)
    if pa.types.is_date64(t) or pa.types.is_timestamp(t):
        return np.dtype(np.int64)
    return None


def _read_dict_column_batched(
    dict_jobs, meta, field, np_dtype, validities, nullable, arena
):
    """All-DICT column: native one-pass index decode per page + ONE gather.

    The per-page python of the general reader disappears: indices decode in
    C (mixed block widths in one walk), per-page dictionaries concatenate
    with base offsets, and a single ``np.take(..., out=...)`` writes the
    final values buffer (arena-recyclable).
    """
    n_rows = int(sum(j[0] for j in dict_jobs))
    total = n_rows * np_dtype.itemsize
    out = arena.get(total) if arena is not None else np.empty(total, np.uint8)
    out_typed = out.view(np_dtype)
    dicts = [j[3] for j in dict_jobs]
    bases = np.zeros(len(dicts), dtype=np.int64)
    bases[1:] = np.cumsum([len(d) for d in dicts[:-1]])
    all_dict = np.concatenate(dicts) if len(dicts) > 1 else dicts[0]
    codes = np.empty(n_rows, dtype=np.int64)
    row = 0
    for (num_values, buf, ibody, _d, (is_delta, raw_idx)), base in zip(
        dict_jobs, bases
    ):
        if raw_idx is not None:
            vals = raw_idx[:num_values]
        else:
            n_blocks = (num_values + 127) // 128
            vals, _end = native.bp_decode(buf, ibody, n_blocks)
            vals = vals[:num_values]
            if is_delta:  # sequential deltas, whole-page carry (delta_bp.rs)
                vals = np.cumsum(vals, dtype=np.uint32)
        np.add(vals, base, out=codes[row : row + num_values])
        row += num_values
    try:
        np.take(all_dict, codes, out=out_typed)
    except IndexError as e:
        raise OutOfSpecError(f"dict index out of range: {e}") from None
    null_bitmap = None
    if nullable and any(v is not None for v in validities):
        vbits = np.concatenate(
            [
                np.ones(p.num_values, dtype=bool) if v is None else v
                for v, p in zip(validities, meta.pages)
            ]
        )
        null_bitmap = pa.py_buffer(np.packbits(vbits, bitorder="little").tobytes())
    return pa.Array.from_buffers(
        field.type, n_rows, [null_bitmap, pa.py_buffer(out)]
    )


def _parse_dict_sets(buf: np.ndarray, pos: int, count: int) -> pa.Array:
    """Binary dict page ``[u64 len][bytes]*count`` set list → pa.binary
    (reference binary/dict.rs:90-99; dictionaries are KB-scale)."""
    lens = np.empty(count, dtype=np.int64)
    parts = []
    for i in range(count):
        ln = int(np.frombuffer(buf, "<u8", 1, pos)[0])
        pos += 8
        parts.append(buf[pos : pos + ln])
        pos += ln
        lens[i] = ln
    offs = np.zeros(count + 1, dtype=np.int32)
    np.cumsum(lens, out=offs[1:])
    values = np.concatenate(parts) if parts else np.empty(0, np.uint8)
    return pa.Array.from_buffers(
        pa.binary(),
        count,
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(values.tobytes())],
    )


def read_binary_column_fast(
    file_bytes: np.ndarray,
    meta: ColumnMeta,
    field: pa.Field,
) -> Optional[pa.Array]:
    """All-DICT utf8/binary column → pa.Array via one arrow take.

    Index subpages decode in one native walk per page; per-page
    dictionaries concatenate with base offsets; ONE ``pc.take`` (null
    indices → null rows) materializes the strings in C++.  Returns None
    for any other layout (general reader handles it).
    """
    import pyarrow.compute as pc

    if not native.available():
        return None
    t = field.type
    if not (
        pa.types.is_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_string(t)
        or pa.types.is_large_binary(t)
    ):
        return None
    nullable = bool(field.nullable)
    jobs = []  # (num_values, buf, index_body, pa dict array)
    validities = []
    pos = meta.offset
    for page in meta.pages:
        page_end = pos + page.length
        buf = file_bytes[pos:page_end]
        p = 0
        if nullable:
            v, p = read_validity(buf, 0, page.num_values)
            validities.append(v)
        codec, _csize, _us, body = read_header(buf, p)
        if codec != Compression.DICT:
            return None
        icodec, icsize, _ius, ibody = read_header(buf, body)
        if icodec in (Compression.BITPACKING, Compression.DELTA_BITPACKING):
            idx_spec = (icodec == Compression.DELTA_BITPACKING, None)
        elif icodec.raw_mode:
            from ..codecs.common import decompress

            raw = decompress(
                icodec,
                buf[ibody : ibody + icsize].tobytes(),
                page.num_values * 4,
            )
            idx_spec = (False, np.frombuffer(raw, np.uint32))
        else:
            return None
        vpos = ibody + icsize
        count = int(np.frombuffer(buf, "<u4", 1, vpos)[0])
        if count == 0:
            return None
        jobs.append(
            (
                page.num_values,
                buf,
                ibody,
                _parse_dict_sets(buf, vpos + 4, count),
                idx_spec,
            )
        )
        pos = page_end
    if not jobs:
        return None  # zero-page column: general reader emits the empty array
    n_rows = int(sum(j[0] for j in jobs))
    dicts = [j[3] for j in jobs]
    bases = np.zeros(len(dicts), dtype=np.int64)
    bases[1:] = np.cumsum([len(d) for d in dicts[:-1]])
    all_dict = pa.concat_arrays(dicts) if len(dicts) > 1 else dicts[0]
    codes = np.empty(n_rows, dtype=np.int64)
    row = 0
    for (num_values, buf, ibody, _d, (is_delta, raw_idx)), base in zip(
        jobs, bases
    ):
        if raw_idx is not None:
            vals = raw_idx[:num_values]
        else:
            n_blocks = (num_values + 127) // 128
            vals, _end = native.bp_decode(buf, ibody, n_blocks)
            vals = vals[:num_values]
            if is_delta:
                vals = np.cumsum(vals, dtype=np.uint32)
        np.add(vals, base, out=codes[row : row + num_values])
        row += num_values
    mask = None
    if nullable and any(v is not None for v in validities):
        vbits = np.concatenate(
            [
                np.ones(p.num_values, dtype=bool) if v is None else v
                for v, p in zip(validities, meta.pages)
            ]
        )
        mask = ~vbits
    try:
        arr = pc.take(all_dict, pa.array(codes, mask=mask))
    except pa.ArrowIndexError as e:
        raise OutOfSpecError(f"dict index out of range: {e}") from None
    if arr.type != t:
        arr = arr.cast(t)
    return arr


def read_column_fast(
    file_bytes: np.ndarray,
    meta: ColumnMeta,
    field: pa.Field,
    arena: Optional[ReadArena] = None,
) -> Optional[pa.Array]:
    """All-raw-codec fixed-width column → pa.Array, or None if ineligible.

    With ``arena``, the values buffer is drawn from (and eventually recycled
    through) the arena — see :class:`ReadArena` for the aliasing contract.
    """
    np_dtype = _arrow_fixed_np_dtype(field.type)
    if np_dtype is None or not native.available():
        return None
    nullable = bool(field.nullable)
    jobs = []  # (codec_int, in_slice, out_len)
    dict_jobs = []  # (num_values, buf, index_body, dict_values)
    validities = []  # per page: None (all valid) | bool array
    pos = meta.offset
    for page in meta.pages:
        page_end = pos + page.length
        buf = file_bytes[pos:page_end]
        p = 0
        if nullable:
            v, p = read_validity(buf, 0, page.num_values)
            validities.append(v)
        codec, csize, _us, body = read_header(buf, p)
        if codec == Compression.DICT and not jobs:
            # adaptive files pick DICT constantly (TPC-H: 8/10 lineitem
            # columns) — decode the bitpacked index subpage in one native
            # pass per page and defer ONE global gather for the column
            icodec, icsize, _ius, ibody = read_header(buf, body)
            if icodec in (
                Compression.BITPACKING,
                Compression.DELTA_BITPACKING,
            ):
                idx_spec = (icodec == Compression.DELTA_BITPACKING, None)
            elif icodec.raw_mode:
                # short tail pages are BP-ineligible; their u32 indices ride
                # a raw codec — decompress inline (one small page)
                from ..codecs.common import decompress

                raw = decompress(
                    icodec,
                    buf[ibody : ibody + icsize].tobytes(),
                    page.num_values * 4,
                )
                idx_spec = (False, np.frombuffer(raw, np.uint32))
            else:
                return None
            vpos = ibody + icsize
            count = int(np.frombuffer(buf, "<u4", 1, vpos)[0])
            if count == 0:
                return None  # all-null page: let the general reader handle
            dvals = np.frombuffer(buf, np_dtype, count, vpos + 4)
            dict_jobs.append(
                (page.num_values, buf, ibody, dvals, idx_spec)
            )
            pos = page_end
            continue
        if not codec.raw_mode or dict_jobs:
            return None
        jobs.append(
            (int(codec), buf[body : body + csize], page.num_values * np_dtype.itemsize)
        )
        pos = page_end
    if dict_jobs:
        return _read_dict_column_batched(
            dict_jobs, meta, field, np_dtype, validities, nullable, arena
        )
    n_rows = int(sum(p.num_values for p in meta.pages))
    out_lens = np.asarray([j[2] for j in jobs], dtype=np.int64)
    offsets = np.zeros(len(jobs) + 1, dtype=np.int64)
    np.cumsum(out_lens, out=offsets[1:])
    total = int(offsets[-1])
    out = arena.get(total) if arena is not None else np.empty(total, dtype=np.uint8)
    i, n = 0, len(jobs)
    while i < n:
        j = i + 1
        while j < n and jobs[j][0] == jobs[i][0]:
            j += 1
        native.decompress_batch_into(
            jobs[i][0],
            [c[1] for c in jobs[i:j]],
            out,
            offsets[i:j],
            out_lens[i:j],
        )
        i = j
    null_bitmap = None
    if nullable and any(v is not None for v in validities):
        vbits = np.concatenate(
            [
                np.ones(p.num_values, dtype=bool) if v is None else v
                for v, p in zip(validities, meta.pages)
            ]
        )
        null_bitmap = pa.py_buffer(
            np.packbits(vbits, bitorder="little").tobytes()
        )
    return pa.Array.from_buffers(
        field.type, n_rows, [null_bitmap, pa.py_buffer(out)]
    )
