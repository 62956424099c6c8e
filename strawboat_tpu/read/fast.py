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
    """utf8/binary column fast path: all-DICT or all-raw page layouts.

    DICT: index subpages decode in one native walk per page; per-page
    dictionaries concatenate with base offsets; ONE ``pc.take`` (null
    indices → null rows) materializes the strings in C++.  Raw two-block
    pages: every offsets/values block decompresses in one threaded native
    batch straight into the final buffers.  Returns None for any other
    layout (general reader handles it).
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
    raw_jobs = []  # (num_values, codec, offs_slice, offs_usize, vals_slice, vals_usize)
    n_freq = 0
    validities = []
    odtype = np.dtype(
        np.int64 if pa.types.is_large_string(t) or pa.types.is_large_binary(t)
        else np.int32
    )
    pos = meta.offset
    for page in meta.pages:
        page_end = pos + page.length
        buf = file_bytes[pos:page_end]
        p = 0
        if nullable:
            v, p = read_validity(buf, 0, page.num_values)
            validities.append(v)
        codec, csize, _us, body = read_header(buf, p)
        if codec.raw_mode:
            # two-block raw framing: zero-based offsets, then sliced values
            # (reference binary/mod.rs:44-80)
            c2, csize2, usize2, body2 = read_header(buf, body + csize)
            if c2 != codec:
                return None
            raw_jobs.append(
                (
                    page.num_values,
                    int(codec),
                    buf[body : body + csize],
                    (page.num_values + 1) * odtype.itemsize,
                    buf[body2 : body2 + csize2],
                    usize2,
                )
            )
            pos = page_end
            continue
        if codec == Compression.ONE_VALUE:
            # [u32 len][bytes]: joins EITHER page family — as a 1-entry
            # dictionary (dict mix) or a constant run (raw mix)
            ln = int(np.frombuffer(buf, "<u4", 1, body)[0])
            val = bytes(buf[body + 4 : body + 4 + ln])
            jobs.append(
                (
                    page.num_values,
                    None,
                    None,
                    pa.array([val], pa.binary()),
                    (False, np.zeros(page.num_values, dtype=np.uint32)),
                )
            )
            raw_jobs.append((page.num_values, -1, val, 0, None, 0))
            pos = page_end
            continue
        if codec == Compression.FREQ:
            # [u64 top_len][top][u32 bm][roaring][[u64 len][bytes] per exc]
            # joins the dict family: dictionary = [top, exc...], codes = 0
            # except exception positions (binary/freq.rs:44-145)
            from ..util import roaring as _roaring

            fp = body
            top_len = int(np.frombuffer(buf, "<u8", 1, fp)[0])
            fp += 8
            top = bytes(buf[fp : fp + top_len])
            fp += top_len
            bm_size = int(np.frombuffer(buf, "<u4", 1, fp)[0])
            fp += 4
            positions = _roaring.deserialize(bytes(buf[fp : fp + bm_size]))
            fp += bm_size
            sets = [top]
            for _j in range(len(positions)):
                eln = int(np.frombuffer(buf, "<u8", 1, fp)[0])
                fp += 8
                sets.append(bytes(buf[fp : fp + eln]))
                fp += eln
            codes = np.zeros(page.num_values, dtype=np.uint32)
            codes[np.asarray(positions, dtype=np.int64)] = np.arange(
                1, len(positions) + 1, dtype=np.uint32
            )
            jobs.append(
                (
                    page.num_values,
                    None,
                    None,
                    pa.array(sets, pa.binary()),
                    (False, codes),
                )
            )
            n_freq += 1
            pos = page_end
            continue
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
    n_dict = sum(1 for j in jobs if j[1] is not None) + n_freq
    n_raw = sum(1 for j in raw_jobs if j[1] >= 0)
    if n_dict and n_raw:
        return None  # mixed dict/raw string column: general reader
    if n_raw or (not n_dict and raw_jobs):
        # raw (+ OneValue) pages — OV entries carry their constant inline
        return _read_raw_binary_column(
            raw_jobs, meta, field, odtype, validities, nullable
        )
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


def _read_raw_binary_column(raw_jobs, meta, field, odtype, validities, nullable):
    """Raw two-block (+ OneValue) string/binary column: ONE threaded native
    batch decompress for every offsets and values block straight into the
    final buffers; per-page offset rebase is a vectorized add.  OneValue
    pages (codec -1, constant bytes inline) fill their slices directly."""
    n_rows = int(sum(j[0] for j in raw_jobs))
    n_pages = len(raw_jobs)
    counts = np.asarray([j[0] for j in raw_jobs], dtype=np.int64)
    val_lens = np.asarray(
        [
            (j[0] * len(j[2]) if j[1] < 0 else j[5])
            for j in raw_jobs
        ],
        dtype=np.int64,
    )
    val_offs = np.zeros(n_pages + 1, dtype=np.int64)
    np.cumsum(val_lens, out=val_offs[1:])
    values_buf = pa.allocate_buffer(int(val_offs[-1]))
    values = (
        np.frombuffer(values_buf, np.uint8)
        if val_offs[-1]
        else np.empty(0, np.uint8)
    )
    # page-offset arrays land back-to-back; page i's (n_i + 1) entries start
    # at sum(n_j + 1, j < i)
    ocount = counts + 1
    obytes = ocount * odtype.itemsize
    ooffs = np.zeros(n_pages + 1, dtype=np.int64)
    np.cumsum(obytes, out=ooffs[1:])
    offs_all = np.empty(int(ooffs[-1]), dtype=np.uint8)
    i = 0
    while i < n_pages:
        j = i + 1
        while j < n_pages and raw_jobs[j][1] == raw_jobs[i][1]:
            j += 1
        codec = raw_jobs[i][1]
        if codec < 0:
            # OneValue run: constants fill their value slices directly; the
            # local offsets synthesize below (no offsets block exists)
            for k in range(i, j):
                nv, _c, val = raw_jobs[k][0], raw_jobs[k][1], raw_jobs[k][2]
                if len(val):
                    values[val_offs[k] : val_offs[k + 1]] = np.tile(
                        np.frombuffer(val, np.uint8), nv
                    )
            i = j
            continue
        native.decompress_batch_into(
            codec,
            [r[2] for r in raw_jobs[i:j]],
            offs_all,
            ooffs[i:j],
            obytes[i:j],
        )
        native.decompress_batch_into(
            codec,
            [r[4] for r in raw_jobs[i:j]],
            values,
            val_offs[i:j],
            val_lens[i:j],
        )
        i = j
    offs_typed = offs_all.view(odtype)
    # final row offsets: page-local zero-based offsets + that page's value base
    out_offs_buf = pa.allocate_buffer((n_rows + 1) * odtype.itemsize)
    out_offs = np.frombuffer(out_offs_buf, odtype)
    out_offs[0] = 0
    row = 0
    for k in range(n_pages):
        nv = int(counts[k])
        if raw_jobs[k][1] < 0:  # OneValue: constant stride
            ln = len(raw_jobs[k][2])
            np.add(
                np.arange(1, nv + 1, dtype=odtype) * odtype.type(ln),
                odtype.type(val_offs[k]),
                out=out_offs[row + 1 : row + nv + 1],
            )
        else:
            opos = int(ooffs[k]) // odtype.itemsize
            page_offs = offs_typed[opos + 1 : opos + nv + 1]
            np.add(
                page_offs,
                odtype.type(val_offs[k]),
                out=out_offs[row + 1 : row + nv + 1],
            )
        row += nv
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
        field.type,
        n_rows,
        [null_bitmap, out_offs_buf, values_buf],
    )


def read_column_fast(
    file_bytes: np.ndarray,
    meta: ColumnMeta,
    field: pa.Field,
    arena: Optional[ReadArena] = None,
) -> Optional[pa.Array]:
    """Planned fixed-width column read → pa.Array, or None if ineligible.

    Covers columns whose pages mix any of: common-codec (None/LZ4/Zstd/
    Snappy) raw values, BITPACKING / DELTA_BITPACKING values, ONE_VALUE,
    and DICT pages (bitpacked / delta / raw-codec index subpages).  Raw runs
    decompress on native threads directly into the final buffer; DICT pages
    take ONE fused native call (codes + gather, threaded over pages) against
    the concatenated page dictionaries.  Anything else (RLE, FREQ) returns
    None and the general reader handles it.

    With ``arena``, the values buffer is drawn from (and eventually recycled
    through) the arena — see :class:`ReadArena` for the aliasing contract.
    """
    np_dtype = _arrow_fixed_np_dtype(field.type)
    if np_dtype is None or not native.available():
        return None
    if not hasattr(native._load(), "sb_dict_column_decode"):  # stale .so
        return None
    width = np_dtype.itemsize
    nullable = bool(field.nullable)
    raw_jobs = []  # (codec_int, in_slice, row, out_len)
    bp_jobs = []  # (buf, body, num_values, row, is_delta)
    dict_jobs = []  # (buf_or_codes, body|None, num_values, row, dvals, kind)
    one_jobs = []  # (value_bytes, num_values, row)
    validities = []  # per page: None (all valid) | bool array
    pos = meta.offset
    row = 0
    for page in meta.pages:
        page_end = pos + page.length
        buf = file_bytes[pos:page_end]
        p = 0
        if nullable:
            v, p = read_validity(buf, 0, page.num_values)
            validities.append(v)
        codec, csize, _us, body = read_header(buf, p)
        if codec == Compression.DICT:
            icodec, icsize, _ius, ibody = read_header(buf, body)
            if icodec == Compression.BITPACKING:
                spec = (buf, ibody, 0)
            elif icodec == Compression.DELTA_BITPACKING:
                spec = (buf, ibody, 2)
            elif icodec.raw_mode:
                # short tail pages are BP-ineligible; their u32 indices ride
                # a raw codec — decompress inline (one small page)
                from ..codecs.common import decompress

                raw = decompress(
                    icodec,
                    buf[ibody : ibody + icsize].tobytes(),
                    page.num_values * 4,
                )
                spec = (
                    np.frombuffer(raw, np.uint8, page.num_values * 4),
                    None,
                    1,
                )
            else:
                return None
            vpos = ibody + icsize
            count = int(np.frombuffer(buf, "<u4", 1, vpos)[0])
            if count == 0:
                return None  # all-null page: let the general reader handle
            dvals = np.frombuffer(buf, np_dtype, count, vpos + 4)
            dict_jobs.append(
                (spec[0], spec[1], page.num_values, row, dvals, spec[2])
            )
        elif codec in (Compression.BITPACKING, Compression.DELTA_BITPACKING):
            if width != 4 or np_dtype.kind not in "iu":
                return None  # reference BP is 4-byte-int-typed (bp.rs:92-100)
            bp_jobs.append(
                (buf, body, page.num_values, row,
                 codec == Compression.DELTA_BITPACKING)
            )
        elif codec == Compression.ONE_VALUE:
            one_jobs.append(
                (bytes(buf[body : body + width]), page.num_values, row)
            )
        elif codec.raw_mode:
            raw_jobs.append(
                (int(codec), buf[body : body + csize], row,
                 page.num_values * width)
            )
        else:
            return None
        row += page.num_values
        pos = page_end
    n_rows = row
    total = n_rows * width
    if arena is not None:
        out = arena.get(total)
        out_buf = pa.py_buffer(out)
    else:
        # arrow's jemalloc pool recycles freed reads — a fresh np.empty
        # pays kernel page-zeroing + first-touch on every byte (~40 ms/GB),
        # which is exactly the edge parquet-C++ readers get for free
        out_buf = pa.allocate_buffer(total)
        out = np.frombuffer(out_buf, np.uint8) if total else np.empty(0, np.uint8)
    out_typed = out.view(np_dtype)
    # raw runs: threaded native decompress straight into the final buffer
    i, n = 0, len(raw_jobs)
    while i < n:
        j = i + 1
        while j < n and raw_jobs[j][0] == raw_jobs[i][0]:
            j += 1
        native.decompress_batch_into(
            raw_jobs[i][0],
            [c[1] for c in raw_jobs[i:j]],
            out,
            [c[2] * width for c in raw_jobs[i:j]],
            [c[3] for c in raw_jobs[i:j]],
        )
        i = j
    # plain bitpacked / delta pages: native block walk + widen
    for buf, body, nv, r, is_delta in bp_jobs:
        n_blocks = (nv + 127) // 128
        vals, _end = native.bp_decode(buf, body, n_blocks)
        vals = vals[:nv]
        if is_delta:
            vals = np.cumsum(vals, dtype=np.uint32)
        out_typed[r : r + nv] = vals.view(np.int32) if np_dtype.kind != "u" else vals
    # one-value pages: broadcast fill
    for vb, nv, r in one_jobs:
        out_typed[r : r + nv] = np.frombuffer(vb, np_dtype, 1)[0]
    # DICT pages: one fused native call — per-page codes decode + gather
    # against the concatenated dictionaries, threaded over pages
    if dict_jobs:
        dicts = [j[4] for j in dict_jobs]
        bases = np.zeros(len(dicts), dtype=np.int64)
        bases[1:] = np.cumsum([len(d) for d in dicts[:-1]])
        all_dict = (
            np.ascontiguousarray(np.concatenate(dicts))
            if len(dicts) > 1
            else np.ascontiguousarray(dicts[0])
        )
        native.dict_column_decode(
            [
                (b, body, nv, r, base, kind)
                for (b, body, nv, r, _d, kind), base in zip(dict_jobs, bases)
            ],
            all_dict,
            out_typed,
        )
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
        field.type, n_rows, [null_bitmap, out_buf]
    )
