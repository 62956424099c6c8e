"""Compressed-in-HBM resident tables: scan packed pages at kernel speed.

``scan_file`` materializes decoded columns in HBM (8B/row for int64).  A
*resident* table instead keeps the BITPACKED words in HBM (b/32 of the
decoded size; dict columns keep packed CODES + the tiny dictionary) and
decodes on the fly inside each query — order-invariant consumers (filter,
sum, grouped aggregate) read the plane kernel's tiled output directly,
skipping the natural-order restore whose 4-lane value interleave is
HBM-granularity-bound (~20 GB/s); measured tiled-order scan rate on v5e:
~280 GB/s of decoded values per column (bench
``resident_scan_bandwidth_tiled``).

Row alignment: the tiled permutation ``value -> (tile, t, lane)`` depends
only on the lane layout (lane = 4*block + l) and tile padding — NOT on the
bit width — so every column loaded with the same row count and tile size
is row-aligned in tiled order, and cross-column predicates/aggregations
are exact.  The natural row index of every tiled slot is pure arithmetic
on the slot index (no stored permutation): padding masks and per-page
padding masks compute on the fly and fuse into the consumers.

Measured (v5e, 8.4M rows x 4 columns incl. 2 dict columns, Q6 shape):
fused warm Q6 = 29 ms through the axon relay, of which ~25 ms is the
relay's scalar-fetch floor (289 Mrows/s; 3.4x compression held in HBM).

Capability note vs the reference: the reference decodes to host memory and
has no resident representation (src/read/batch_read.rs); this is the
TPU-shaped extension of its page layouts (BitPacker4x blocks
integer/bp.rs:36-86; dict pages integer/dict.rs:34-102) to in-memory
serving.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

from ..constants import Compression
from ..codecs import read_header
from ..errors import NotYetImplementedError, OutOfSpecError
from ..meta import ColumnMeta
from ..read.levels import read_validity
from ..read.reader import infer_schema, read_meta
from ..schema import n_leaf_columns


@dataclass
class ResidentColumn:
    name: str
    wt3: "object"  # (n_tiles, b, tile) u32 packed words (values or codes)
    num_bits: int
    length: int  # true row count (tiled slots beyond are padding)
    # dict columns only: GLOBAL SORTED dictionary (codes remapped at load).
    # Sortedness is the point: a value-range predicate becomes a CODE-range
    # predicate (host searchsorted) — filters never gather at all; only
    # sums over the dict column pay one small MXU gather.
    dictionary: "object" = None  # device i32
    dictionary_host: "object" = None  # np i64 (bound translation)

    @property
    def tiled_slots(self) -> int:
        n_tiles, _b, tile = self.wt3.shape
        return n_tiles * tile * 32


def _rows_to_t_major(out3, b: int):
    """Plane-kernel rows (p*b + j order for divisor widths) → t-major rows.

    Divisor widths: the row permutation IS a (P, b) transpose — pure
    reshape/transpose with contiguous 64 KB tile-lane runs (an axis-1
    GATHER here lowers to a pathological general gather on TPU; the
    transpose streams).  Non-divisor widths already come out t-major.
    """
    import jax.numpy as jnp

    if 32 % b != 0 or b == 32:
        return out3
    n_tiles, rows, tile = out3.shape
    P = 32 // b
    return jnp.transpose(
        out3.reshape(n_tiles, P, b, tile), (0, 2, 1, 3)
    ).reshape(n_tiles, 32, tile)


def _natural_index_tiled(n_tiles: int, tile: int):
    """Natural row index of every tiled slot, as fused iota arithmetic.

    slot (tile_i, t, lane): lane_global = tile_i*tile + lane = 4*blk + l;
    natural = 128*blk + 4*t + l — independent of the bit width.
    """
    import jax
    import jax.numpy as jnp

    shape = (n_tiles, 32, tile)
    ti = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    t = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    lane_g = ti * tile + lane
    nat = 128 * (lane_g // 4) + 4 * t + (lane_g % 4)
    return nat.reshape(-1)


@dataclass
class ResidentTable:
    columns: Dict[str, ResidentColumn]
    num_rows: int
    tile: int

    def __post_init__(self):
        self._jit_cache: Dict = {}
        self._bounds_cache: Dict = {}

    def _code_bounds(self, col: str, lo, hi):
        """Translate VALUE bounds to CODE bounds for sorted-dict columns.

        The global dictionary is sorted, so [lo, hi) over values equals
        [searchsorted(lo), searchsorted(hi)) over codes — the filter needs
        no dictionary gather at all.
        """
        c = self.columns[col]
        if c.dictionary_host is None:
            return lo, hi, False
        d = c.dictionary_host
        lo_c = None if lo is None else int(np.searchsorted(d, lo, "left"))
        hi_c = None if hi is None else int(np.searchsorted(d, hi, "left"))
        return lo_c, hi_c, True

    def _bounds(self, predicates, pcols):
        """Device arrays for the lo/hi literals (code-space for dict
        columns), cached by value — each fresh host→device transfer costs a
        relay round trip on this box."""
        import jax.numpy as jnp

        key = tuple((c,) + tuple(predicates[c]) for c in pcols)
        hit = self._bounds_cache.get(key)
        if hit is None:
            los, his = [], []
            for c in pcols:
                lo, hi = predicates[c]
                lo, hi, _is_code = self._code_bounds(c, lo, hi)
                if predicates[c][0] is not None:
                    los.append(lo)
                if predicates[c][1] is not None:
                    his.append(hi)
            hit = (
                jnp.asarray(los, dtype=jnp.int32),
                jnp.asarray(his, dtype=jnp.int32),
            )
            self._bounds_cache[key] = hit
        return hit

    def __getitem__(self, name: str) -> ResidentColumn:
        return self.columns[name]

    def _nat(self, col: ResidentColumn):
        n_tiles, _b, tile = col.wt3.shape
        return _natural_index_tiled(n_tiles, tile)

    def mask_tiled(self):
        """Alignment mask (True = real row), computed on the fly."""
        c = next(iter(self.columns.values()))
        return self._nat(c) < self.num_rows

    # -- order-invariant query ops -------------------------------------

    def decode_tiled(self, name: str):
        """Column values in tiled order (int32), padding slots included."""
        import jax.numpy as jnp

        from ..kernels.bitunpack_pallas import bitunpack_pallas_tiled_seeded

        c = self.columns[name]
        out3 = bitunpack_pallas_tiled_seeded(c.wt3, jnp.uint32(0), c.num_bits)
        out3 = _rows_to_t_major(out3, c.num_bits)
        out = out3.reshape(-1).astype(jnp.int32)
        if c.dictionary is not None:
            from ..kernels.decode import dict_gather_device

            # plain XLA gathers are pathological on TPU (kernels/gather);
            # the dictionary lookup rides the MXU one-hot path
            out = dict_gather_device(out, c.dictionary)
        return out

    def _decode_in_trace(self, name: str, wt3, dictionary):
        """decode_tiled body over traced inputs (used inside fused jits)."""
        import jax.numpy as jnp

        from ..kernels.bitunpack_pallas import bitunpack_pallas_tiled_seeded

        c = self.columns[name]
        out3 = bitunpack_pallas_tiled_seeded(wt3, jnp.uint32(0), c.num_bits)
        out3 = _rows_to_t_major(out3, c.num_bits)
        out = out3.reshape(-1).astype(jnp.int32)
        if dictionary is not None:
            from ..kernels.decode import dict_gather_device

            out = dict_gather_device(out, dictionary)
        return out

    def _col_args(self, name: str):
        c = self.columns[name]
        return (c.wt3, c.dictionary)

    def filter_sum(
        self,
        predicates: Dict[str, Tuple[Optional[int], Optional[int]]],
        value: str,
        product_with: Optional[str] = None,
    ):
        """sum(value [* product_with]) where every predicate col in [lo, hi).

        The Q6 shape.  Decode + predicate + reduce fuse into ONE jitted
        call (cached per query shape; bound VALUES are traced, so changing
        a constant does not recompile).  Nothing is restored to natural
        order.  Bounds are half-open; None = unbounded.
        """
        import jax
        import jax.numpy as jnp

        pcols = tuple(sorted(predicates))
        flags = tuple(
            (predicates[c][0] is not None, predicates[c][1] is not None)
            for c in pcols
        )
        key = ("fs", pcols, flags, value, product_with)
        fn = self._jit_cache.get(key)
        if fn is None:
            names = list(dict.fromkeys(pcols + (value,) + ((product_with,) if product_with else ())))

            value_cols = {value} | ({product_with} if product_with else set())

            def impl(colargs, los, his):
                # predicate-only columns stay in CODE space (no gather);
                # summed columns decode through the dictionary
                cols = {}
                codes = {}
                for n in names:
                    wt3, dictionary = colargs[n]
                    if n in value_cols:
                        cols[n] = self._decode_in_trace(n, wt3, dictionary)
                    if n in pcols:
                        codes[n] = self._decode_in_trace(n, wt3, None)
                m = self.mask_tiled()
                li = hi_i = 0
                for cname, (has_lo, has_hi) in zip(pcols, flags):
                    cv = codes[cname]
                    if has_lo:
                        m = m & (cv >= los[li]); li += 1
                    if has_hi:
                        m = m & (cv < his[hi_i]); hi_i += 1
                acc = cols[value]
                if product_with is not None:
                    acc = acc.astype(jnp.int64) * cols[product_with]
                return jnp.sum(jnp.where(m, acc, 0), dtype=jnp.int64)

            fn = jax.jit(impl)
            self._jit_cache[key] = fn
        names = list(dict.fromkeys(pcols + (value,) + ((product_with,) if product_with else ())))
        colargs = {n: self._col_args(n) for n in names}
        los, his = self._bounds(predicates, pcols)
        return fn(colargs, los, his)

    def group_sum(
        self,
        key: str,
        values: Sequence[str],
        num_groups: int,
        predicates: Optional[Dict[str, Tuple[Optional[int], Optional[int]]]] = None,
    ):
        """Per-group sums + counts over dense integer keys in [0, num_groups).

        Grouping is a segment-sum over tiled order — permutation-invariant,
        so results equal the natural-order aggregate exactly.
        """
        import jax
        import jax.numpy as jnp

        predicates = predicates or {}
        pcols = tuple(sorted(predicates))
        flags = tuple(
            (predicates[c][0] is not None, predicates[c][1] is not None)
            for c in pcols
        )
        ck = ("gs", key, tuple(values), num_groups, pcols, flags)
        fn = self._jit_cache.get(ck)
        names = list(dict.fromkeys((key,) + tuple(values) + pcols))
        if fn is None:

            value_cols = {key} | set(values)

            def impl(colargs, los, his):
                cols = {}
                codes = {}
                for n in names:
                    wt3, dictionary = colargs[n]
                    if n in value_cols:
                        cols[n] = self._decode_in_trace(n, wt3, dictionary)
                    if n in pcols:
                        codes[n] = self._decode_in_trace(n, wt3, None)
                m = self.mask_tiled()
                li = hi_i = 0
                for cname, (has_lo, has_hi) in zip(pcols, flags):
                    cv = codes[cname]
                    if has_lo:
                        m = m & (cv >= los[li]); li += 1
                    if has_hi:
                        m = m & (cv < his[hi_i]); hi_i += 1
                k = jnp.where(m, cols[key], num_groups)
                outs = []
                for v in values:
                    vv = cols[v].astype(jnp.int64)
                    outs.append(
                        jax.ops.segment_sum(
                            jnp.where(m, vv, 0), k, num_segments=num_groups + 1
                        )[:num_groups]
                    )
                cnt = jax.ops.segment_sum(
                    m.astype(jnp.int64), k, num_segments=num_groups + 1
                )[:num_groups]
                return outs, cnt

            fn = jax.jit(impl)
            self._jit_cache[ck] = fn
        colargs = {n: self._col_args(n) for n in names}
        los, his = self._bounds(predicates, pcols)
        return fn(colargs, los, his)


def _column_packed_words(
    file_bytes: np.ndarray, meta: ColumnMeta, field: pa.Field, np_dtype
):
    """One column → uniform-width packed block words (+ dicts for DICT pages).

    Every page's values (or dict codes) decode to u32 host-side — the
    native one-pass block walk handles mixed per-block widths — and the
    whole column repacks ONCE (vectorized) at the global width, so the
    resident layout is always a single uniform block stream regardless of
    how the writer mixed widths across blocks/pages.  Returns
    (words (n_blocks, b*4) u32, b, n_rows, sorted_global_dict|None).  Raises
    NotYetImplementedError for layouts without a packed representation —
    resident loading is an opt-in fast representation, never silently wrong.
    """
    from .. import native
    from ..util.bits import pack_blocks

    if not native.available():
        raise NotYetImplementedError("resident load needs the native runtime")
    nullable = bool(field.nullable)
    vals_parts = []
    dicts = None
    n_rows = 0
    page_rows = int(meta.pages[0].num_values) if meta.pages else 0
    pos = meta.offset
    for pi, page in enumerate(meta.pages):
        buf = file_bytes[pos : pos + page.length]
        p = 0
        if nullable:
            validity, p = read_validity(buf, 0, page.num_values)
            if validity is not None:
                raise NotYetImplementedError(
                    f"resident load of nullable column {field.name!r} with nulls"
                )
        if pi < len(meta.pages) - 1 and page.num_values != page_rows:
            raise OutOfSpecError("non-uniform page grid")
        codec, csize, _us, body = read_header(buf, p)
        n_blocks = (page.num_values + 127) // 128
        if codec == Compression.DICT:
            icodec, icsize, _ius, ibody = read_header(buf, body)
            if icodec != Compression.BITPACKING:
                raise NotYetImplementedError(
                    f"resident load: column {field.name!r} dict index codec "
                    f"{icodec!r}"
                )
            vpos = ibody + icsize
            count = int(np.frombuffer(buf, "<u4", 1, vpos)[0])
            if count == 0:
                raise NotYetImplementedError(
                    f"resident load: all-null dict page in {field.name!r}"
                )
            dvals = np.frombuffer(buf, np_dtype, count, vpos + 4)
            dwide = dvals.astype(np.int64)
            if dwide.size and (
                int(dwide.min()) < -(1 << 31) or int(dwide.max()) >= 1 << 31
            ):
                # dict VALUES ride as int32 on device; wrapping would corrupt
                # decoded sums and the sorted-dict bound translation
                raise NotYetImplementedError(
                    f"resident load: dict values of {field.name!r} exceed i32"
                )
            if dicts is None:
                if vals_parts:
                    raise NotYetImplementedError(
                        f"resident load: column {field.name!r} mixes dict and "
                        "plain pages"
                    )
                dicts = []
            dicts.append(dvals.astype(np.int32))
            vals, _end = native.bp_decode(buf, ibody, n_blocks)
            vals = vals[: page.num_values]
        elif codec == Compression.BITPACKING:
            if dicts is not None:
                raise NotYetImplementedError(
                    f"resident load: column {field.name!r} mixes dict and "
                    "plain pages"
                )
            vals, _end = native.bp_decode(buf, body, n_blocks)
            vals = vals[: page.num_values]
        elif codec.raw_mode and dicts is None:
            from ..codecs.common import decompress

            raw = decompress(
                codec,
                buf[body : body + csize].tobytes(),
                page.num_values * np_dtype.itemsize,
            )
            wide = np.frombuffer(raw, np_dtype, page.num_values).astype(np.int64)
            if (wide < 0).any() or (len(wide) and int(wide.max()) >= 1 << 31):
                raise NotYetImplementedError(
                    f"resident load: column {field.name!r} values exceed i32"
                )
            vals = wide.astype(np.uint32)
        else:
            raise NotYetImplementedError(
                f"resident load: column {field.name!r} page codec {codec!r} "
                "(BITPACKING / DICT-over-BITPACKING / raw only)"
            )
        vals_parts.append(vals)
        n_rows += page.num_values
        pos += page.length
    if not vals_parts:
        raise OutOfSpecError(f"column {field.name!r} has no pages")
    gdict = None
    if dicts is not None:
        # GLOBAL SORTED dictionary: page codes remap through
        # searchsorted(gdict, page_dict) — sortedness turns value-range
        # predicates into code-range predicates at query time
        gdict = np.unique(np.concatenate(dicts))
        vals_parts = [
            np.searchsorted(gdict, d)[v.astype(np.int64)].astype(np.uint32)
            for v, d in zip(vals_parts, dicts)
        ]
    allv = np.concatenate(vals_parts)
    b = max(int(allv.max()).bit_length(), 1) if allv.size else 1
    if b > 31:
        # decoded values ride as int32 in the query ops; a 32-bit value
        # would wrap negative and silently corrupt comparisons
        raise NotYetImplementedError(
            f"resident load: {field.name!r} values exceed 31 bits"
        )
    pad = (-len(allv)) % 128
    if pad:
        allv = np.concatenate([allv, np.zeros(pad, np.uint32)])
    words = pack_blocks(allv.reshape(-1, 128), b)
    return words, b, n_rows, gdict


def load_resident(
    path: str, columns: Optional[Sequence[str]] = None, tile: Optional[int] = None
) -> ResidentTable:
    """Load a file's bitpacked/dict columns as a compressed-in-HBM table.

    Every loaded column must use one uniform width across pages (values or
    dict codes); HBM cost is b/32 of the decoded size per column (+ the
    KB-scale dictionaries).
    """
    import jax.numpy as jnp

    from ..kernels.bitunpack_pallas import TILE3D, transpose_words_host_tiled

    with open(path, "rb") as f:
        schema = infer_schema(f)
        metas = read_meta(f)
    file_bytes = np.memmap(path, dtype=np.uint8, mode="r")
    tile = tile or TILE3D
    out: Dict[str, ResidentColumn] = {}
    n_rows = None
    slots = None
    i = 0
    for field in schema:
        n = n_leaf_columns(field.type)
        meta = metas[i]
        i += n
        if columns is not None and field.name not in columns:
            continue
        np_dtype = np.dtype(field.type.to_pandas_dtype()) if pa.types.is_integer(
            field.type
        ) else None
        if np_dtype is None:
            raise NotYetImplementedError(
                f"resident load of non-integer column {field.name!r}"
            )
        words, b, rows, gdict = _column_packed_words(
            file_bytes, meta, field, np_dtype
        )
        wt3 = jnp.asarray(transpose_words_host_tiled(words.reshape(-1), b, tile))
        dictionary = dict_host = None
        if gdict is not None:
            dictionary = jnp.asarray(gdict.astype(np.int32))
            dict_host = gdict.astype(np.int64)
        col = ResidentColumn(
            field.name, wt3, b, rows, dictionary, dict_host
        )
        if n_rows is None:
            n_rows = rows
            slots = col.tiled_slots
        elif rows != n_rows or col.tiled_slots != slots:
            raise OutOfSpecError(
                f"resident columns disagree on row grid: {field.name!r}"
            )
        out[field.name] = col
    if not out:
        raise OutOfSpecError("no loadable columns")
    return ResidentTable(out, n_rows, tile)
