"""Distributed partitioned file scan (BASELINE config 5 front half).

Each mesh shard owns a contiguous page range of the row-aligned page grid —
derived with the reference's pruning primitive (``ColumnMeta.slice``,
src/lib.rs:46-65) — decodes only its pages, and the resulting columns are
device_put with a ``shards``-axis sharding so the shuffle/aggregate stages
run directly on top.

Column coverage mirrors the single-chip scan (every leaf the reference's
batch reader handles, src/read/batch_read.rs:27-209, minus nested layouts
which raise): numerics, decimals (unscaled int64), booleans, and utf8/binary.
String columns ride as **dictionary codes against one global dictionary**:
each shard decodes its pages to (codes, local dict) with the zero-re-encode
dict-page path, the small per-shard dictionaries merge host-side into a
global pool (on a real pod: a host-level allgather of dictionaries at plan
time — dictionaries are KB-scale, rows never move), and each shard's codes
remap through a per-shard translation gather on device.  Downstream shuffle/
aggregate/join then treat string keys as plain int32 payloads.

On a multi-host pod each process calls this with its own ``process_index``;
in single-host simulation all shards decode locally and are placed across
the virtual devices.  ``local_shard_table`` is the per-process byte-range
path: it opens the file and decodes ONLY the calling process's page range.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..errors import NotYetImplementedError
from ..exec.scan import (
    DeviceTable,
    _decode_binary_column_device,
    _decode_decimal_column_device,
    decode_column_pages_device,
)
from ..meta import ColumnMeta
from ..read.reader import infer_schema, read_meta
from ..schema import is_primitive, n_leaf_columns


def shard_page_ranges(n_pages: int, n_shards: int) -> List[range]:
    """Contiguous page ranges per shard (balanced)."""
    base = n_pages // n_shards
    extra = n_pages % n_shards
    out = []
    start = 0
    for s in range(n_shards):
        ln = base + (1 if s < extra else 0)
        out.append(range(start, start + ln))
        start += ln
    return out


def _is_stringlike(t: pa.DataType) -> bool:
    return (
        pa.types.is_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_string(t)
        or pa.types.is_large_binary(t)
    )


def _decode_shard_column(file_bytes, meta, field, keep):
    """One shard's pages of one column → DeviceColumn (dispatch by type)."""
    if _is_stringlike(field.type):
        return _decode_binary_column_device(file_bytes, meta, field, keep)
    if pa.types.is_decimal(field.type):
        return _decode_decimal_column_device(file_bytes, meta, field, keep)
    return decode_column_pages_device(file_bytes, meta, field, keep)


def _merge_dictionaries(dicts: List[pa.Array]) -> Tuple[pa.Array, List[np.ndarray]]:
    """Global dictionary + per-shard code translation tables.

    Pool-dedup over the concatenated per-shard dictionaries only (KB-scale;
    row data never re-encodes) — the same idiom as the single-chip merge in
    ``_decode_binary_column_device``.  On a real pod the pool is built from
    an allgather of the per-process dictionaries.
    """
    import pyarrow.compute as pc

    pool = pa.concat_arrays([d.cast(pa.binary()) for d in dicts])
    global_dict = pc.unique(pool)
    remap = (
        pc.index_in(pool, value_set=global_dict)
        .to_numpy(zero_copy_only=False)
        .astype(np.int32)
    )
    tables = []
    base = 0
    for d in dicts:
        tables.append(remap[base : base + len(d)])
        base += len(d)
    return global_dict, tables


def distributed_scan(
    path: str,
    mesh: Mesh,
    axis: str = "shards",
    columns: Optional[Sequence[str]] = None,
) -> DeviceTable:
    """Scan a file with pages partitioned across the mesh axis.

    Rows per shard are padded to the max shard size (static shapes for the
    collectives); a ``__valid__`` row mask marks the padding.  Nullable
    columns carry their validity sharded alongside the values.
    """
    from ..exec.scan import DeviceColumn

    n_shards = mesh.shape[axis]
    with open(path, "rb") as f:
        schema = infer_schema(f)
        metas = read_meta(f)
    # mmap: each shard's decode touches only its own page byte ranges — the
    # single-host analogue of per-shard object-store range reads
    file_bytes = np.memmap(path, dtype=np.uint8, mode="r")
    n_pages = max(len(m.pages) for m in metas)
    ranges = shard_page_ranges(n_pages, n_shards)

    # per-shard host decode (a real multi-host deployment decodes only the
    # local shard — see local_shard_table; simulation decodes all shards)
    shard_vals: Dict[str, List[np.ndarray]] = {}
    shard_valid: Dict[str, List[Optional[np.ndarray]]] = {}
    col_dict: Dict[str, Optional[pa.Array]] = {}
    col_dtype: Dict[str, pa.DataType] = {}
    rows_per_shard: List[int] = []
    i = 0
    for field in schema:
        n = n_leaf_columns(field.type)
        meta = metas[i]
        i += n
        if columns is not None and field.name not in columns:
            continue
        if not is_primitive(field.type) or pa.types.is_null(field.type):
            raise NotYetImplementedError(
                f"distributed scan of nested column {field.name!r}; "
                "select columns=... to exclude it"
            )
        per_shard_cols = []
        for s, rng_s in enumerate(ranges):
            keep = np.zeros(len(meta.pages), dtype=bool)
            keep[rng_s.start : rng_s.stop] = True
            col = _decode_shard_column(file_bytes, meta, field, keep)
            per_shard_cols.append(col)
            if len(rows_per_shard) <= s:
                rows_per_shard.append(len(col))
        if _is_stringlike(field.type):
            empty = pa.array([], pa.binary())
            gdict, tables = _merge_dictionaries(
                [
                    c.dictionary if c.dictionary is not None else empty
                    for c in per_shard_cols
                ]
            )
            vals = [
                tables[s][np.asarray(c.values)]
                for s, c in enumerate(per_shard_cols)
            ]
            col_dict[field.name] = gdict
        else:
            vals = [np.asarray(c.values) for c in per_shard_cols]
            col_dict[field.name] = None
        shard_vals[field.name] = vals
        shard_valid[field.name] = [
            None if c.validity is None else np.asarray(c.validity)
            for c in per_shard_cols
        ]
        col_dtype[field.name] = field.type

    max_rows = max(rows_per_shard) if rows_per_shard else 0
    sharding = NamedSharding(mesh, P(axis))

    def _put(parts: List[np.ndarray], dtype, fill=0):
        padded = np.full((n_shards, max_rows), fill, dtype=dtype)
        for s, p in enumerate(parts):
            padded[s, : len(p)] = p
        return jax.device_put(jnp.asarray(padded.reshape(-1)), sharding)

    out_cols: Dict[str, DeviceColumn] = {}
    for name, parts in shard_vals.items():
        arr = _put(parts, parts[0].dtype)
        validity = None
        vparts = shard_valid[name]
        if any(v is not None for v in vparts):
            vfull = [
                np.ones(len(p), dtype=bool) if v is None else v
                for p, v in zip(parts, vparts)
            ]
            validity = _put(vfull, np.bool_, fill=False)
        out_cols[name] = DeviceColumn(
            name, col_dtype[name], arr, validity, dictionary=col_dict[name]
        )
    valid = np.zeros((n_shards, max_rows), dtype=bool)
    for s, r in enumerate(rows_per_shard):
        valid[s, :r] = True
    out_cols["__valid__"] = DeviceColumn(
        "__valid__",
        pa.bool_(),
        jax.device_put(jnp.asarray(valid.reshape(-1)), sharding),
        None,
    )
    return DeviceTable(out_cols, n_shards * max_rows)


def local_shard_table(
    path: str,
    process_index: int,
    process_count: int,
    columns: Optional[Sequence[str]] = None,
) -> Tuple[DeviceTable, Dict[str, pa.Array]]:
    """Per-process byte-range scan: decode ONLY this process's page range.

    The real-pod building block behind :func:`distributed_scan`'s simulation:
    a process opens the file (or issues object-store range reads), touches
    only the byte ranges of its own contiguous page shard, and returns the
    local rows plus its *local* string dictionaries (to be allgathered and
    merged with :func:`_merge_dictionaries` before any keyed exchange).
    No whole-file decode happens on any single process.
    """
    from ..exec.scan import DeviceColumn

    with open(path, "rb") as f:
        schema = infer_schema(f)
        metas = read_meta(f)
    file_bytes = np.memmap(path, dtype=np.uint8, mode="r")
    n_pages = max(len(m.pages) for m in metas)
    rng_s = shard_page_ranges(n_pages, process_count)[process_index]
    out: Dict[str, DeviceColumn] = {}
    local_dicts: Dict[str, pa.Array] = {}
    num_rows = 0
    i = 0
    for field in schema:
        n = n_leaf_columns(field.type)
        meta = metas[i]
        i += n
        if columns is not None and field.name not in columns:
            continue
        if not is_primitive(field.type) or pa.types.is_null(field.type):
            raise NotYetImplementedError(
                f"distributed scan of nested column {field.name!r}; "
                "select columns=... to exclude it"
            )
        keep = np.zeros(len(meta.pages), dtype=bool)
        keep[rng_s.start : rng_s.stop] = True
        col = _decode_shard_column(file_bytes, meta, field, keep)
        if col.dictionary is not None:
            local_dicts[field.name] = col.dictionary
        out[field.name] = col
        num_rows = len(col)
    return DeviceTable(out, num_rows), local_dicts


def _dataset_units(paths: Sequence[str], n_shards: int):
    """Split a dataset into >= n_shards (path, page-range) work units.

    Whole files when there are enough; otherwise each file splits into
    contiguous page ranges (the same granularity single-file
    ``distributed_scan`` shards at).  Returns (units, metas_by_path,
    schema) where units = [(path, range)] with per-unit row counts.
    """
    from ..read.reader import infer_schema, read_meta

    metas_by_path = {}
    schema = None
    pages_by_path = {}
    for p in paths:
        with open(p, "rb") as f:
            s = infer_schema(f)
            metas_by_path[p] = read_meta(f)
        if schema is None:
            schema = s
        elif [f.name for f in s] != [f.name for f in schema]:
            from ..errors import OutOfSpecError

            raise OutOfSpecError(
                f"dataset files disagree on schema: {p} vs {paths[0]}"
            )
        pages_by_path[p] = max(len(m.pages) for m in metas_by_path[p])
    per_file = max(1, -(-n_shards // len(paths)))  # ceil
    units = []
    for p in paths:
        for r in shard_page_ranges(pages_by_path[p], min(per_file, pages_by_path[p]) or 1):
            if r.stop > r.start:
                units.append((p, r))
    return units, metas_by_path, schema


def distributed_scan_dataset(
    paths: Sequence[str],
    mesh: Mesh,
    axis: str = "shards",
    columns: Optional[Sequence[str]] = None,
) -> DeviceTable:
    """Multi-file dataset scanned with work units partitioned over the mesh.

    The pod-scale composition of the dataset layer (``exec.dataset``) and
    the sharded scan: files split into (path, page-range) units, units
    greedily pack onto shards by row count, per-shard pieces decode and
    concatenate host-side, and string dictionaries merge GLOBALLY (one pool
    dedup over every piece) so codes compare across the whole dataset.
    Same output contract as :func:`distributed_scan` (padded shards +
    ``__valid__`` mask).
    """
    import heapq

    from ..exec.scan import DeviceColumn

    paths = list(paths)
    n_shards = mesh.shape[axis]
    units, metas_by_path, schema = _dataset_units(paths, n_shards)

    # greedy balance: next-largest unit onto the least-loaded shard
    unit_rows = []
    for p, r in units:
        meta0 = metas_by_path[p][0]
        unit_rows.append(sum(pg.num_values for pg in meta0.pages[r.start : r.stop]))
    order = sorted(range(len(units)), key=lambda i: -unit_rows[i])
    heap = [(0, s) for s in range(n_shards)]
    heapq.heapify(heap)
    assign: List[List[int]] = [[] for _ in range(n_shards)]
    for i in order:
        load, s = heapq.heappop(heap)
        assign[s].append(i)
        heapq.heappush(heap, (load + unit_rows[i], s))
    for lst in assign:
        lst.sort()  # keep file/page order within a shard

    file_bytes = {p: np.memmap(p, dtype=np.uint8, mode="r") for p in paths}
    leaf_index = {}
    i = 0
    for field in schema:
        leaf_index[field.name] = i
        i += n_leaf_columns(field.type)

    shard_vals: Dict[str, List[np.ndarray]] = {}
    shard_valid: Dict[str, List[Optional[np.ndarray]]] = {}
    col_dict: Dict[str, Optional[pa.Array]] = {}
    col_dtype: Dict[str, pa.DataType] = {}
    rows_per_shard: List[int] = []
    for field in schema:
        if columns is not None and field.name not in columns:
            continue
        if not is_primitive(field.type) or pa.types.is_null(field.type):
            raise NotYetImplementedError(
                f"distributed scan of nested column {field.name!r}; "
                "select columns=... to exclude it"
            )
        pieces: List[List] = []  # per shard: list of DeviceColumn
        for s in range(n_shards):
            cols = []
            for ui in assign[s]:
                p, r = units[ui]
                meta = metas_by_path[p][leaf_index[field.name]]
                keep = np.zeros(len(meta.pages), dtype=bool)
                keep[r.start : r.stop] = True
                cols.append(
                    _decode_shard_column(file_bytes[p], meta, field, keep)
                )
            pieces.append(cols)
        if _is_stringlike(field.type):
            empty = pa.array([], pa.binary())
            flat = [c for cols in pieces for c in cols]
            gdict, tables = _merge_dictionaries(
                [
                    c.dictionary if c.dictionary is not None else empty
                    for c in flat
                ]
            )
            vals, k = [], 0
            for cols in pieces:
                parts = []
                for c in cols:
                    parts.append(tables[k][np.asarray(c.values)])
                    k += 1
                vals.append(
                    np.concatenate(parts) if parts else np.zeros(0, np.int32)
                )
            col_dict[field.name] = gdict
        else:
            vals = [
                np.concatenate([np.asarray(c.values) for c in cols])
                if cols
                else np.zeros(0, np.int64)
                for cols in pieces
            ]
            col_dict[field.name] = None
        if len(rows_per_shard) < n_shards:
            rows_per_shard = [len(v) for v in vals]
        shard_vals[field.name] = vals
        shard_valid[field.name] = [
            (
                np.concatenate(
                    [
                        np.ones(len(c), dtype=bool)
                        if c.validity is None
                        else np.asarray(c.validity)
                        for c in cols
                    ]
                )
                if cols and any(c.validity is not None for c in cols)
                else None
            )
            for cols in pieces
        ]
        col_dtype[field.name] = field.type

    max_rows = max(rows_per_shard) if rows_per_shard else 0
    sharding = NamedSharding(mesh, P(axis))

    def _put(parts, dtype, fill=0):
        padded = np.full((n_shards, max_rows), fill, dtype=dtype)
        for s, pp in enumerate(parts):
            padded[s, : len(pp)] = pp
        return jax.device_put(jnp.asarray(padded.reshape(-1)), sharding)

    out_cols: Dict[str, DeviceColumn] = {}
    for name, parts in shard_vals.items():
        arr = _put(parts, parts[0].dtype if len(parts[0]) else np.int64)
        validity = None
        vparts = shard_valid[name]
        if any(v is not None for v in vparts):
            vfull = [
                np.ones(len(p), dtype=bool) if v is None else v
                for p, v in zip(parts, vparts)
            ]
            validity = _put(vfull, np.bool_, fill=False)
        out_cols[name] = DeviceColumn(
            name, col_dtype[name], arr, validity, dictionary=col_dict[name]
        )
    valid = np.zeros((n_shards, max_rows), dtype=bool)
    for s, r in enumerate(rows_per_shard):
        valid[s, :r] = True
    out_cols["__valid__"] = DeviceColumn(
        "__valid__",
        pa.bool_(),
        jax.device_put(jnp.asarray(valid.reshape(-1)), sharding),
        None,
    )
    return DeviceTable(out_cols, n_shards * max_rows)
