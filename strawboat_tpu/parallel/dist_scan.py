"""Distributed partitioned file scan (BASELINE config 5 front half).

Each mesh shard owns a contiguous page range of the row-aligned page grid —
derived with the reference's pruning primitive (``ColumnMeta.slice``,
src/lib.rs:46-65) — decodes only its pages, and the resulting columns are
device_put with a ``shards``-axis sharding so the shuffle/aggregate stages
run directly on top.

On a multi-host pod each process calls this with its own ``process_index``;
in single-host simulation all shards decode locally and are placed across
the virtual devices.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..exec.scan import DeviceTable, decode_column_pages_device
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


def distributed_scan(
    path: str,
    mesh: Mesh,
    axis: str = "shards",
    columns: Optional[Sequence[str]] = None,
) -> DeviceTable:
    """Scan a file with pages partitioned across the mesh axis.

    Rows per shard are padded to the max shard size (static shapes for the
    collectives); a ``__valid__`` row mask marks the padding.
    """
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
    # local shard; simulation decodes all and shards the result)
    shard_cols: Dict[str, List[np.ndarray]] = {}
    shard_valid: List[np.ndarray] = []
    rows_per_shard = []
    i = 0
    fields = []
    for field in schema:
        n = n_leaf_columns(field.type)
        meta = metas[i]
        i += n
        if columns is not None and field.name not in columns:
            continue
        if not is_primitive(field.type) or pa.types.is_boolean(field.type) or (
            pa.types.is_string(field.type)
            or pa.types.is_binary(field.type)
            or pa.types.is_large_string(field.type)
            or pa.types.is_large_binary(field.type)
        ):
            continue  # distributed scan: numeric columns (keys/measures)
        fields.append(field)
        shard_cols[field.name] = []
        for s, rng_s in enumerate(ranges):
            keep = np.zeros(len(meta.pages), dtype=bool)
            keep[rng_s.start : rng_s.stop] = True
            col = decode_column_pages_device(file_bytes, meta, field, keep)
            shard_cols[field.name].append(np.asarray(col.values))
            if len(rows_per_shard) <= s:
                rows_per_shard.append(len(col))

    max_rows = max(rows_per_shard) if rows_per_shard else 0
    out_cols = {}
    for name, parts in shard_cols.items():
        padded = np.zeros((n_shards, max_rows), dtype=parts[0].dtype)
        for s, p in enumerate(parts):
            padded[s, : len(p)] = p
        arr = jax.device_put(
            jnp.asarray(padded.reshape(-1)), NamedSharding(mesh, P(axis))
        )
        from ..exec.scan import DeviceColumn

        out_cols[name] = DeviceColumn(name, None, arr, None)
    valid = np.zeros((n_shards, max_rows), dtype=bool)
    for s, r in enumerate(rows_per_shard):
        valid[s, :r] = True
    from ..exec.scan import DeviceColumn

    out_cols["__valid__"] = DeviceColumn(
        "__valid__",
        pa.bool_(),
        jax.device_put(jnp.asarray(valid.reshape(-1)), NamedSharding(mesh, P(axis))),
        None,
    )
    return DeviceTable(out_cols, n_shards * max_rows)
