"""High-level convenience API (the examples/*.rs equivalents)."""

from __future__ import annotations

from typing import Iterator, List, Optional

import pyarrow as pa

from .meta import ColumnMeta
from .read.batch_read import batch_read_column
from .read.deserialize import column_iter_to_arrays
from .read.reader import infer_schema, open_readers, read_meta
from .schema import n_leaf_columns
from .write.writer import NativeWriter, write_file  # noqa: F401


def split_metas_by_field(schema: pa.Schema, metas: List[ColumnMeta]) -> List[List[ColumnMeta]]:
    out = []
    i = 0
    for field in schema:
        n = n_leaf_columns(field.type)
        out.append(metas[i : i + n])
        i += n
    return out


def _field_readers(path: str, schema: pa.Schema, metas: List[ColumnMeta]):
    per_field = split_metas_by_field(schema, metas)
    for field, field_metas in zip(schema, per_field):
        yield field, open_readers(path, field_metas)


def read_table(path: str, columns: Optional[List[str]] = None) -> pa.Table:
    """Whole-file batch read → pyarrow Table (strawboat_batch_read.rs)."""
    with open(path, "rb") as f:
        schema = infer_schema(f)
        metas = read_meta(f)
    arrays = []
    fields = []
    for field, readers in _field_readers(path, schema, metas):
        if columns is not None and field.name not in columns:
            for r in readers:
                r.page_reader.close()
            continue
        col = batch_read_column(readers, field)
        arrays.append(col.to_arrow())
        fields.append(field)
        for r in readers:
            r.page_reader.close()
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def iter_batches(path: str) -> Iterator[pa.RecordBatch]:
    """Streaming page-wise read → RecordBatch per page (strawboat_read.rs)."""
    with open(path, "rb") as f:
        schema = infer_schema(f)
        metas = read_meta(f)
    iters = []
    all_readers = []
    for field, readers in _field_readers(path, schema, metas):
        iters.append((field, column_iter_to_arrays(readers, field)))
        all_readers.extend(readers)
    try:
        while True:
            cols = []
            for field, it in iters:
                col = next(it, None)
                if col is None:
                    return
                cols.append(col.to_arrow())
            yield pa.RecordBatch.from_arrays(cols, schema=schema)
    finally:
        for r in all_readers:
            r.page_reader.close()
