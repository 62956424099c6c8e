"""NativeWriter: the file writer state machine.

Mirrors reference src/write/writer.rs:33-200 + common.rs:49-117:
  start()  → "ARROW2" magic + 2 pad bytes
  write()  → one chunk (single implicit row group); per leaf column, pages of
             ``max_page_size`` rows each, adaptively compressed
  finish() → schema bytes, meta block, [u32 schema_size][u32 meta_size], EOS
"""

from __future__ import annotations

from typing import BinaryIO, List, Sequence, Union

import numpy as np
import pyarrow as pa

from ..codecs import WriteOptions
from ..columns import Chunk, Column, from_arrow
from ..constants import ARROW_MAGIC, CONTINUATION_MARKER
from ..errors import OutOfSpecError
from ..meta import ColumnMeta, PageMeta, serialize_metas
from ..schema import schema_to_bytes
from .nested import slice_nested, to_nested
from .serialize import write_page

_STATE_NONE, _STATE_STARTED, _STATE_WRITTEN, _STATE_FINISHED = range(4)


class NativeWriter:
    def __init__(
        self,
        writer: BinaryIO,
        schema: pa.Schema,
        options: WriteOptions = None,
        n_threads: int = 1,
    ):
        self.writer = writer
        self.schema = schema
        self.options = options or WriteOptions()
        # >1 or 0(auto) enables a page thread pool; default stays sequential
        # (GIL-bound python dominates small pages — opt in for large binary pages)
        self.n_threads = n_threads
        self.metas: List[ColumnMeta] = []
        self._zones = {}
        self._offset = 0
        self._state = _STATE_NONE

    # -- io helpers -----------------------------------------------------
    def _write(self, data: bytes) -> None:
        self.writer.write(data)
        self._offset += len(data)

    @property
    def offset(self) -> int:
        return self._offset

    def total_size(self) -> int:
        return self._offset

    # -- lifecycle ------------------------------------------------------
    def start(self) -> None:
        if self._state != _STATE_NONE:
            raise OutOfSpecError("The strawboat file can only be started once")
        self._write(ARROW_MAGIC)
        self._write(b"\x00\x00")
        self._state = _STATE_STARTED

    def write(self, chunk: Union[Chunk, pa.RecordBatch, pa.Table]) -> None:
        if self._state == _STATE_WRITTEN:
            raise OutOfSpecError(
                "The strawboat file can only accept one RowGroup in a single file"
            )
        if self._state != _STATE_STARTED:
            raise OutOfSpecError(
                "The strawboat file must be started before it can be written to"
            )
        columns = _as_columns(chunk, self.schema)
        if len(columns) != len(self.schema):
            raise OutOfSpecError("chunk arity does not match schema")
        self._encode_chunk(columns)
        self._state = _STATE_WRITTEN

    @property
    def zones(self):
        return self._zones

    def _encode_chunk(self, columns: Sequence[Column]) -> None:
        n_rows = len(columns[0]) if columns else 0
        page_size = min(self.options.max_page_size or n_rows, n_rows)
        jobs = []  # (field, nests, leaf, [(off, ln), ...])
        for col, field in zip(columns, self.schema):
            for nests, leaf in to_nested(col, field):
                length = len(col)
                step = max(page_size, 1)
                spans = [
                    (off, min(step, length - off)) for off in range(0, length, step)
                ]
                jobs.append((field, nests, leaf, spans))

        def encode_one(nests, leaf, off, ln):
            s_nests, s_leaf = slice_nested(nests, leaf, off, ln)
            body, num_values = write_page(s_nests, s_leaf, self.options)
            zone = None
            if (
                self.options.zone_maps
                and len(s_nests) == 1
                and hasattr(s_leaf, "values")
                and getattr(s_leaf.values, "dtype", None) is not None
                and s_leaf.values.dtype.kind in "iuf"
                # decimals store a 2-D byte matrix: byte-level min/max would
                # be garbage bounds that can mis-prune — skip (no zone)
                and getattr(s_leaf.values, "ndim", 1) == 1
                # binary/utf8 leaves carry a u8 BYTE buffer (+ offsets):
                # byte-level min/max is not a row bound — skip (no zone);
                # string pruning goes through dictionary lexical ranges
                and getattr(s_leaf, "offsets", None) is None
                # values must be row-aligned with the page (nulls can
                # compact other layouts)
                and len(s_leaf.values) == ln
            ):
                from ..exec.pruning import PageZone, compute_zones

                mn, mx, nulls = compute_zones(s_leaf.values, s_leaf.validity)
                zone = PageZone(mn, mx, nulls, ln)
            return body, num_values, zone

        total_pages = sum(len(spans) for _f, _n, _l, spans in jobs)
        results = {}
        if self.n_threads != 1 and total_pages > 4:
            import concurrent.futures as cf
            import os as _os

            workers = self.n_threads or min(_os.cpu_count() or 4, 16)
            with cf.ThreadPoolExecutor(max_workers=workers) as pool:
                futs = {}
                for ji, (_f, nests, leaf, spans) in enumerate(jobs):
                    for pi, (off, ln) in enumerate(spans):
                        futs[(ji, pi)] = pool.submit(encode_one, nests, leaf, off, ln)
                for key, fut in futs.items():
                    results[key] = fut.result()
        else:
            for ji, (_f, nests, leaf, spans) in enumerate(jobs):
                for pi, (off, ln) in enumerate(spans):
                    results[(ji, pi)] = encode_one(nests, leaf, off, ln)

        for ji, (field, nests, leaf, spans) in enumerate(jobs):
            start = self._offset
            pages: List[PageMeta] = []
            zone_pages = []
            for pi in range(len(spans)):
                body, num_values, zone = results[(ji, pi)]
                page_start = self._offset
                self._write(body)
                pages.append(PageMeta(self._offset - page_start, num_values))
                if zone is not None:
                    zone_pages.append(zone)
            self.metas.append(ColumnMeta(start, pages))
            if self.options.zone_maps and zone_pages:
                from ..exec.pruning import ColumnZones

                self._zones[field.name] = ColumnZones(field.name, zone_pages)

    def finish(self) -> None:
        if self._state != _STATE_WRITTEN:
            raise OutOfSpecError(
                "The strawboat file must be written before it can be finished"
            )
        if self._zones:
            # in-band zone block, invisible to footer-only readers (the
            # schema/meta/sizes/EOS tail is byte-identical with or without it)
            from ..exec.pruning import zone_trailer

            self._write(zone_trailer(self._zones))
        schema_bytes = schema_to_bytes(self.schema)
        self._write(schema_bytes)
        meta_start = self._offset
        self._write(serialize_metas(self.metas))
        meta_end = self._offset
        self._write(np.uint32(len(schema_bytes)).tobytes())
        self._write(np.uint32(meta_end - meta_start).tobytes())
        # EOS continuation (write_continuation(0), common.rs:121-128)
        self._write(CONTINUATION_MARKER)
        self._write((0).to_bytes(4, "little"))
        self.writer.flush()
        self._state = _STATE_FINISHED


def _as_columns(chunk, schema: pa.Schema) -> List[Column]:
    if isinstance(chunk, Chunk):
        return chunk.columns
    if isinstance(chunk, pa.Table):
        chunk = chunk.combine_chunks()
        return [from_arrow(chunk.column(i).chunk(0)) for i in range(chunk.num_columns)]
    if isinstance(chunk, pa.RecordBatch):
        return [from_arrow(chunk.column(i)) for i in range(chunk.num_columns)]
    if isinstance(chunk, (list, tuple)):
        return [c if isinstance(c, Column) else from_arrow(c) for c in chunk]
    raise OutOfSpecError(f"unsupported chunk type {type(chunk)}")


def write_file(
    path_or_file,
    data: Union[pa.RecordBatch, pa.Table, Chunk],
    schema: pa.Schema = None,
    options: WriteOptions = None,
) -> List[ColumnMeta]:
    """Convenience one-shot writer (examples/strawboat_write.rs equivalent)."""
    if schema is None:
        schema = data.schema
    own = isinstance(path_or_file, str)
    f = open(path_or_file, "wb") if own else path_or_file
    try:
        w = NativeWriter(f, schema, options)
        w.start()
        w.write(data)
        w.finish()  # zone maps ride in-band (zone_trailer) when enabled
        return w.metas
    finally:
        if own:
            f.close()
