"""Footer/meta parsing and the page iterator.

Mirrors reference src/read/reader.rs:
- ``read_meta``: seek(end-12) → meta_size, then the meta block (reader.rs:168-178)
- ``infer_schema``: seek(end-16) → schema_size + meta_size → schema bytes
  (reader.rs:227-241)
- ``read_meta_async`` pre-reads a 64 KiB tail to cut object-store round trips
  (reader.rs:33, 180-225); here exposed as an asyncio coroutine over any
  object with async ``read_at(offset, length)`` or sync file handles.
- ``NativeReader``: iterator of raw pages ``(num_values, bytes)`` whose
  ``nth``/``skip_page`` seek past skipped pages — the page-pruning primitive.
"""

from __future__ import annotations

import io
import os
from typing import BinaryIO, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from ..errors import OutOfSpecError
from ..meta import ColumnMeta, PageMeta, deserialize_metas
from ..schema import deserialize_schema
from ..schema import is_primitive as _is_primitive  # re-export parity

DEFAULT_FOOTER_SIZE = 64 * 1024

is_primitive = _is_primitive


def read_meta(reader: BinaryIO) -> List[ColumnMeta]:
    reader.seek(-12, os.SEEK_END)
    meta_size = int.from_bytes(reader.read(4), "little")
    reader.seek(-16 - meta_size, os.SEEK_END)
    return deserialize_metas(reader.read(meta_size))


def infer_schema(reader: BinaryIO) -> pa.Schema:
    reader.seek(-16, os.SEEK_END)
    schema_size = int.from_bytes(reader.read(4), "little")
    meta_size = int.from_bytes(reader.read(4), "little")
    reader.seek(-meta_size - schema_size - 8, os.SEEK_CUR)
    return deserialize_schema(reader.read(schema_size))


async def read_meta_async(
    reader, total_len: Optional[int] = None
) -> List[ColumnMeta]:
    """Async footer read with 64 KiB tail pre-read (reader.rs:180-225).

    ``reader`` must provide ``async read_at(offset, length) -> bytes`` and,
    when ``total_len`` is None, ``async size() -> int``.
    """
    if total_len is None:
        total_len = await reader.size()
    pre = min(total_len, DEFAULT_FOOTER_SIZE)
    tail = await reader.read_at(total_len - pre, pre)
    meta_size = int.from_bytes(tail[-12:-8], "little")
    footer_size = meta_size + 16
    if footer_size <= pre:
        return deserialize_metas(tail[-16 - meta_size : -16])
    buf = await reader.read_at(total_len - footer_size, footer_size)
    return deserialize_metas(buf[: meta_size])


async def infer_schema_async(reader, total_len: Optional[int] = None) -> pa.Schema:
    if total_len is None:
        total_len = await reader.size()
    tail = await reader.read_at(max(total_len - DEFAULT_FOOTER_SIZE, 0), min(total_len, DEFAULT_FOOTER_SIZE))
    schema_size = int.from_bytes(tail[-16:-12], "little")
    meta_size = int.from_bytes(tail[-12:-8], "little")
    need = schema_size + meta_size + 16
    if need > len(tail):
        tail = await reader.read_at(total_len - need, need)
    start = len(tail) - 16 - meta_size - schema_size
    return deserialize_schema(tail[start : start + schema_size])


class NativeReader:
    """Iterator of raw pages (num_values, bytes) for one leaf column.

    ``nth(n)``/``skip_page`` seek without reading — page skipping
    (reader.rs:91-116, 135-147).
    """

    def __init__(self, page_reader: BinaryIO, page_metas: List[PageMeta]):
        self.page_reader = page_reader
        self.page_metas = page_metas
        self.current_page = 0

    def has_next(self) -> bool:
        return self.current_page < len(self.page_metas)

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[int, np.ndarray]:
        if self.current_page == len(self.page_metas):
            raise StopIteration
        meta = self.page_metas[self.current_page]
        buf = self.page_reader.read(meta.length)
        if len(buf) != meta.length:
            raise OutOfSpecError("page truncated on read")
        self.current_page += 1
        return meta.num_values, np.frombuffer(buf, dtype=np.uint8)

    def nth(self, n: int) -> Tuple[int, np.ndarray]:
        """Skip ``n`` pages by seeking, then read the next one."""
        length = 0
        i = 0
        while i < n and self.current_page < len(self.page_metas):
            length += self.page_metas[self.current_page].length
            self.current_page += 1
            i += 1
        if i < n:
            raise StopIteration
        if length:
            self.page_reader.seek(length, os.SEEK_CUR)
        return next(self)

    def skip_page(self) -> None:
        if self.current_page == len(self.page_metas):
            return
        self.page_reader.seek(self.page_metas[self.current_page].length, os.SEEK_CUR)
        self.current_page += 1


def open_readers(path: str, metas: List[ColumnMeta]) -> List[NativeReader]:
    """One positioned NativeReader per leaf column (own file handle each)."""
    readers = []
    for meta in metas:
        f = open(path, "rb")
        f.seek(meta.offset)
        readers.append(NativeReader(f, list(meta.pages)))
    return readers


class SubsetNativeReader(NativeReader):
    """NativeReader over an explicit page subset: seeks to each kept page's
    absolute file offset before reading — the page-grid analogue of ``nth``'s
    seek-skip (reader.rs:91-116) for non-contiguous pruned reads."""

    def __init__(
        self, page_reader: BinaryIO, page_metas: List[PageMeta], page_offsets: List[int]
    ):
        super().__init__(page_reader, page_metas)
        self.page_offsets = page_offsets

    def __next__(self) -> Tuple[int, np.ndarray]:
        if self.current_page == len(self.page_metas):
            raise StopIteration
        self.page_reader.seek(self.page_offsets[self.current_page])
        return super().__next__()


def open_readers_subset(
    path: str, metas: List[ColumnMeta], keep
) -> List[NativeReader]:
    """Per-leaf readers restricted to the kept page-grid indices.

    ``keep`` is a boolean mask over the row-aligned page grid (same grid for
    every leaf of a nested column); pages outside the mask are never read.
    """
    readers = []
    for meta in metas:
        offs: List[int] = []
        pages: List[PageMeta] = []
        pos = meta.offset
        for i, pm in enumerate(meta.pages):
            if i >= len(keep) or keep[i]:
                offs.append(pos)
                pages.append(pm)
            pos += pm.length
        f = open(path, "rb")
        readers.append(SubsetNativeReader(f, pages, offs))
    return readers


def reader_from_bytes(data: bytes, meta: ColumnMeta) -> NativeReader:
    f = io.BytesIO(data)
    f.seek(meta.offset)
    return NativeReader(f, list(meta.pages))
