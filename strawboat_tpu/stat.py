"""Page introspection: parse page headers without decoding values.

Mirrors reference src/stat.rs:26-172 (``stat_simple`` / ``stat_body``):
per-page codec tree (Dict indices sub-page, Freq exception sub-page, sizes),
used for storage-level statistics, debugging, and pruning decisions.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import pyarrow as pa

from .constants import Compression
from .read.reader import NativeReader


@dataclass
class FreqPageBody:
    exceptions: Optional["PageInfo"]
    exceptions_bitmap_size: int


@dataclass
class DictPageBody:
    indices: "PageInfo"
    unique_num: int


@dataclass
class PageBody:
    kind: str  # dict|freq|one_value|rle|patas|bitpack|delta_bitpack|common
    common: Optional[Compression] = None
    dict: Optional[DictPageBody] = None
    freq: Optional[FreqPageBody] = None


@dataclass
class PageInfo:
    validity_size: Optional[int]
    compressed_size: int
    uncompressed_size: int
    body: PageBody


@dataclass
class ColumnInfo:
    field: pa.Field
    pages: List[PageInfo]


def _u32(buf, pos) -> int:
    return int.from_bytes(bytes(buf[pos : pos + 4]), "little")


def _u64(buf, pos) -> int:
    return int.from_bytes(bytes(buf[pos : pos + 8]), "little")


def stat_simple(reader: NativeReader, field: pa.Field) -> ColumnInfo:
    """Parse all pages of a simple (single-leaf) column (stat.rs:63-84)."""
    pages = []
    for _num_values, buf in reader:
        pos = 0
        validity_size = None
        if field.nullable:
            # (the reference re-reads the next u32 after skipping the
            # validity block, stat.rs:72-77 — we report the actual size)
            validity_size = _u32(buf, pos)
            pos += 4 + validity_size
        page, _ = stat_body(buf, pos, validity_size, field.type)
        pages.append(page)
    return ColumnInfo(field, pages)


def stat_body(
    buf, pos: int, validity_size: Optional[int], dtype: pa.DataType
):
    codec = Compression.from_codec(int(buf[pos]))
    compressed_size = _u32(buf, pos + 1)
    uncompressed_size = _u32(buf, pos + 5)
    pos += 9
    if codec == Compression.RLE:
        body = PageBody("rle")
    elif codec == Compression.DICT:
        body = _stat_dict_body(buf, pos, dtype)
    elif codec == Compression.ONE_VALUE:
        body = PageBody("one_value")
    elif codec == Compression.FREQ:
        body = _stat_freq_body(buf, pos, dtype)
    elif codec == Compression.BITPACKING:
        body = PageBody("bitpack")
    elif codec == Compression.DELTA_BITPACKING:
        body = PageBody("delta_bitpack")
    elif codec == Compression.PATAS:
        body = PageBody("patas")
    else:
        body = PageBody("common", common=codec)
    pos += compressed_size
    return (
        PageInfo(validity_size, compressed_size, uncompressed_size, body),
        pos,
    )


def _primitive_size(dtype: pa.DataType) -> int:
    return dtype.bit_width // 8


def _stat_freq_body(buf, pos: int, dtype: pa.DataType) -> PageBody:
    if (
        pa.types.is_string(dtype)
        or pa.types.is_binary(dtype)
        or pa.types.is_large_string(dtype)
        or pa.types.is_large_binary(dtype)
    ):
        ln = _u64(buf, pos)
        pos += 8 + ln
        bitmap_size = _u32(buf, pos)
        return PageBody("freq", freq=FreqPageBody(None, bitmap_size))
    pos += _primitive_size(dtype)
    bitmap_size = _u32(buf, pos)
    pos += 4 + bitmap_size
    exceptions, _ = stat_body(buf, pos, None, dtype)
    return PageBody("freq", freq=FreqPageBody(exceptions, bitmap_size))


def _stat_dict_body(buf, pos: int, dtype: pa.DataType) -> PageBody:
    # indices are a u32 page regardless of the leaf type
    indices, pos = stat_body(buf, pos, None, pa.uint32())
    unique_num = _u32(buf, pos)
    return PageBody("dict", dict=DictPageBody(indices, unique_num))
