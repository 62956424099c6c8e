"""Page serialization: simple vs nested layouts.

Mirrors reference src/write/serialize.rs:
- simple nullable prelude: ``[u32 def_levels_len][def levels]`` (serialize.rs:200-215)
- nested prelude: ``[u32 rows][u32 rep_len][u32 def_len][rep][def]``
  (serialize.rs:217-232)
- leaf dispatch: primitive → integer/double family, utf8 rewrapped as binary,
  boolean → bitmap (serialize.rs:52-133)
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from ..codecs import (
    WriteOptions,
    compress_binary,
    compress_boolean,
    compress_double,
    compress_integer,
)
from ..columns import (
    BinaryColumn,
    BooleanColumn,
    Column,
    NullColumn,
    PrimitiveColumn,
)
from ..errors import NotYetImplementedError
from ..util.hybrid_rle import encode_levels, encode_validity_bitpacked, get_bit_width
from .nested import Nest, cum_sums, write_levels


def write_page(nests: List[Nest], leaf: Column, options: WriteOptions):
    """Serialize one page → (bytes, num_values).

    ``num_values`` is rows for simple pages, level-record count for nested
    pages (arrow2 ``num_values``; recorded into PageMeta at common.rs:104-108).
    """
    if len(nests) == 1:
        return write_simple(leaf, nests[0], options), nests[0].length
    return write_nested_page(nests, leaf, options)


def write_simple(leaf: Column, nest: Nest, options: WriteOptions) -> bytes:
    out = bytearray()
    if isinstance(leaf, NullColumn):
        return b""
    if nest.nullable:
        out += _validity_prelude(leaf.validity, len(leaf))
    out += _write_leaf_values(leaf, options)
    return bytes(out)


def write_nested_page(nests: List[Nest], leaf: Column, options: WriteOptions):
    rep, deff, leaf_elems = write_levels(nests)
    # the page stores exactly the traversal-visited leaf slots; slots under
    # null ancestors are dropped (the reader's level expansion re-inserts the
    # structure without them)
    if len(leaf_elems) != len(leaf) or (
        len(leaf_elems) and (np.diff(leaf_elems) != 1).any()
    ):
        leaf = _take_leaf(leaf, leaf_elems)
    cum_sum, cum_rep = cum_sums(nests)
    rep_bytes = encode_levels(rep, get_bit_width(int(cum_rep[-1])))
    def_bytes = encode_levels(deff, get_bit_width(int(cum_sum[-1])))
    out = bytearray()
    out += np.uint32(nests[0].length).tobytes()
    out += np.uint32(len(rep_bytes)).tobytes()
    out += np.uint32(len(def_bytes)).tobytes()
    out += rep_bytes
    out += def_bytes
    if not isinstance(leaf, NullColumn):
        out += _write_leaf_values(leaf, options)
    return bytes(out), len(rep)


def _take_leaf(leaf: Column, elems: np.ndarray) -> Column:
    """Gather leaf slots by index (null-ancestor compaction)."""
    from ..columns import from_arrow

    if len(elems) == 0:
        return leaf.slice(0, 0)
    if len(elems) and elems[0] >= 0 and (np.diff(elems) == 1).all():
        return leaf.slice(int(elems[0]), len(elems))
    return from_arrow(leaf.to_arrow().take(elems))


def _validity_prelude(validity, length: int) -> bytes:
    """[u32 def_levels_len][bit-packed def levels]; absent validity → len 0."""
    if validity is None:
        return np.uint32(0).tobytes()
    body = encode_validity_bitpacked(validity)
    return np.uint32(len(body)).tobytes() + body


def _write_leaf_values(leaf: Column, options: WriteOptions) -> bytes:
    if isinstance(leaf, BooleanColumn):
        return compress_boolean(leaf.values, leaf.validity, options)
    if isinstance(leaf, BinaryColumn):
        return compress_binary(leaf.offsets, leaf.values, leaf.validity, options)
    if isinstance(leaf, PrimitiveColumn):
        if leaf.values.ndim == 2:  # decimal128/256 byte matrix
            from ..codecs.decimal import compress_decimal

            return compress_decimal(
                leaf.values, leaf.validity, options, leaf.values.shape[1]
            )
        if leaf.values.dtype.kind == "f":
            return compress_double(leaf.values, leaf.validity, options)
        return compress_integer(leaf.values, leaf.validity, options)
    raise NotYetImplementedError(f"leaf writer for {type(leaf)}")
