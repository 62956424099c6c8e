"""Streaming deserialization: raw pages → typed columns.

Mirrors reference src/read/deserialize.rs (``column_iter_to_arrays``,
``deserialize_simple``, ``deserialize_nested``) and the typed page decoders of
src/read/array/*.rs: each page is decoded as [validity / rep+def prelude]
then the leaf codec body; nested columns are assembled recursively from the
per-leaf NestedStates (List/Map wrap, Struct zip — list.rs / map.rs /
struct_.rs).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from ..codecs import (
    decompress_binary,
    decompress_boolean,
    decompress_double,
    decompress_integer,
)
from ..columns import (
    BinaryColumn,
    BooleanColumn,
    Column,
    FixedSizeListColumn,
    ListColumn,
    MapColumn,
    NullColumn,
    PrimitiveColumn,
    StructColumn,
    from_arrow,
)
from ..columns import _np_storage_dtype
from ..errors import NotYetImplementedError
from ..schema import is_primitive, n_leaf_columns
from ..write.nested import LIST, PRIMITIVE, STRUCT
from .levels import (
    InitNested,
    NestedLevel,
    read_validity,
    read_validity_nested,
)
from .reader import NativeReader


def field_inits(field: pa.Field) -> List[List[InitNested]]:
    """Per leaf, the InitNested chain (deserialize.rs nested init building)."""
    out: List[List[InitNested]] = []

    def walk(f: pa.Field, parents: List[InitNested]) -> None:
        t = f.type
        nullable = bool(f.nullable)
        if pa.types.is_struct(t):
            n = parents + [InitNested(STRUCT, nullable)]
            for child in t:
                walk(child, n)
        elif pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
            n = parents + [InitNested(LIST, nullable)]
            walk(t.value_field, n)
        elif pa.types.is_map(t):
            n = parents + [InitNested(LIST, nullable), InitNested(STRUCT, False)]
            walk(pa.field("key", t.key_type, nullable=False), n)
            walk(t.item_field.with_name("value"), n)
        else:
            out.append(parents + [InitNested(PRIMITIVE, nullable)])

    walk(field, [])
    return out


def _leaf_odtype(dtype: pa.DataType) -> np.dtype:
    if pa.types.is_large_string(dtype) or pa.types.is_large_binary(dtype):
        return np.dtype(np.int64)
    return np.dtype(np.int32)


def decode_leaf_values(
    dtype: pa.DataType, buf: np.ndarray, pos: int, length: int
) -> Tuple[Column, int]:
    """Decode a leaf codec body into a (validity-less) leaf column."""
    if pa.types.is_null(dtype):
        return NullColumn(dtype, None, length), pos
    if pa.types.is_boolean(dtype):
        values, pos = decompress_boolean(buf, pos, length)
        return BooleanColumn(dtype, None, values), pos
    if (
        pa.types.is_string(dtype)
        or pa.types.is_binary(dtype)
        or pa.types.is_large_string(dtype)
        or pa.types.is_large_binary(dtype)
    ):
        odt = _leaf_odtype(dtype)
        offsets, values, pos = decompress_binary(buf, pos, length, odt)
        return BinaryColumn(dtype, None, offsets, values), pos
    if pa.types.is_decimal(dtype):
        from ..codecs.decimal import decompress_decimal

        values, pos = decompress_decimal(buf, pos, length, dtype.bit_width // 8)
        return PrimitiveColumn(dtype, None, values), pos
    np_dtype = _np_storage_dtype(dtype)
    if np_dtype.kind == "f":
        values, pos = decompress_double(buf, pos, length, np_dtype)
    else:
        values, pos = decompress_integer(buf, pos, length, np_dtype)
    return PrimitiveColumn(dtype, None, values), pos


def decode_simple_page(
    field: pa.Field, num_values: int, buf: np.ndarray
) -> Column:
    """IntegerIter::deserialize etc. (array/integer.rs:68-89)."""
    pos = 0
    validity = None
    if field.nullable and not pa.types.is_null(field.type):
        validity, pos = read_validity(buf, pos, num_values)
    col, _ = decode_leaf_values(field.type, buf, pos, num_values)
    col.validity = validity
    return col


def decode_nested_leaf_page(
    leaf_dtype: pa.DataType,
    init: List[InitNested],
    num_values: int,
    buf: np.ndarray,
) -> Tuple[List[NestedLevel], Column]:
    """IntegerNestedIter::deserialize (array/integer.rs:158-182)."""
    state, leaf_validity, _rows, pos = read_validity_nested(buf, 0, num_values, init)
    length = state.levels[-1].length
    col, _ = decode_leaf_values(leaf_dtype, buf, pos, length)
    col.validity = leaf_validity
    return state.levels, col


# ---------------------------------------------------------------------------
# nested assembly


def assemble_column(
    field: pa.Field,
    leaves: List[Tuple[List[NestedLevel], Column]],
    depth: int = 0,
) -> Column:
    t = field.type
    if is_primitive(t):
        return leaves[0][1]
    if pa.types.is_struct(t):
        level = leaves[0][0][depth]
        children = []
        i = 0
        for child in t:
            n = n_leaf_columns(child.type)
            children.append(assemble_column(child, leaves[i : i + n], depth + 1))
            i += n
        validity = _lvl_validity(level)
        return StructColumn(t, validity, children, level.length)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        level = leaves[0][0][depth]
        child = assemble_column(t.value_field, leaves, depth + 1)
        odt = np.int64 if pa.types.is_large_list(t) else np.int32
        return ListColumn(t, _lvl_validity(level), level.offsets.astype(odt), child)
    if pa.types.is_fixed_size_list(t):
        level = leaves[0][0][depth]
        child = assemble_column(t.value_field, leaves, depth + 1)
        size = t.list_size
        validity = _lvl_validity(level)
        if validity is not None and not validity.all():
            # re-insert child slots dropped at write time for null rows.
            # (pa.take with null indices corrupts map-typed children — build
            # by concatenating valid-run slices with null runs instead.)
            child_arrow = child.to_arrow()
            null_run = pa.nulls(size, type=t.value_type)
            parts = []
            src = 0
            run_valid = 0
            for v in validity:
                if v:
                    run_valid += 1
                    continue
                if run_valid:
                    parts.append(child_arrow.slice(src, run_valid * size))
                    src += run_valid * size
                    run_valid = 0
                parts.append(null_run)
            if run_valid:
                parts.append(child_arrow.slice(src, run_valid * size))
            child = from_arrow(
                pa.concat_arrays([p.combine_chunks() if hasattr(p, "combine_chunks") else p for p in parts])
                if len(parts) > 1
                else parts[0]
            )
        return FixedSizeListColumn(t, validity, size, child, level.length)
    if pa.types.is_map(t):
        level = leaves[0][0][depth]
        n_keys = n_leaf_columns(t.key_type)
        kf = pa.field("key", t.key_type, nullable=False)
        vf = t.item_field.with_name("value")
        keys = assemble_column(kf, leaves[:n_keys], depth + 2)
        items = assemble_column(vf, leaves[n_keys:], depth + 2)
        return MapColumn(
            t, _lvl_validity(level), level.offsets.astype(np.int32), keys, items
        )
    raise NotYetImplementedError(f"assembly for {t}")


def _lvl_validity(level: NestedLevel) -> Optional[np.ndarray]:
    if not level.nullable or level.validity is None:
        return None
    return np.asarray(level.validity, dtype=bool)


# ---------------------------------------------------------------------------
# per-page column iterator (column_iter_to_arrays)


def column_iter_to_arrays(
    readers: List[NativeReader], field: pa.Field
) -> Iterator[Column]:
    """Iterate pages → one assembled Column per page (deserialize.rs:237-253)."""
    inits = field_inits(field)
    leaf_dtypes = _leaf_dtypes(field)
    simple = is_primitive(field.type)
    while all(r.has_next() for r in readers):
        if simple:
            num_values, buf = next(readers[0])
            yield decode_simple_page(field, int(num_values), buf)
        else:
            leaves = []
            for r, init, ldt in zip(readers, inits, leaf_dtypes):
                num_values, buf = next(r)
                leaves.append(
                    decode_nested_leaf_page(ldt, init, int(num_values), buf)
                )
            yield assemble_column(field, leaves)


def _leaf_dtypes(field: pa.Field) -> List[pa.DataType]:
    out = []

    def walk(t: pa.DataType) -> None:
        if pa.types.is_struct(t):
            for child in t:
                walk(child.type)
        elif pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
            walk(t.value_type)
        elif pa.types.is_map(t):
            walk(t.key_type)
            walk(t.item_type)
        else:
            out.append(t)

    walk(field.type)
    return out
