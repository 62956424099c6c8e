"""Batch reads: all pages of a column in one call.

Mirrors reference src/read/batch_read.rs (``batch_read_array``): simple
columns decode every page into one growing buffer (no per-page arrays);
nested columns decode per page then concatenate the assembled arrays.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from ..columns import (
    BinaryColumn,
    BooleanColumn,
    Column,
    NullColumn,
    PrimitiveColumn,
    from_arrow,
)
from ..columns import _np_storage_dtype
from ..schema import is_primitive
from .deserialize import (
    _leaf_dtypes,
    assemble_column,
    decode_leaf_values,
    decode_nested_leaf_page,
    field_inits,
)
from .levels import read_validity
from .reader import NativeReader


def batch_read_column(readers: List[NativeReader], field: pa.Field) -> Column:
    """Read every page of one (possibly nested) column (batch_read.rs:190-209)."""
    if is_primitive(field.type):
        return _read_simple(readers[0], field)
    inits = field_inits(field)
    leaf_dtypes = _leaf_dtypes(field)
    page_columns: List[Column] = []
    while all(r.has_next() for r in readers):
        leaves = []
        for r, init, ldt in zip(readers, inits, leaf_dtypes):
            num_values, buf = next(r)
            leaves.append(decode_nested_leaf_page(ldt, init, int(num_values), buf))
        page_columns.append(assemble_column(field, leaves))
    if len(page_columns) == 1:
        return page_columns[0]
    if not page_columns:
        return from_arrow(pa.array([], type=field.type))
    combined = pa.concat_arrays([c.to_arrow() for c in page_columns])
    return from_arrow(combined)


def _read_simple(reader: NativeReader, field: pa.Field) -> Column:
    dtype = field.type
    nullable = field.nullable and not pa.types.is_null(dtype)
    validities = []
    values_parts: List[Column] = []
    total = 0
    for num_values, buf in reader:
        num_values = int(num_values)
        pos = 0
        if nullable:
            v, pos = read_validity(buf, pos, num_values)
            validities.append(
                v if v is not None else np.ones(num_values, dtype=bool)
            )
        col, _ = decode_leaf_values(dtype, buf, pos, num_values)
        values_parts.append(col)
        total += num_values
    validity = np.concatenate(validities) if validities else None
    if validity is not None and validity.all():
        validity = validity  # keep: logical equality unaffected
    if not values_parts:
        return _empty_column(field)
    first = values_parts[0]
    if isinstance(first, NullColumn):
        return NullColumn(dtype, None, total)
    if isinstance(first, PrimitiveColumn):
        vals = np.concatenate([c.values for c in values_parts])
        return PrimitiveColumn(dtype, validity, vals)
    if isinstance(first, BooleanColumn):
        vals = np.concatenate([c.values for c in values_parts])
        return BooleanColumn(dtype, validity, vals)
    if isinstance(first, BinaryColumn):
        # concatenate offsets with running rebase (array/binary.rs:240-286)
        odt = first.offsets.dtype
        offs = [np.asarray(values_parts[0].offsets)]
        vals = [values_parts[0].values]
        for c in values_parts[1:]:
            last = offs[-1][-1]
            offs.append(np.asarray(c.offsets[1:]) + last)
            vals.append(c.values)
        return BinaryColumn(
            dtype,
            validity,
            np.concatenate(offs).astype(odt),
            np.concatenate(vals),
        )
    raise TypeError(f"unexpected leaf column {type(first)}")


def _empty_column(field: pa.Field) -> Column:
    dtype = field.type
    if pa.types.is_null(dtype):
        return NullColumn(dtype, None, 0)
    if pa.types.is_boolean(dtype):
        return BooleanColumn(dtype, None, np.empty(0, dtype=bool))
    if (
        pa.types.is_string(dtype)
        or pa.types.is_binary(dtype)
        or pa.types.is_large_string(dtype)
        or pa.types.is_large_binary(dtype)
    ):
        odt = np.int64 if (pa.types.is_large_string(dtype) or pa.types.is_large_binary(dtype)) else np.int32
        return BinaryColumn(dtype, None, np.zeros(1, dtype=odt), np.empty(0, np.uint8))
    if pa.types.is_decimal(dtype):
        return PrimitiveColumn(
            dtype, None, np.empty((0, dtype.bit_width // 8), dtype=np.uint8)
        )
    return PrimitiveColumn(dtype, None, np.empty(0, dtype=_np_storage_dtype(dtype)))
