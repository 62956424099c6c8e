"""Schema model, Arrow-IPC schema bytes, and parquet-style leaf descriptors.

The schema type is ``pyarrow.Schema`` (the in-memory array model of the
reference is arrow2; here pyarrow supplies only schema/interop — all column
data lives in numpy / jax buffers).

- ``schema_to_bytes`` / ``deserialize_schema`` mirror the reference's use of
  arrow2 ``schema_to_bytes`` / ``deserialize_schema`` (src/write/writer.rs:137,
  src/read/reader.rs:227-241).  We write the *bare* flatbuffers Message (no
  stream continuation prefix), which is what arrow2 emits.
- ``leaf_descriptors`` computes per-leaf max repetition/definition levels with
  standard parquet semantics — the role parquet2's ``ColumnDescriptor`` plays
  in the reference (src/read/read_basic.rs:65-84).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import pyarrow as pa

from .constants import CONTINUATION_MARKER
from .errors import OutOfSpecError


def schema_to_bytes(schema: pa.Schema) -> bytes:
    """Serialize a schema to a bare flatbuffers IPC Message (arrow2-style)."""
    buf = schema.serialize().to_pybytes()
    # pyarrow emits the encapsulated stream form:
    #   [0xFFFFFFFF][i32 metadata_size][flatbuffer ... padded]
    # arrow2's schema_to_bytes is the bare flatbuffer; strip the 8-byte prefix.
    if buf[:4] == CONTINUATION_MARKER:
        return buf[8:]
    return buf


def deserialize_schema(buf: bytes) -> pa.Schema:
    """Parse schema bytes written either bare (arrow2) or encapsulated."""
    if buf[:4] != CONTINUATION_MARKER:
        size = len(buf)
        buf = CONTINUATION_MARKER + size.to_bytes(4, "little") + buf
    try:
        return pa.ipc.read_schema(pa.BufferReader(buf))
    except pa.ArrowInvalid as e:
        raise OutOfSpecError(f"invalid schema bytes: {e}") from e


def is_primitive(dtype: pa.DataType) -> bool:
    """Whether a column is a single-leaf (non-nested) column.

    Mirrors reference ``is_primitive`` (src/read/reader.rs:35-48).
    """
    return not (
        pa.types.is_list(dtype)
        or pa.types.is_large_list(dtype)
        or pa.types.is_fixed_size_list(dtype)
        or pa.types.is_struct(dtype)
        or pa.types.is_map(dtype)
        or pa.types.is_union(dtype)
    )


def n_leaf_columns(dtype: pa.DataType) -> int:
    """Number of leaf columns a field decomposes into (arrow2 ``n_columns``)."""
    if pa.types.is_struct(dtype):
        return sum(n_leaf_columns(f.type) for f in dtype)
    if (
        pa.types.is_list(dtype)
        or pa.types.is_large_list(dtype)
        or pa.types.is_fixed_size_list(dtype)
    ):
        return n_leaf_columns(dtype.value_type)
    if pa.types.is_map(dtype):
        return n_leaf_columns(dtype.key_type) + n_leaf_columns(dtype.item_type)
    return 1


@dataclass(frozen=True)
class LeafDescriptor:
    """Parquet-style descriptor for one leaf column.

    The reference gets these from parquet2 ``ColumnDescriptor.descriptor``
    (max_rep_level / max_def_level used at src/read/read_basic.rs:76-77).
    """

    path: Tuple[str, ...]
    dtype: pa.DataType  # the leaf (primitive) arrow type
    max_def_level: int
    max_rep_level: int
    # True when the leaf value column itself may contain nulls
    leaf_nullable: bool


def leaf_descriptors(field: pa.Field) -> List[LeafDescriptor]:
    """Compute leaf descriptors for one top-level field.

    Level rules (parquet): an optional level adds 1 definition level; a
    repeated level (list/map/fixed-size-list element) adds 1 repetition level
    and 1 definition level.
    """
    out: List[LeafDescriptor] = []

    def walk(f: pa.Field, path: Tuple[str, ...], max_def: int, max_rep: int) -> None:
        dtype = f.type
        nullable = bool(f.nullable)
        path = path + (f.name,)
        if pa.types.is_struct(dtype):
            d = max_def + (1 if nullable else 0)
            for child in dtype:
                walk(child, path, d, max_rep)
        elif pa.types.is_list(dtype) or pa.types.is_large_list(dtype):
            d = max_def + (1 if nullable else 0) + 1
            walk(dtype.value_field, path + ("list",), d, max_rep + 1)
        elif pa.types.is_fixed_size_list(dtype):
            d = max_def + (1 if nullable else 0) + 1
            walk(dtype.value_field, path + ("list",), d, max_rep + 1)
        elif pa.types.is_map(dtype):
            d = max_def + (1 if nullable else 0) + 1
            entries = path + ("entries",)
            key_field = pa.field("key", dtype.key_type, nullable=False)
            walk(key_field, entries, d, max_rep + 1)
            walk(dtype.item_field.with_name("value"), entries, d, max_rep + 1)
        else:
            d = max_def + (1 if nullable else 0)
            out.append(
                LeafDescriptor(
                    path=path,
                    dtype=dtype,
                    max_def_level=d,
                    max_rep_level=max_rep,
                    leaf_nullable=nullable,
                )
            )

    walk(field, (), 0, 0)
    return out


def schema_leaf_descriptors(schema: pa.Schema) -> List[List[LeafDescriptor]]:
    """Per top-level field, its list of leaf descriptors."""
    return [leaf_descriptors(f) for f in schema]
