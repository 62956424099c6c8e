"""Host in-memory column model (numpy buffers, Arrow semantics).

This is the build's replacement for the reference's arrow2 array model
(PrimitiveArray / BinaryArray / BooleanArray / ListArray / StructArray /
MapArray, see SURVEY §1).  Data lives in plain numpy arrays so it can be
fed straight to jax device buffers; pyarrow is used only at the interop
boundary (``to_arrow`` / ``from_arrow``) and for logical-type bookkeeping.

Offsets are *rebased* (start at 0) when converting from sliced arrow arrays,
matching the page-local representation the format stores
(reference src/compression/binary/mod.rs:44-57).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import pyarrow as pa

from .util.bits import pack_bitmap, unpack_bitmap

__all__ = [
    "Column",
    "NullColumn",
    "PrimitiveColumn",
    "BooleanColumn",
    "BinaryColumn",
    "ListColumn",
    "FixedSizeListColumn",
    "StructColumn",
    "MapColumn",
    "Chunk",
    "from_arrow",
    "column_equal",
]


@dataclass
class Column:
    dtype: pa.DataType
    validity: Optional[np.ndarray]  # bool array or None

    def __len__(self) -> int:  # pragma: no cover - overridden
        raise NotImplementedError

    @property
    def null_count(self) -> int:
        if self.validity is None:
            return 0
        return int(len(self.validity) - np.count_nonzero(self.validity))

    def to_arrow(self) -> pa.Array:  # pragma: no cover - overridden
        raise NotImplementedError

    def slice(self, offset: int, length: int) -> "Column":  # pragma: no cover
        raise NotImplementedError

    def _sliced_validity(self, offset: int, length: int) -> Optional[np.ndarray]:
        if self.validity is None:
            return None
        return self.validity[offset : offset + length]


def _validity_buffer(validity: Optional[np.ndarray]) -> Optional[pa.Buffer]:
    if validity is None:
        return None
    return pa.py_buffer(pack_bitmap(validity))


@dataclass
class NullColumn(Column):
    length: int = 0

    def __len__(self) -> int:
        return self.length

    @property
    def null_count(self) -> int:
        return self.length

    def to_arrow(self) -> pa.Array:
        return pa.nulls(self.length)

    def slice(self, offset: int, length: int) -> "NullColumn":
        return NullColumn(self.dtype, None, length)


@dataclass
class PrimitiveColumn(Column):
    values: np.ndarray = field(default_factory=lambda: np.empty(0))

    def __len__(self) -> int:
        return len(self.values)

    def to_arrow(self) -> pa.Array:
        return pa.Array.from_buffers(
            self.dtype,
            len(self.values),
            [_validity_buffer(self.validity), pa.py_buffer(self.values.tobytes())],
        )

    def slice(self, offset: int, length: int) -> "PrimitiveColumn":
        return PrimitiveColumn(
            self.dtype,
            self._sliced_validity(offset, length),
            self.values[offset : offset + length],
        )


@dataclass
class BooleanColumn(Column):
    values: np.ndarray = field(default_factory=lambda: np.empty(0, dtype=bool))

    def __len__(self) -> int:
        return len(self.values)

    def to_arrow(self) -> pa.Array:
        return pa.Array.from_buffers(
            pa.bool_(),
            len(self.values),
            [_validity_buffer(self.validity), pa.py_buffer(pack_bitmap(self.values))],
        )

    def slice(self, offset: int, length: int) -> "BooleanColumn":
        return BooleanColumn(
            self.dtype,
            self._sliced_validity(offset, length),
            self.values[offset : offset + length],
        )


@dataclass
class BinaryColumn(Column):
    """Variable-length bytes / utf8; offsets are int32 or int64, start at 0."""

    offsets: np.ndarray = field(default_factory=lambda: np.zeros(1, dtype=np.int64))
    values: np.ndarray = field(default_factory=lambda: np.empty(0, dtype=np.uint8))

    def __len__(self) -> int:
        return len(self.offsets) - 1

    @property
    def large(self) -> bool:
        return self.offsets.dtype == np.int64 and (
            pa.types.is_large_binary(self.dtype) or pa.types.is_large_string(self.dtype)
        )

    def to_arrow(self) -> pa.Array:
        offs = self.offsets
        vals = self.values
        if offs[0] != 0:
            vals = vals[offs[0] : offs[-1]]
            offs = offs - offs[0]
        return pa.Array.from_buffers(
            self.dtype,
            len(offs) - 1,
            [
                _validity_buffer(self.validity),
                pa.py_buffer(offs.tobytes()),
                pa.py_buffer(vals.tobytes()),
            ],
        )

    def value(self, i: int) -> bytes:
        return self.values[self.offsets[i] : self.offsets[i + 1]].tobytes()

    def slice(self, offset: int, length: int) -> "BinaryColumn":
        return BinaryColumn(
            self.dtype,
            self._sliced_validity(offset, length),
            self.offsets[offset : offset + length + 1],
            self.values,
        )

    def rebased(self) -> "BinaryColumn":
        """Copy with offsets starting at 0 and values sliced to the window."""
        offs = self.offsets
        if len(offs) == 0 or offs[0] == 0:
            return self
        vals = self.values[offs[0] : offs[-1]]
        return BinaryColumn(self.dtype, self.validity, offs - offs[0], vals)


@dataclass
class ListColumn(Column):
    offsets: np.ndarray = field(default_factory=lambda: np.zeros(1, dtype=np.int32))
    child: Optional[Column] = None

    def __len__(self) -> int:
        return len(self.offsets) - 1

    def to_arrow(self) -> pa.Array:
        offs = self.offsets
        child = self.child
        if offs[0] != 0:
            child = child.slice(int(offs[0]), int(offs[-1] - offs[0]))
            offs = offs - offs[0]
        return pa.Array.from_buffers(
            self.dtype,
            len(offs) - 1,
            [_validity_buffer(self.validity), pa.py_buffer(offs.tobytes())],
            children=[child.to_arrow()],
        )

    def slice(self, offset: int, length: int) -> "ListColumn":
        return ListColumn(
            self.dtype,
            self._sliced_validity(offset, length),
            self.offsets[offset : offset + length + 1],
            self.child,
        )


@dataclass
class FixedSizeListColumn(Column):
    size: int = 0
    child: Optional[Column] = None
    length: int = 0

    def __len__(self) -> int:
        return self.length

    def to_arrow(self) -> pa.Array:
        return pa.Array.from_buffers(
            self.dtype,
            self.length,
            [_validity_buffer(self.validity)],
            children=[self.child.to_arrow()],
        )

    def slice(self, offset: int, length: int) -> "FixedSizeListColumn":
        return FixedSizeListColumn(
            self.dtype,
            self._sliced_validity(offset, length),
            self.size,
            self.child.slice(offset * self.size, length * self.size),
            length,
        )


@dataclass
class StructColumn(Column):
    children: List[Column] = field(default_factory=list)
    length: int = 0

    def __len__(self) -> int:
        return self.length

    def to_arrow(self) -> pa.Array:
        return pa.Array.from_buffers(
            self.dtype,
            self.length,
            [_validity_buffer(self.validity)],
            children=[c.to_arrow() for c in self.children],
        )

    def slice(self, offset: int, length: int) -> "StructColumn":
        return StructColumn(
            self.dtype,
            self._sliced_validity(offset, length),
            [c.slice(offset, length) for c in self.children],
            length,
        )


@dataclass
class MapColumn(Column):
    offsets: np.ndarray = field(default_factory=lambda: np.zeros(1, dtype=np.int32))
    keys: Optional[Column] = None
    items: Optional[Column] = None

    def __len__(self) -> int:
        return len(self.offsets) - 1

    def to_arrow(self) -> pa.Array:
        offs = self.offsets
        keys, items = self.keys, self.items
        if offs[0] != 0:
            keys = keys.slice(int(offs[0]), int(offs[-1] - offs[0]))
            items = items.slice(int(offs[0]), int(offs[-1] - offs[0]))
            offs = offs - offs[0]
        entries_type = pa.struct(
            [self.dtype.key_field.with_name("key"), self.dtype.item_field.with_name("value")]
        )
        entries = pa.Array.from_buffers(
            entries_type,
            int(offs[-1]),
            [None],
            children=[keys.to_arrow(), items.to_arrow()],
        )
        return pa.Array.from_buffers(
            self.dtype,
            len(offs) - 1,
            [_validity_buffer(self.validity), pa.py_buffer(offs.tobytes())],
            children=[entries],
        )

    def slice(self, offset: int, length: int) -> "MapColumn":
        return MapColumn(
            self.dtype,
            self._sliced_validity(offset, length),
            self.offsets[offset : offset + length + 1],
            self.keys,
            self.items,
        )


@dataclass
class Chunk:
    """A set of equal-length columns (reference: arrow2 ``Chunk``)."""

    columns: List[Column]

    def __len__(self) -> int:
        return len(self.columns[0]) if self.columns else 0

    def to_arrow(self, schema: pa.Schema) -> pa.RecordBatch:
        return pa.RecordBatch.from_arrays(
            [c.to_arrow() for c in self.columns], schema=schema
        )


def _arrow_validity(arr: pa.Array) -> Optional[np.ndarray]:
    if arr.null_count == 0 and arr.buffers()[0] is None:
        return None
    buf = arr.buffers()[0]
    if buf is None:
        return None
    bits = unpack_bitmap(
        np.frombuffer(buf, dtype=np.uint8), arr.offset + len(arr)
    )
    return bits[arr.offset : arr.offset + len(arr)].copy()


def from_arrow(arr: pa.Array) -> Column:
    """Convert a pyarrow array (possibly sliced) into the numpy column model."""
    dtype = arr.type
    if pa.types.is_null(dtype):
        return NullColumn(dtype, None, len(arr))
    if pa.types.is_boolean(dtype):
        data = arr.buffers()[1]
        bits = unpack_bitmap(np.frombuffer(data, dtype=np.uint8), arr.offset + len(arr))
        return BooleanColumn(
            dtype, _arrow_validity(arr), bits[arr.offset : arr.offset + len(arr)].copy()
        )
    if pa.types.is_string(dtype) or pa.types.is_binary(dtype):
        off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        vals = (
            np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            if arr.buffers()[2] is not None
            else np.empty(0, dtype=np.uint8)
        )
        col = BinaryColumn(dtype, _arrow_validity(arr), off.copy(), vals)
        return col.rebased()
    if pa.types.is_large_string(dtype) or pa.types.is_large_binary(dtype):
        off = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        vals = (
            np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            if arr.buffers()[2] is not None
            else np.empty(0, dtype=np.uint8)
        )
        col = BinaryColumn(dtype, _arrow_validity(arr), off.copy(), vals)
        return col.rebased()
    if pa.types.is_list(dtype) or pa.types.is_large_list(dtype):
        odt = np.int64 if pa.types.is_large_list(dtype) else np.int32
        off = np.frombuffer(arr.buffers()[1], dtype=odt)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        child = from_arrow(arr.values)  # arr.values is already unsliced child
        return ListColumn(dtype, _arrow_validity(arr), off.copy(), child)
    if pa.types.is_fixed_size_list(dtype):
        size = dtype.list_size
        child_full = from_arrow(arr.values)
        child = child_full.slice(arr.offset * size, len(arr) * size)
        return FixedSizeListColumn(
            dtype, _arrow_validity(arr), size, child, len(arr)
        )
    if pa.types.is_struct(dtype):
        children = [from_arrow(arr.field(i)) for i in range(dtype.num_fields)]
        return StructColumn(dtype, _arrow_validity(arr), children, len(arr))
    if pa.types.is_map(dtype):
        off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        keys = from_arrow(arr.keys)
        items = from_arrow(arr.items)
        return MapColumn(dtype, _arrow_validity(arr), off.copy(), keys, items)
    if pa.types.is_decimal(dtype):
        # i128/i256: (n, W) little-endian byte matrix (arrow buffer layout)
        width = dtype.bit_width // 8
        raw = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
        vals = raw[arr.offset * width : (arr.offset + len(arr)) * width]
        return PrimitiveColumn(
            dtype, _arrow_validity(arr), vals.reshape(len(arr), width).copy()
        )
    # primitive numeric / temporal: store as the raw storage integer/float.
    # Zero-copy view into the arrow buffer (numpy holds the buffer ref);
    # columns are read-only downstream, and a copy of a large column costs a
    # first-touch page-fault storm on small-vCPU hosts
    np_dtype = _np_storage_dtype(dtype)
    width = dtype.bit_width // 8
    raw = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
    vals = raw[(arr.offset) * width : (arr.offset + len(arr)) * width].view(np_dtype)
    return PrimitiveColumn(dtype, _arrow_validity(arr), vals)


def _np_storage_dtype(dtype: pa.DataType) -> np.dtype:
    """numpy storage dtype for an arrow primitive type (temporal → int)."""
    if (
        pa.types.is_integer(dtype)
        or pa.types.is_floating(dtype)
        or pa.types.is_float16(dtype)
    ):
        return np.dtype(dtype.to_pandas_dtype())
    width = dtype.bit_width
    if pa.types.is_decimal(dtype):
        raise NotImplementedError(f"decimal type {dtype} not supported yet")
    if width in (8, 16, 32, 64):
        return np.dtype(f"<i{width // 8}")
    raise NotImplementedError(f"unsupported type {dtype}")


def column_equal(a: Column, b: Column) -> bool:
    """Logical equality via arrow (mirrors arrow2 ``assert_eq!(chunk, result)``)."""
    return a.to_arrow().equals(b.to_arrow())
