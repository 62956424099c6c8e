"""Zone maps: per-page min/max/null stats + predicate pruning.

The reference exposes page *skipping* primitives (``ColumnMeta::slice``,
``Iterator::nth`` seeks, src/lib.rs:46-65, reader.rs:91-116) and leaves stats
to the engine above (Databend).  Here the writer embeds an IN-BAND zone
block in the file — between the page data and the schema bytes, terminated
by ``[u32 payload_len][u32 ZONE_MAGIC]`` right at the schema start — so a
footer-only reader (including one implementing just the reference layout)
parses the file unchanged, while zone-aware scans prune page ranges whose
[min, max] cannot satisfy a conjunctive predicate.  Pages are row-aligned
across columns (same ``max_page_size`` grid), so a pruned page drops for
every column.  Values serialize at full width (i64/u64/f64 by column kind),
never through lossy f64-of-int conversion.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

ZONE_MAGIC = 0x314D4E5A  # b"ZNM1" little-endian


@dataclass
class PageZone:
    min: Optional[float]
    max: Optional[float]
    null_count: int
    num_values: int


@dataclass
class ColumnZones:
    name: str
    pages: List[PageZone]
    # 'i' | 'u' | 'f' — native width of min/max (set on read; derived on
    # write).  Pruning compares in this width, never through lossy f64-of-int.
    kind: Optional[str] = None


def compute_zones(
    values: np.ndarray, validity: Optional[np.ndarray]
) -> Tuple[Optional[float], Optional[float], int]:
    if validity is not None:
        nulls = int(len(validity) - np.count_nonzero(validity))
        vals = values[validity]
    else:
        nulls = 0
        vals = values
    if len(vals) == 0:
        return None, None, nulls
    return _py(vals.min()), _py(vals.max()), nulls


def _py(v):
    if isinstance(v, (np.floating, float)):
        return float(v)
    return int(v)


def _column_kind(cz: ColumnZones) -> str:
    """'i' | 'u' | 'f' — the 8-byte representation for min/max."""
    if cz.kind in ("i", "u", "f"):
        return cz.kind
    for p in cz.pages:
        if p.min is None:
            continue
        if isinstance(p.min, float) or isinstance(p.max, float):
            return "f"
        if p.min < 0 or p.max < 0:
            return "i"
        if p.max > np.iinfo(np.int64).max:
            return "u"
    return "i"


def serialize_zones(zones: Dict[str, ColumnZones]) -> bytes:
    """In-band zone payload.

    u32 n_columns, then per column: u16 name_len, name utf8, u8 kind,
    u32 n_pages, then per page: u8 has_stats, 8B min, 8B max, u32 nulls,
    u32 num_values.
    """
    out = bytearray()
    out += struct.pack("<I", len(zones))
    for name, cz in zones.items():
        nb = name.encode()
        kind = _column_kind(cz)
        out += struct.pack("<H", len(nb)) + nb
        out += kind.encode()
        out += struct.pack("<I", len(cz.pages))
        fmt = {"i": "<q", "u": "<Q", "f": "<d"}[kind]
        for p in cz.pages:
            has = p.min is not None
            out += struct.pack("<B", 1 if has else 0)
            out += struct.pack(fmt, (p.min if has else 0))
            out += struct.pack(fmt, (p.max if has else 0))
            out += struct.pack("<II", p.null_count, p.num_values)
    return bytes(out)


def deserialize_zones(payload: bytes) -> Dict[str, ColumnZones]:
    pos = 0
    (n_cols,) = struct.unpack_from("<I", payload, pos)
    pos += 4
    zones: Dict[str, ColumnZones] = {}
    for _ in range(n_cols):
        (nlen,) = struct.unpack_from("<H", payload, pos)
        pos += 2
        name = payload[pos : pos + nlen].decode()
        pos += nlen
        kind = payload[pos : pos + 1].decode()
        pos += 1
        if kind not in ("i", "u", "f"):
            raise ValueError("bad zone column kind")
        (n_pages,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        fmt = {"i": "<q", "u": "<Q", "f": "<d"}[kind]
        pages = []
        for _p in range(n_pages):
            (has,) = struct.unpack_from("<B", payload, pos)
            pos += 1
            (mn,) = struct.unpack_from(fmt, payload, pos)
            pos += 8
            (mx,) = struct.unpack_from(fmt, payload, pos)
            pos += 8
            nulls, n = struct.unpack_from("<II", payload, pos)
            pos += 8
            pages.append(
                PageZone(mn if has else None, mx if has else None, nulls, n)
            )
        zones[name] = ColumnZones(name, pages, kind)
    if pos != len(payload):
        raise ValueError("trailing zone bytes")
    return zones


def zone_trailer(zones: Dict[str, ColumnZones]) -> bytes:
    """payload + [u32 len][u32 ZONE_MAGIC]; written just before the schema."""
    payload = serialize_zones(zones)
    return payload + struct.pack("<II", len(payload), ZONE_MAGIC)


def read_zones(path: str) -> Optional[Dict[str, ColumnZones]]:
    """Locate and parse the in-band zone block (returns None if absent)."""
    size = os.path.getsize(path)
    if size < 32:
        return None
    with open(path, "rb") as f:
        f.seek(size - 16)
        schema_size, meta_size = struct.unpack("<II", f.read(8))
        schema_start = size - 16 - meta_size - schema_size
        if schema_start < 16:
            return None
        f.seek(schema_start - 8)
        plen, magic = struct.unpack("<II", f.read(8))
        if magic != ZONE_MAGIC or plen > schema_start - 16:
            return None
        f.seek(schema_start - 8 - plen)
        payload = f.read(plen)
    try:
        return deserialize_zones(payload)
    except (ValueError, struct.error, UnicodeDecodeError):
        return None  # magic collision with page bytes — not a zone block


# ---------------------------------------------------------------------------
# conjunctive predicate pruning


@dataclass(frozen=True)
class Comparison:
    """column <op> literal — the prunable predicate atoms.

    ``value`` keeps the caller's type: a Python int literal is compared
    exactly (never rounded through float — an i64 above 2^53 would otherwise
    let an eq/ge atom prune a page that matches)."""

    column: str
    op: str  # gt ge lt le eq ne
    value: "float | int"

    def page_may_match(self, z: PageZone) -> bool:
        if z.min is None:  # all-null page
            return False
        lo, hi, v = z.min, z.max, self.value
        if self.op == "gt":
            return hi > v
        if self.op == "ge":
            return hi >= v
        if self.op == "lt":
            return lo < v
        if self.op == "le":
            return lo <= v
        if self.op == "eq":
            return lo <= v <= hi
        if self.op == "ne":
            return not (lo == hi == v)
        return True


def _prune_float_vs_int(
    lo: np.ndarray, hi: np.ndarray, op: str, v: float, n_pages: int
) -> np.ndarray:
    """May-match mask for a float literal over integer zone bounds, computed
    with exact integer arithmetic (``math.floor`` of a finite float is an
    exact Python int; int64/uint64-vs-python-int comparisons are exact in
    numpy ≥ 1.25)."""
    import math

    all_ = np.ones(n_pages, dtype=bool)
    none = np.zeros(n_pages, dtype=bool)
    if math.isnan(v):
        # x <op> NaN is false for every row; ne is true for every row
        return all_ if op == "ne" else none
    if math.isinf(v):
        pos = v > 0
        if op == "gt":
            return none if pos else all_
        if op == "ge":
            return none if pos else all_
        if op == "lt":
            return all_ if pos else none
        if op == "le":
            return all_ if pos else none
        if op == "eq":
            return none
        return all_  # ne
    fv = math.floor(v)
    is_int = v == fv
    if op == "gt":
        return hi >= fv + 1
    if op == "ge":
        return hi >= (fv if is_int else fv + 1)
    if op == "lt":
        return lo <= (fv - 1 if is_int else fv)
    if op == "le":
        return lo <= fv
    if op == "eq":
        return ((lo <= fv) & (fv <= hi)) if is_int else none
    if op == "ne":
        return ~((lo == fv) & (hi == fv)) if is_int else all_
    return all_


def prune_pages(
    zones: Dict[str, ColumnZones], predicates: Sequence[Comparison], n_pages: int
) -> np.ndarray:
    """Boolean keep-mask over the row-aligned page grid (vectorized)."""
    keep = np.ones(n_pages, dtype=bool)
    for pred in predicates:
        cz = zones.get(pred.column)
        if cz is None or len(cz.pages) != n_pages:
            continue
        has = np.array([p.min is not None for p in cz.pages])
        # build min/max at the column's native width: np.array() of mixed
        # -magnitude python ints silently promotes to float64, which is lossy
        # above 2^53 — exactly the rounding this module promises not to do
        zdt = {"i": np.int64, "u": np.uint64, "f": np.float64}[_column_kind(cz)]
        lo = np.array(
            [p.min if p.min is not None else 0 for p in cz.pages], dtype=zdt
        )
        hi = np.array(
            [p.max if p.max is not None else 0 for p in cz.pages], dtype=zdt
        )
        v = pred.value
        op = pred.op
        if zdt is not np.float64 and isinstance(v, float):
            # float literal against an integer zone: translate to an exact
            # integer bound (int64 promoted to float64 rounds above 2^53)
            may = _prune_float_vs_int(lo, hi, op, v, n_pages)
            keep &= may & has
            continue
        if op == "gt":
            may = hi > v
        elif op == "ge":
            may = hi >= v
        elif op == "lt":
            may = lo < v
        elif op == "le":
            may = lo <= v
        elif op == "eq":
            may = (lo <= v) & (v <= hi)
        elif op == "ne":
            may = ~((lo == v) & (hi == v))
        else:
            may = np.ones(n_pages, dtype=bool)
        keep &= may & has
    return keep
