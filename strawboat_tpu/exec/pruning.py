"""Zone maps: per-page min/max/null stats + predicate pruning.

The reference exposes page *skipping* primitives (``ColumnMeta::slice``,
``Iterator::nth`` seeks, src/lib.rs:46-65, reader.rs:91-116) and leaves stats
to the engine above (Databend).  Here the writer can emit a zone-map sidecar
(``<file>.zm.json``) and the scanner prunes page ranges whose [min, max]
cannot satisfy a conjunctive predicate — pages are row-aligned across columns
(same ``max_page_size`` grid), so a pruned page drops for every column.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa


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


def zones_path(path: str) -> str:
    return path + ".zm.json"


def write_zones(path: str, zones: Dict[str, ColumnZones]) -> None:
    doc = {
        name: [
            {"min": p.min, "max": p.max, "nulls": p.null_count, "n": p.num_values}
            for p in cz.pages
        ]
        for name, cz in zones.items()
    }
    with open(zones_path(path), "w") as f:
        json.dump(doc, f)


def read_zones(path: str) -> Optional[Dict[str, ColumnZones]]:
    zp = zones_path(path)
    if not os.path.exists(zp):
        return None
    with open(zp) as f:
        doc = json.load(f)
    return {
        name: ColumnZones(
            name,
            [PageZone(p["min"], p["max"], p["nulls"], p["n"]) for p in pages],
        )
        for name, pages in doc.items()
    }


# ---------------------------------------------------------------------------
# conjunctive predicate pruning


@dataclass(frozen=True)
class Comparison:
    """column <op> literal — the prunable predicate atoms."""

    column: str
    op: str  # gt ge lt le eq ne
    value: float

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


def prune_pages(
    zones: Dict[str, ColumnZones], predicates: Sequence[Comparison], n_pages: int
) -> np.ndarray:
    """Boolean keep-mask over the row-aligned page grid."""
    keep = np.ones(n_pages, dtype=bool)
    for pred in predicates:
        cz = zones.get(pred.column)
        if cz is None or len(cz.pages) != n_pages:
            continue
        for i, z in enumerate(cz.pages):
            if keep[i] and not pred.page_may_match(z):
                keep[i] = False
    return keep
