"""Fused query API: scan → (pruned) decode → filter → aggregate in one call.

The pipeline composes the planner-driven device scan with the jitted
filter/aggregate stages; zone-map pruning atoms are extracted automatically
from conjunctive predicate expressions (``Expr.atoms``).

    res = (Query("/data/lineitem.str")
           .filter((col("l_shipdate") >= 731) & (col("l_shipdate") < 1096))
           .group_by("l_returnflag")
           .agg(revenue=("sum", "l_extendedprice"))
           .run())
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from .aggregate import hash_aggregate, scalar_aggregate
from .expr import Expr
from .scan import DeviceTable, scan_file


@dataclass
class Query:
    path: str
    _columns: Optional[List[str]] = None
    _filter: Optional[Expr] = None
    _keys: List[str] = field(default_factory=list)
    _aggs: Dict[str, Tuple[str, str]] = field(default_factory=dict)
    _num_groups: int = 65536

    def select(self, *columns: str) -> "Query":
        self._columns = list(columns)
        return self

    def filter(self, predicate: Expr) -> "Query":
        self._filter = (
            predicate if self._filter is None else (self._filter & predicate)
        )
        return self

    def group_by(self, *keys: str, num_groups: int = 65536) -> "Query":
        self._keys = list(keys)
        self._num_groups = num_groups
        return self

    def agg(self, **aggs: Tuple[str, str]) -> "Query":
        self._aggs.update(aggs)
        return self

    # -- execution ------------------------------------------------------

    def scan(self) -> DeviceTable:
        predicates = list(self._filter.atoms) if self._filter is not None else None
        cols = self._referenced_columns()
        return scan_file(self.path, columns=cols, predicates=predicates)

    def run(self):
        table = self.scan()
        mask = self._filter.mask(table) if self._filter is not None else None
        if self._keys:
            return hash_aggregate(
                table,
                keys=self._keys,
                aggs=self._aggs,
                num_groups=self._num_groups,
                mask=mask,
            )
        if self._aggs:
            return {
                name: scalar_aggregate(table[c].values, mask, fn)
                for name, (fn, c) in self._aggs.items()
            }
        # projection query: return the table + selection mask
        return table, mask

    def _referenced_columns(self) -> Optional[List[str]]:
        if self._columns is not None:
            return self._columns
        if not self._keys and not self._aggs:
            return None
        # scan everything a filter might touch: without expression column
        # tracking for arbitrary exprs, read all columns when filtered
        if self._filter is not None:
            return None
        cols = set(self._keys)
        for fn, c in self._aggs.values():
            cols.add(c)
        return sorted(cols)
