"""Tiny expression DSL for predicates/projections over DeviceTable.

Builds jnp computations (validity-aware three-valued logic collapsed to
"null = filtered out"), so whole predicates fuse under one jit with the
decode + aggregate stages.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp


_OP_NAMES = {
    "greater": "gt",
    "greater_equal": "ge",
    "less": "lt",
    "less_equal": "le",
    "equal": "eq",
    "not_equal": "ne",
}


@dataclass(frozen=True)
class Expr:
    # evaluate → (values, validity|None)
    fn: Callable[[Any], Tuple[jax.Array, Optional[jax.Array]]]
    # prunable conjunctive atoms (column-vs-literal comparisons); only sound
    # under AND composition — OR/NOT clear them
    atoms: tuple = ()
    # column names this expression reads (projection pushdown); sound under
    # every composition — refs only ever accumulate
    refs: tuple = ()

    def _bin(self, other: "Expr", op) -> "Expr":
        other_e = _as_expr(other)

        def f(t):
            va, ma = self.fn(t)
            vb, mb = other_e.fn(t)
            m = _and_mask(ma, mb)
            return op(va, vb), m

        atoms = ()
        opname = _OP_NAMES.get(getattr(op, "__name__", ""), None)
        if (
            opname
            and isinstance(self, ColExpr)
            and not isinstance(other, Expr)
            and isinstance(other, (int, float))
        ):
            from .pruning import Comparison

            # literal stays exact: an int64 above 2^53 must not round through
            # float, else an eq/ge atom can prune a page that actually matches
            atoms = (Comparison(self.name, opname, other),)
        if op is jnp.logical_and:
            atoms = self.atoms + other_e.atoms
        return Expr(f, atoms, self.refs + other_e.refs)

    def __gt__(self, o):
        return self._bin(o, jnp.greater)

    def __ge__(self, o):
        return self._bin(o, jnp.greater_equal)

    def __lt__(self, o):
        return self._bin(o, jnp.less)

    def __le__(self, o):
        return self._bin(o, jnp.less_equal)

    def __eq__(self, o):  # type: ignore[override]
        return self._bin(o, jnp.equal)

    def __ne__(self, o):  # type: ignore[override]
        return self._bin(o, jnp.not_equal)

    def __add__(self, o):
        return self._bin(o, jnp.add)

    def __radd__(self, o):
        return _as_expr(o)._bin(self, jnp.add)

    def __sub__(self, o):
        return self._bin(o, jnp.subtract)

    def __rsub__(self, o):
        return _as_expr(o)._bin(self, jnp.subtract)

    def __mul__(self, o):
        return self._bin(o, jnp.multiply)

    def __rmul__(self, o):
        return _as_expr(o)._bin(self, jnp.multiply)

    def __truediv__(self, o):
        return self._bin(o, jnp.divide)

    def __rtruediv__(self, o):
        return _as_expr(o)._bin(self, jnp.divide)

    def __and__(self, o):
        return self._bin(o, jnp.logical_and)

    def __or__(self, o):
        return self._bin(o, jnp.logical_or)

    def __invert__(self):
        def f(t):
            v, m = self.fn(t)
            return jnp.logical_not(v), m

        return Expr(f, refs=self.refs)

    def is_null(self) -> "Expr":
        def f(t):
            _, m = self.fn(t)
            if m is None:
                v, _ = self.fn(t)
                return jnp.zeros(v.shape, dtype=jnp.bool_), None
            return jnp.logical_not(m), None

        return Expr(f, refs=self.refs)

    def evaluate(self, table) -> jax.Array:
        v, _ = self.fn(table)
        return v

    def mask(self, table) -> jax.Array:
        """Predicate → boolean selection mask (nulls excluded)."""
        v, m = self.fn(table)
        v = v.astype(jnp.bool_)
        return v if m is None else jnp.logical_and(v, m)


def _and_mask(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return jnp.logical_and(a, b)


def _as_expr(x) -> Expr:
    if isinstance(x, Expr):
        return x
    return lit(x)


def col(name: str) -> Expr:
    def f(t):
        c = t[name]
        return c.values, c.validity

    return ColExpr(f, refs=(name,), name=name)


@dataclass(frozen=True)
class ColExpr(Expr):
    """Column reference; translates string literals through the column's
    device dictionary (codes) for eq/ne comparisons."""

    name: str = ""

    def _str_cmp(self, literal, negate: bool) -> "Expr":
        def f(t):
            c = t[self.name]
            lit_val = literal.encode() if isinstance(literal, str) else literal
            code = -1
            if c.dictionary is not None:
                import pyarrow as pa

                # C++ linear probe of the (small) dictionary — no Python loop
                found = c.dictionary.cast(pa.large_binary()).index(lit_val).as_py()
                code = -1 if found is None else int(found)
            eq = jnp.equal(c.values, jnp.int32(code))
            if code < 0:
                eq = jnp.zeros(c.values.shape, dtype=jnp.bool_)
            return (jnp.logical_not(eq) if negate else eq), c.validity

        return Expr(f, refs=(self.name,))

    def __eq__(self, o):  # type: ignore[override]
        if isinstance(o, (str, bytes)):
            return self._str_cmp(o, negate=False)
        return super().__eq__(o)

    def __ne__(self, o):  # type: ignore[override]
        if isinstance(o, (str, bytes)):
            return self._str_cmp(o, negate=True)
        return super().__ne__(o)

    def _str_range(self, literal, op: str) -> "Expr":
        """Lexical <,<=,>,>= against a string literal on a dictionary-coded
        column: codes remap through the dictionary's sorted rank (host
        argsort of the small dictionary), and the literal becomes a rank
        threshold via searchsorted — no per-row string work."""

        def f(t):
            import numpy as np
            import pyarrow as pa
            import pyarrow.compute as pc

            c = t[self.name]
            if c.dictionary is None:
                raise NotImplementedError(
                    f"string comparison on non-dictionary column {self.name!r}"
                )
            lit_val = literal.encode() if isinstance(literal, str) else literal
            d = c.dictionary.cast(pa.large_binary())
            order = pc.sort_indices(d).to_numpy(zero_copy_only=False)
            rank = np.empty(len(d), dtype=np.int32)
            rank[order] = np.arange(len(d), dtype=np.int32)
            sorted_vals = [d[int(i)].as_py() for i in order]
            import bisect

            lo = bisect.bisect_left(sorted_vals, lit_val)
            hi = bisect.bisect_right(sorted_vals, lit_val)
            r = jnp.asarray(rank)[jnp.clip(c.values, 0, len(rank) - 1)]
            if op == "lt":
                m = r < lo
            elif op == "le":
                m = r < hi
            elif op == "gt":
                m = r >= hi
            else:  # ge
                m = r >= lo
            return m, c.validity

        return Expr(f, refs=(self.name,))

    def __lt__(self, o):
        if isinstance(o, (str, bytes)):
            return self._str_range(o, "lt")
        return super().__lt__(o)

    def __le__(self, o):
        if isinstance(o, (str, bytes)):
            return self._str_range(o, "le")
        return super().__le__(o)

    def __gt__(self, o):
        if isinstance(o, (str, bytes)):
            return self._str_range(o, "gt")
        return super().__gt__(o)

    def __ge__(self, o):
        if isinstance(o, (str, bytes)):
            return self._str_range(o, "ge")
        return super().__ge__(o)

    def isin(self, values) -> "Expr":
        def f(t):
            c = t[self.name]
            if c.dictionary is not None:
                import numpy as np
                import pyarrow as pa
                import pyarrow.compute as pc

                lits = [
                    v.encode() if isinstance(v, str) else v for v in values
                ]
                # vectorized dict membership (C++), then one device isin
                hit = pc.is_in(
                    c.dictionary.cast(pa.large_binary()),
                    value_set=pa.array(lits, pa.large_binary()),
                )
                codes = np.flatnonzero(
                    hit.to_numpy(zero_copy_only=False)
                ).astype(np.int32)
                if codes.size == 0:
                    return jnp.zeros(c.values.shape, dtype=jnp.bool_), c.validity
                return jnp.isin(c.values, jnp.asarray(codes)), c.validity
            m = jnp.zeros(c.values.shape, dtype=jnp.bool_)
            for v in values:
                m = jnp.logical_or(m, c.values == v)
            return m, c.validity

        return Expr(f, refs=(self.name,))


def lit(value) -> Expr:
    def f(t):
        return jnp.asarray(value), None

    return Expr(f)
