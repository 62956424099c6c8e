"""Nested-inclusive roundtrip fuzz: random schemas mixing list/struct/map
(depth <= 2) with every flat kind (incl. NaN/inf/-0.0 doubles, decimals,
timestamps), random page sizes and null densities at every level — both the
host read path and the resident layer must round-trip exactly.

Float comparisons are BIT-level (NaN-proof); nested-with-NaN falls back to
a NaN-aware python compare.  A 40-iteration sweep of this generator ran
clean before it was added here (the only "failures" were arrow's
NaN != NaN equality semantics, not data bugs).
"""

import math

import numpy as np
import pyarrow as pa
import pytest

from strawboat_tpu.api import read_table, write_file
from strawboat_tpu.codecs import WriteOptions

from test_resident import _float_bits_equal, interp_pallas  # noqa: F401


def _rand_col(rng, depth=0):
    kinds = ["i64", "i32", "f64", "f32", "str", "bool", "ts", "dec"]
    if depth < 2:
        kinds += ["list", "struct"] * 2 + ["map"]
    kind = rng.choice(kinds)
    if kind == "list":
        ftype, gen = _rand_col(rng, depth + 1)

        def g(m):
            lens = rng.integers(0, 4, m)
            return pa.array(
                [
                    None if rng.random() < 0.1 else gen(int(k)).to_pylist()
                    for k in lens
                ],
                pa.list_(ftype),
            )

        return pa.list_(ftype), g
    if kind == "struct":
        nf = int(rng.integers(1, 3))
        subs = [_rand_col(rng, depth + 1) for _ in range(nf)]
        st = pa.struct(
            [pa.field(f"f{i}", t) for i, (t, _g) in enumerate(subs)]
        )

        def g(m):
            fields = [sg(m) for _t, sg in subs]
            mask = pa.array(rng.random(m) < 0.1)
            return pa.StructArray.from_arrays(
                fields, fields=list(st), mask=mask
            )

        return st, g
    if kind == "map":
        mt = pa.map_(pa.string(), pa.int64())

        def g(m):
            out = []
            for _ in range(m):
                if rng.random() < 0.1:
                    out.append(None)
                else:
                    k = int(rng.integers(0, 4))
                    out.append(
                        [(f"k{j}", int(rng.integers(0, 100))) for j in range(k)]
                    )
            return pa.array(out, mt)

        return mt, g
    if kind == "i64":
        return pa.int64(), lambda m: pa.array(
            rng.integers(-(10**12), 10**12, m)
        )
    if kind == "i32":
        return pa.int32(), lambda m: pa.array(
            rng.integers(0, 1 << 20, m).astype(np.int32)
        )
    if kind == "f64":

        def g(m):
            v = rng.uniform(-100, 100, m)
            sp = rng.integers(0, 8, m)
            v[sp == 0] = np.nan
            v[sp == 1] = np.inf
            v[sp == 2] = -0.0
            return pa.array(v)

        return pa.float64(), g
    if kind == "f32":
        return pa.float32(), lambda m: pa.array(
            rng.standard_normal(m).astype(np.float32)
        )
    if kind == "str":
        words = np.array(["", "a", "bb", "ccc", "dddd", "lorem-ipsum"])
        return pa.string(), lambda m: pa.array(words[rng.integers(0, 6, m)])
    if kind == "bool":
        return pa.bool_(), lambda m: pa.array(rng.random(m) < 0.5)
    if kind == "ts":
        return pa.timestamp("us"), lambda m: pa.array(
            rng.integers(10**15, 2 * 10**15, m), pa.int64()
        ).cast(pa.timestamp("us"))
    import decimal

    return pa.decimal128(12, 2), lambda m: pa.array(
        [
            decimal.Decimal(int(x)) / 100
            for x in rng.integers(-(10**9), 10**9, m)
        ],
        pa.decimal128(12, 2),
    )


def _nan_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_nan_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(_nan_eq(a[k], b[k]) for k in a)
    return a == b


def _cols_equal(e, gt):
    if gt.type != e.type:
        try:
            gt = gt.cast(e.type)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            return False
    if pa.types.is_floating(e.type):
        return _float_bits_equal(e, gt)
    if gt.equals(e):
        return True
    return _nan_eq(e.to_pylist(), gt.to_pylist())


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_nested_fuzz_roundtrip(tmp_path, interp_pallas, seed):  # noqa: F811
    from strawboat_tpu.exec.resident import load_resident

    rng = np.random.default_rng(9000 + seed)
    n = int(rng.integers(200, 3000))
    ncols = int(rng.integers(1, 5))
    cols, fields = {}, []
    for ci in range(ncols):
        t, g = _rand_col(rng)
        name = f"c{ci}"
        arr = g(n)
        if not pa.types.is_nested(t) and rng.random() < 0.4:
            mask = rng.random(n) < 0.2
            arr = pa.array(arr.to_pylist(), t, mask=mask)
        fields.append(pa.field(name, t, nullable=True))
        cols[name] = arr
    table = pa.table(cols, schema=pa.schema(fields))
    p = str(tmp_path / "nf.str")
    write_file(
        p,
        table,
        options=WriteOptions(
            max_page_size=int(rng.choice([128, 512, 65536]))
        ),
    )
    back = read_table(p)
    for f in table.schema:
        e = table.column(f.name).combine_chunks()
        gt = back.column(f.name).combine_chunks()
        assert _cols_equal(e, gt), f"read_table col {f.name} seed {seed}"
    rt = load_resident(p, tile=512)
    rb = rt.to_arrow()
    for f in table.schema:
        e = table.column(f.name).combine_chunks()
        gt = rb.column(f.name).combine_chunks()
        assert _cols_equal(e, gt), f"resident col {f.name} seed {seed}"
