"""TPC-H workload tests (BASELINE config 4 shape, small scale): write
lineitem, device scan with zone-map pruning, Q6/Q1 vs numpy references."""

import numpy as np
import pytest

from strawboat_tpu.api import write_file
from strawboat_tpu.benchsuite.tpch import (
    generate_lineitem,
    q1,
    q6,
    q6_numpy_reference,
    q6_pruning_predicates,
)
from strawboat_tpu.codecs import WriteOptions
from strawboat_tpu.constants import Compression
from strawboat_tpu.exec import scan_file


@pytest.fixture(scope="module")
def lineitem_file(tmp_path_factory):
    table = generate_lineitem(scale=0.01, rows=60_000)
    path = str(tmp_path_factory.mktemp("tpch") / "lineitem.str")
    write_file(
        path,
        table,
        options=WriteOptions(
            default_compression=Compression.LZ4,
            default_compress_ratio=1.0,
            max_page_size=8192,
            sample_seed=1,
            zone_maps=True,
        ),
    )
    return path, table


def test_q6(lineitem_file):
    path, table = lineitem_file
    dt = scan_file(path)
    got = int(q6(dt))
    assert got == q6_numpy_reference(table)


def test_q6_with_pruning(lineitem_file):
    path, table = lineitem_file
    dt = scan_file(path, predicates=q6_pruning_predicates())
    # fewer rows decoded (shipdate is clustered so pruning bites)
    assert len(dt["l_shipdate"]) < table.num_rows
    got = int(q6(dt))
    assert got == q6_numpy_reference(table)


def test_q1(lineitem_file):
    path, table = lineitem_file
    dt = scan_file(path)
    res = q1(dt)
    n_groups = int(res["n_groups"])
    sd = table.column("l_shipdate").to_numpy()
    rf = table.column("l_returnflag").to_numpy()
    ls = table.column("l_linestatus").to_numpy()
    qty = table.column("l_quantity").to_numpy()
    m = sd <= (2557 - 90)
    import collections

    exp = collections.defaultdict(lambda: [0, 0])
    for f, s, q, ok in zip(rf, ls, qty, m):
        if ok:
            exp[(f, s)][0] += q
            exp[(f, s)][1] += 1
    assert n_groups == len(exp)
    total_qty = sum(v[0] for v in exp.values())
    got_total = int(np.asarray(res["sum_qty"]).sum())
    assert got_total == total_qty
    # per-group exactness on the dense-code path
    for (f, s_), (qty, cnt_) in exp.items():
        code = int(f) * 2 + int(s_)
        assert int(np.asarray(res["sum_qty"])[code]) == qty
        assert int(np.asarray(res["count_order"])[code]) == cnt_
    # sort-based path agrees
    from strawboat_tpu.benchsuite.tpch import q1_sort

    res2 = q1_sort(dt)
    assert int(np.asarray(res2["sum_qty"])[: int(res2["n_groups"])].sum()) == total_qty


def test_q3_like_join(tmp_path):
    import jax.numpy as jnp

    from strawboat_tpu.benchsuite.tpch import generate_orders, q3_like

    li = generate_lineitem(0.01, rows=40_000)
    orders = generate_orders(0.01, rows=10_000)
    lp = str(tmp_path / "li.str")
    op = str(tmp_path / "ord.str")
    opts = WriteOptions(
        default_compression=Compression.LZ4,
        default_compress_ratio=1.0,
        max_page_size=8192,
        sample_seed=2,
    )
    write_file(lp, li, options=opts)
    write_file(op, orders, options=opts)
    lt = scan_file(lp)
    ot = scan_file(op)
    uniq, n_groups, total = q3_like(lt, ot, date_cut=1000, num_groups=16)
    n_groups = int(n_groups)
    got = {
        int(k): int(t)
        for k, t in zip(
            np.asarray(uniq)[:n_groups], np.asarray(total)[:n_groups]
        )
    }
    # numpy reference
    ok = li.column("l_orderkey").to_numpy()
    ep = li.column("l_extendedprice").to_numpy()
    disc = li.column("l_discount").to_numpy()
    od = orders.column("o_orderdate").to_numpy()
    pr = orders.column("o_orderpriority").to_numpy()
    sel = od[ok] < 1000
    rev = ep * (100 - disc)
    exp = {}
    for p in np.unique(pr):
        m = sel & (pr[ok] == p)
        if m.any():
            exp[int(p)] = int(rev[m].sum())
    assert got == exp
