#!/usr/bin/env python
"""Real-chip TPC-H Q1 over a COMPRESSED-IN-HBM resident table, via the
Query DSL: utf8 group keys (sorted-dict codes), f64 measures (dict planes),
date filter — the full Q1 shape the round-3 verdict asked for ("a Q1, not
just Q6, runs resident end-to-end")."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from strawboat_tpu.api import write_file
    from strawboat_tpu.benchsuite.tpch import generate_lineitem
    from strawboat_tpu.codecs import WriteOptions
    from strawboat_tpu.constants import Compression
    from strawboat_tpu.exec import Query, col, load_resident

    n = int(os.environ.get("SB_RES_Q1_ROWS", 2_000_000))
    table = generate_lineitem(scale=1.0, rows=n)
    cols = [
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    ]
    path = "/tmp/resident_q1.str"
    write_file(
        path,
        table.select(cols),
        options=WriteOptions(
            default_compression=Compression.LZ4,
            default_compress_ratio=1.0,
            max_page_size=65536,
        ),
    )
    t0 = time.perf_counter()
    rt = load_resident(path)
    print(f"load: {time.perf_counter()-t0:.2f}s", flush=True)
    hbm = sum(
        sum(w.size * 4 for w, _b in c.planes) for c in rt.columns.values()
    )
    print(f"HBM resident: {hbm/1e6:.1f} MB packed", flush=True)
    kinds = {
        k: (c.kind, [b for _w, b in c.planes], c.is_dict)
        for k, c in rt.columns.items()
    }
    print(f"columns: {kinds}", flush=True)

    cutoff = 1095  # l_shipdate <= cutoff (day number)

    # ONE Query object: the fused resident grouped impl memoizes on it
    q = (
        Query(rt)
        .filter(col("l_shipdate") <= cutoff)
        .group_by("l_returnflag", "l_linestatus", num_groups=16)
        .agg(
            sum_qty=("sum", "l_quantity"),
            sum_base_price=("sum", "l_extendedprice"),
            sum_disc_price=(
                "sum",
                col("l_extendedprice") * (1 - col("l_discount")),
            ),
            sum_charge=(
                "sum",
                col("l_extendedprice")
                * (1 - col("l_discount"))
                * (1 + col("l_tax")),
            ),
            avg_qty=("avg", "l_quantity"),
            avg_price=("avg", "l_extendedprice"),
            avg_disc=("avg", "l_discount"),
            count_order=("count", "l_quantity"),
        )
    )

    def q1():
        return q.run()

    t0 = time.perf_counter()
    res = q1()
    print(f"Q1 first (incl. compiles): {time.perf_counter()-t0:.1f}s", flush=True)

    # exact check vs numpy
    rf = np.asarray(table.column("l_returnflag"))
    ls = np.asarray(table.column("l_linestatus"))
    sd = table.column("l_shipdate").to_numpy()
    qty = table.column("l_quantity").to_numpy()
    ep = table.column("l_extendedprice").to_numpy()
    disc = table.column("l_discount").to_numpy()
    sel = sd <= cutoff
    ng = int(res["n_groups"])
    ok = True
    for i in range(ng):
        f = res["dict_l_returnflag"][int(res["key_l_returnflag"][i])].as_py()
        s = res["dict_l_linestatus"][int(res["key_l_linestatus"][i])].as_py()
        m = sel & (rf == f) & (ls == s)
        exp_cnt = int(m.sum())
        exp_qty = float(qty[m].sum())
        got_cnt = int(res["count_order"][i])
        got_qty = float(res["sum_qty"][i])
        got_price = float(res["sum_base_price"][i])
        exp_price = float(ep[m].sum())
        if got_cnt != exp_cnt or abs(got_qty - exp_qty) > 1e-6 * max(exp_qty, 1):
            ok = False
            print(f"  MISMATCH ({f},{s}): cnt {got_cnt}/{exp_cnt} qty {got_qty}/{exp_qty}")
        if abs(got_price - exp_price) > 1e-9 * max(abs(exp_price), 1):
            ok = False
            print(f"  MISMATCH ({f},{s}): price {got_price} vs {exp_price}")
    assert ok, "resident Q1 mismatch"
    print(f"Q1 exact vs numpy: {ng} groups", flush=True)

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        q1()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        f"warm resident Q1 (full DSL, 8 aggs, utf8 keys): {best*1e3:.0f} ms "
        f"({n/best/1e6:.1f} Mrows/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
