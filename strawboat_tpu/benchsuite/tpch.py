"""TPC-H lineitem workload (BASELINE configs 4-5).

A dbgen-shaped generator (seeded, correct cardinalities/distributions at the
level that matters for codec selection and pruning: dates clustered, low-
cardinality flags, skewed quantities) plus Q1/Q6 expressed on the device
engine.  Decimal columns are scaled-int64 (cents), the TPU-native layout.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

ROWS_PER_SF = 6_000_000


def generate_lineitem(scale: float, seed: int = 0, rows: Optional[int] = None) -> pa.Table:
    n = rows if rows is not None else int(ROWS_PER_SF * scale)
    rng = np.random.default_rng(seed)
    quantity = rng.integers(1, 51, n).astype(np.int64)  # 1..50
    extendedprice = (quantity * rng.integers(90000, 110001, n)).astype(np.int64)
    discount = rng.integers(0, 11, n).astype(np.int64)  # 0.00..0.10 (hundredths)
    tax = rng.integers(0, 9, n).astype(np.int64)
    # shipdate: days since 1992-01-01, clustered by order date over 7 years
    shipdate = np.sort(rng.integers(0, 2557, n)).astype(np.int32)
    jitter = rng.integers(0, 122, n).astype(np.int32)
    shipdate = shipdate + jitter
    returnflag = rng.choice(np.array([0, 1, 2], dtype=np.int64), n, p=[0.5, 0.25, 0.25])
    linestatus = (shipdate > 2190).astype(np.int64)
    orderkey = np.repeat(
        np.arange(max(n // 4, 1), dtype=np.int64), 4
    )[:n]
    suppkey = rng.integers(0, max(int(10000 * max(scale, 0.01)), 10), n).astype(np.int64)
    return pa.table(
        {
            "l_orderkey": pa.array(orderkey),
            "l_suppkey": pa.array(suppkey),
            "l_quantity": pa.array(quantity),
            "l_extendedprice": pa.array(extendedprice),
            "l_discount": pa.array(discount),
            "l_tax": pa.array(tax),
            "l_returnflag": pa.array(returnflag),
            "l_linestatus": pa.array(linestatus),
            "l_shipdate": pa.array(shipdate, type=pa.int32()),
        }
    )


def q6(table, jnp=None):
    """TPC-H Q6: revenue from discounted small shipments in 1994.

    revenue = sum(extendedprice * discount) where shipdate in [1994, 1995),
    discount in [5, 7] (hundredths), quantity < 24.
    """
    import jax.numpy as jnp

    from ..exec import col
    from ..exec.aggregate import scalar_aggregate

    d0, d1 = 731, 1096  # 1994-01-01 .. 1995-01-01 in days since 1992-01-01
    pred = (
        (col("l_shipdate") >= d0)
        & (col("l_shipdate") < d1)
        & (col("l_discount") >= 5)
        & (col("l_discount") <= 7)
        & (col("l_quantity") < 24)
    )
    mask = pred.mask(table)
    revenue = scalar_aggregate(
        table["l_extendedprice"].values * table["l_discount"].values, mask, "sum"
    )
    return revenue


def q6_pruning_predicates():
    from ..exec.pruning import Comparison

    return [Comparison("l_shipdate", "ge", 731), Comparison("l_shipdate", "lt", 1096)]


def q1(table, delta_days: int = 90):
    """TPC-H Q1: pricing summary by (returnflag, linestatus).

    Uses the MXU dense-code aggregation path (composite key
    ``returnflag * 2 + linestatus`` has 6 dense values) — two orders of
    magnitude less HBM traffic than sort-based grouping on TPU.
    """
    import jax.numpy as jnp

    from ..exec import col
    from ..exec.aggregate import dense_group_sum

    cutoff = 2557 - delta_days
    mask = (col("l_shipdate") <= cutoff).mask(table)
    code = table["l_returnflag"].values * 2 + table["l_linestatus"].values
    sum_qty, cnt = dense_group_sum(code, table["l_quantity"].values, 6, mask)
    sum_base, _ = dense_group_sum(code, table["l_extendedprice"].values, 6, mask)
    n_groups = jnp.sum((cnt > 0).astype(jnp.int32))
    return {
        "sum_qty": sum_qty,
        "sum_base_price": sum_base,
        "count_order": cnt,
        "n_groups": n_groups,
        "codes": jnp.arange(6),
    }


def q1_sort(table, delta_days: int = 90):
    """Q1 via the general sort-based path (comparison baseline)."""
    from ..exec import col, hash_aggregate

    cutoff = 2557 - delta_days
    mask = (col("l_shipdate") <= cutoff).mask(table)
    return hash_aggregate(
        table,
        keys=["l_returnflag", "l_linestatus"],
        aggs={
            "sum_qty": ("sum", "l_quantity"),
            "sum_base_price": ("sum", "l_extendedprice"),
            "count_order": ("count", "l_quantity"),
        },
        num_groups=16,
        mask=mask,
    )


def generate_orders(scale: float, seed: int = 1, rows: Optional[int] = None) -> pa.Table:
    """Orders table (1.5M rows/SF): orderkey aligned with lineitem's."""
    n = rows if rows is not None else int(1_500_000 * scale)
    rng = np.random.default_rng(seed)
    orderkey = np.arange(n, dtype=np.int64)
    custkey = rng.integers(0, max(int(150_000 * max(scale, 0.01)), 10), n).astype(np.int64)
    orderdate = rng.integers(0, 2557 - 151, n).astype(np.int32)
    # order priority segment: low-cardinality int (1..5)
    priority = rng.integers(1, 6, n).astype(np.int64)
    return pa.table(
        {
            "o_orderkey": pa.array(orderkey),
            "o_custkey": pa.array(custkey),
            "o_orderdate": pa.array(orderdate, type=pa.int32()),
            "o_orderpriority": pa.array(priority),
        }
    )


def q3_like(lineitem, orders, date_cut: int = 1000, num_groups: int = 8192):
    """Q3-shaped query: join lineitem→orders on orderkey, filter order date,
    group revenue by order priority.

    Exercises the searchsorted hash join + grouped aggregate at fact-table
    scale (orders is the unique-key build side).
    """
    import jax.numpy as jnp

    from ..exec import hash_join
    from ..exec.aggregate import grouped_aggregate

    pi, bi, valid = hash_join(lineitem, orders, on=("l_orderkey", "o_orderkey"))
    odate = orders["o_orderdate"].values[bi]
    valid = jnp.logical_and(valid, odate < date_cut)
    revenue = (
        lineitem["l_extendedprice"].values[pi]
        * (jnp.int64(100) - lineitem["l_discount"].values[pi])
    )
    prio = orders["o_orderpriority"].values[bi]
    uniq, n_groups, rep, (total,) = grouped_aggregate(
        (prio,), (revenue,), valid, num_groups, (("sum", 0),)
    )
    return uniq, n_groups, total


def q6_numpy_reference(table: pa.Table) -> int:
    sd = table.column("l_shipdate").to_numpy()
    disc = table.column("l_discount").to_numpy()
    qty = table.column("l_quantity").to_numpy()
    ep = table.column("l_extendedprice").to_numpy()
    m = (sd >= 731) & (sd < 1096) & (disc >= 5) & (disc <= 7) & (qty < 24)
    return int((ep[m] * disc[m]).sum())
