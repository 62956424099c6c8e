#!/usr/bin/env python
"""Scaling-efficiency proxy harness (BASELINE: >=85% rows/s from 1 to N).

Runs the IDENTICAL streamed distributed aggregate (config-5 shape:
dataset -> chunked decode -> keyed all_to_all exchange -> final combine)
at mesh sizes 1 and 8 on the virtual CPU mesh and reports
``(rows_s_N / N) / rows_s_1``.

The real target is a TPU pod over ICI; this box has one chip, so the
numbers here are a CODE-PATH proxy on 8 virtual CPU devices that share the
same host cores — per-device compute does not scale on a shared CPU the
way independent chips do, so the proxy UNDERSTATES pod efficiency for the
compute-bound part and correctly exercises everything else (sharded
device_put, exchange volume, skew handling, final combine).  On a pod this
script is a config change: build the mesh from ``jax.devices()`` after
``jax.distributed.initialize`` instead of the virtual flag.

Prints one JSON line:
  {"rows_s_1": .., "rows_s_8": .., "efficiency_proxy": .., "n_rows": ..}
"""
import json
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from strawboat_tpu.benchsuite.tpch import generate_lineitem
    from strawboat_tpu.codecs import WriteOptions
    from strawboat_tpu.constants import Compression
    from strawboat_tpu.exec.dataset import write_dataset
    from strawboat_tpu.parallel import make_mesh
    from strawboat_tpu.parallel.pipeline import streamed_dataset_aggregate

    n = int(os.environ.get("SB_SCALE_ROWS", 1_500_000))
    table = generate_lineitem(scale=1.0, rows=n)

    import tempfile

    qty = table.column("l_quantity").to_numpy()
    ep = table.column("l_extendedprice").to_numpy()
    exp = {int(q): int(ep[qty == q].sum()) for q in np.unique(qty)}

    with tempfile.TemporaryDirectory(prefix="sb_scale_") as d:
        paths = write_dataset(
            d,
            table.select(["l_quantity", "l_extendedprice", "l_discount"]),
            rows_per_file=n // 12 + 1,
            options=WriteOptions(
                default_compression=Compression.LZ4,
                default_compress_ratio=1.0,
                max_page_size=65536,
                zone_maps=True,
            ),
        )

        def run(n_dev: int) -> float:
            mesh = make_mesh(n_dev)

            def once():
                t0 = time.perf_counter()
                res = streamed_dataset_aggregate(
                    mesh,
                    "shards",
                    paths,
                    key="l_quantity",
                    aggs={
                        "sum_price": ("sum", "l_extendedprice"),
                        "cnt": ("count", "l_extendedprice"),
                    },
                    chunk_pages=16,
                    num_groups=128,
                )
                dt = time.perf_counter() - t0
                ok = np.asarray(res["valid"])
                got = dict(
                    zip(
                        np.asarray(res["keys"])[ok].tolist(),
                        np.asarray(res["sum_price"])[ok].tolist(),
                    )
                )
                assert got == exp, f"mesh {n_dev}: aggregate mismatch"
                return dt

            once()  # compile warm-up
            return min(once() for _ in range(2))

        t1 = run(1)
        t8 = run(8)
    rows_s_1 = n / t1
    rows_s_8 = n / t8
    out = {
        "rows_s_1": round(rows_s_1, 1),
        "rows_s_8": round(rows_s_8, 1),
        "speedup_8": round(rows_s_8 / rows_s_1, 3),
        "efficiency_proxy": round(rows_s_8 / rows_s_1 / 8, 4),
        "n_rows": n,
        "note": (
            "virtual 8-CPU mesh sharing one host's cores — code-path proxy; "
            "per-device compute cannot scale here, pod ICI numbers require "
            "real chips"
        ),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
