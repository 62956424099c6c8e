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

        from strawboat_tpu.parallel.pipeline import (
            pipelined_distributed_aggregate,
            prepared_dataset_chunks,
        )

        AGGS = {
            "sum_price": ("sum", "l_extendedprice"),
            "cnt": ("count", "l_extendedprice"),
        }

        def verify(res, n_dev):
            ok = np.asarray(res["valid"])
            got = dict(
                zip(
                    np.asarray(res["keys"])[ok].tolist(),
                    np.asarray(res["sum_price"])[ok].tolist(),
                )
            )
            assert got == exp, f"mesh {n_dev}: aggregate mismatch"

        def run(n_dev: int):
            """Returns (t_e2e, t_feed, t_exchange, bytes_exchanged)."""
            mesh = make_mesh(n_dev)

            def e2e():
                t0 = time.perf_counter()
                res = streamed_dataset_aggregate(
                    mesh, "shards", paths,
                    key="l_quantity", aggs=AGGS,
                    chunk_pages=16, num_groups=128,
                )
                dt = time.perf_counter() - t0
                verify(res, n_dev)
                return dt

            e2e()  # compile warm-up
            t_e2e = min(e2e() for _ in range(2))

            # stage decomposition: FEED (host chunk decode + sharded
            # device_put — embarrassingly parallel across real hosts) vs
            # EXCHANGE+COMBINE (keyed all_to_all + grouped combine — the
            # only stage that pays communication on a pod).
            def feed_once():
                t0 = time.perf_counter()
                out = list(
                    prepared_dataset_chunks(
                        mesh, "shards", paths, "l_quantity", AGGS,
                        chunk_pages=16,
                    )
                )
                for k, vals, m in out:
                    k.block_until_ready()
                return time.perf_counter() - t0, out

            t_feed, chunks = feed_once()
            t_feed2, chunks = feed_once()
            t_feed = min(t_feed, t_feed2)
            bytes_ex = sum(
                k.size * k.dtype.itemsize
                + sum(a.size * a.dtype.itemsize for _f, a in vals.values())
                + m.size
                for k, vals, m in chunks
            )

            def exchange_once():
                t0 = time.perf_counter()
                res = pipelined_distributed_aggregate(
                    mesh, "shards", iter(chunks), num_groups=128
                )
                dt = time.perf_counter() - t0
                verify(res, n_dev)
                return dt

            exchange_once()  # warm (stage jits differ from e2e? cached)
            t_ex = min(exchange_once() for _ in range(2))
            return t_e2e, t_feed, t_ex, bytes_ex

        t1, f1, e1, _b1 = run(1)
        t8, f8, e8, b8 = run(8)
    rows_s_1 = n / t1
    rows_s_8 = n / t8
    out = {
        "rows_s_1": round(rows_s_1, 1),
        "rows_s_8": round(rows_s_8, 1),
        "speedup_8": round(rows_s_8 / rows_s_1, 3),
        "efficiency_proxy": round(rows_s_8 / rows_s_1 / 8, 4),
        # per-stage decomposition (lets a pod number be predicted from this
        # box: the feed is comm-free across hosts — each host decodes its
        # own file shard, so pod feed wall ~= feed_s/N_hosts; only the
        # exchange stage pays ICI, moving exchange_bytes*(N-1)/N^2 per
        # device per all_to_all)
        "feed_s_1": round(f1, 3),
        "feed_s_8": round(f8, 3),
        "exchange_s_1": round(e1, 3),
        "exchange_s_8": round(e8, 3),
        "exchange_bytes": int(b8),
        "exchange_fraction_8": round(e8 / max(e8 + f8, 1e-9), 4),
        # per-device exchange-stage work at mesh 8 vs 1/8 of the mesh-1
        # stage; 1.0 = the stage scales linearly on THIS harness (shared
        # CPU cores serialize it, so this understates pod ICI scaling)
        "exchange_efficiency_proxy": round(e1 / 8.0 / max(e8, 1e-9), 4),
        "n_rows": n,
        "note": (
            "virtual 8-CPU mesh sharing one host's cores — code-path proxy; "
            "per-device compute cannot scale here, pod ICI numbers require "
            "real chips.  Pod projection: wall ~= feed_s/N + exchange over "
            "ICI (exchange_bytes*(N-1)/N^2 per device per round)"
        ),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
