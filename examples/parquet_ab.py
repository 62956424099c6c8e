#!/usr/bin/env python
"""Parquet read/write A/B harness (reference examples/parquet_read.rs +
parquet_write.rs): same data through pyarrow parquet, for manual comparison
against the strawboat examples."""

import sys
import time

import pyarrow.parquet as pq


def main() -> int:
    mode, path = sys.argv[1], sys.argv[2]
    if mode == "read":
        t0 = time.perf_counter()
        table = pq.read_table(path)
        print(
            f"parquet read {table.num_rows} rows, cost "
            f"{(time.perf_counter() - t0) * 1e3:.0f}ms"
        )
    else:
        src = pq.read_table(path)
        dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/out.parquet"
        t0 = time.perf_counter()
        pq.write_table(src, dst, compression="lz4")
        print(f"parquet write cost {(time.perf_counter() - t0) * 1e3:.0f}ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
