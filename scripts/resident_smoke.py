#!/usr/bin/env python
"""Real-chip smoke + rate for compressed-in-HBM resident tables (Q6 shape)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import pyarrow as pa

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from strawboat_tpu.api import write_file
    from strawboat_tpu.codecs import WriteOptions
    from strawboat_tpu.constants import Compression
    from strawboat_tpu.exec import load_resident

    n = int(os.environ.get("SB_RES_ROWS", 1 << 23))
    rng = np.random.default_rng(0)
    sd = rng.integers(0, 2557, n).astype(np.int32)
    qty = rng.integers(1, 51, n).astype(np.int32)
    disc = rng.integers(0, 11, n).astype(np.int32)
    ep = rng.integers(0, 60000, n).astype(np.int32)
    fields = [
        pa.field(nm, pa.int32(), nullable=False)
        for nm in ("sd", "qty", "disc", "ep")
    ]
    t = pa.table(
        dict(zip(("sd", "qty", "disc", "ep"), map(pa.array, (sd, qty, disc, ep)))),
        schema=pa.schema(fields),
    )
    path = "/tmp/resident_smoke.str"
    write_file(
        path,
        t,
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
    print(
        f"HBM resident: {hbm/1e6:.1f} MB packed vs {n*16/1e6:.1f} MB decoded",
        flush=True,
    )
    widths = {k: c.num_bits for k, c in rt.columns.items()}
    print(f"widths: {widths}", flush=True)

    def q6():
        return int(
            rt.filter_sum(
                {"sd": (731, 1096), "disc": (5, 8), "qty": (None, 24)},
                value="ep",
                product_with="disc",
            )
        )

    got = q6()
    m = (sd >= 731) & (sd < 1096) & (disc >= 5) & (disc < 8) & (qty < 24)
    exp = int((ep[m].astype(np.int64) * disc[m]).sum())
    assert got == exp, (got, exp)
    print("Q6 exact vs numpy", flush=True)
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        q6()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        f"warm Q6 over packed pages: {best*1e3:.1f} ms "
        f"({n*16/best/1e9:.1f} GB/s decoded-equivalent, {n/best/1e6:.0f} Mrows/s)",
        flush=True,
    )

    # split: dispatch+device vs fetch
    def q6_arr():
        return rt.filter_sum(
            {"sd": (731, 1096), "disc": (5, 8), "qty": (None, 24)},
            value="ep",
            product_with="disc",
        )

    t0 = time.perf_counter()
    arr = q6_arr()
    arr.block_until_ready()
    t_disp = time.perf_counter() - t0
    t0 = time.perf_counter()
    int(arr)
    t_fetch = time.perf_counter() - t0
    print(
        f"split: dispatch+block {t_disp*1e3:.1f} ms, fetch {t_fetch*1e3:.1f} ms",
        flush=True,
    )
    # loop-differenced device-only time (one dispatch, N executions)
    import jax
    import jax.numpy as jnp

    names = ["sd", "disc", "qty", "ep"]
    colargs = {nm: rt._col_args(nm) for nm in names}

    @jax.jit
    def loop(colargs, k):
        def body(i, acc):
            cols = {
                nm: rt._decode_in_trace(nm, *colargs[nm]) for nm in names
            }
            m = rt.mask_tiled()
            m = m & (cols["sd"] >= 731 + (acc & 1).astype(jnp.int32))
            m = m & (cols["sd"] < 1096) & (cols["disc"] >= 5)
            m = m & (cols["disc"] < 8) & (cols["qty"] < 24)
            prod = cols["ep"].astype(jnp.int64) * cols["disc"]
            return acc + jnp.sum(jnp.where(m, prod, 0), dtype=jnp.int64)

        return jax.lax.fori_loop(0, k, body, jnp.int64(0))

    float(loop(colargs, 1))

    def once(k):
        t0 = time.perf_counter()
        float(loop(colargs, k))
        return time.perf_counter() - t0

    d = min(
        (min(once(10) for _ in range(2)) - min(once(2) for _ in range(2))) / 8
        for _ in range(3)
    )
    print(f"device-only per-iter (loop diff): {d*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
