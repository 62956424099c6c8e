#!/usr/bin/env python
"""Isolate the resident-scan bottleneck: kernel vs consumer vs x64 reduce."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from strawboat_tpu.kernels.bitunpack_pallas import (
        bitunpack_pallas_tiled_natural,
        bitunpack_pallas_tiled_seeded,
        transpose_words_host_tiled,
    )

    b = 16
    n = 1 << 25
    rng = np.random.default_rng(0)
    words = rng.integers(0, 1 << 32, n // 2, dtype=np.uint64).astype(np.uint32)
    wt3 = jnp.asarray(transpose_words_host_tiled(words, b))
    wt3.block_until_ready()
    in_b = wt3.size * 4
    out_b = in_b * 2
    print(f"in {in_b/1e6:.0f}MB out {out_b/1e6:.0f}MB", flush=True)

    def timeit_loop(name, fn):
        @jax.jit
        def run(x, k):
            def body(i, acc):
                return acc + fn(x, (acc & 1).astype(jnp.uint32))

            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        float(run(wt3, 1))

        def once(k):
            t0 = time.perf_counter()
            float(run(wt3, k))
            return time.perf_counter() - t0

        dt = float("inf")
        for _ in range(3):
            t1 = min(once(2) for _ in range(2))
            t2 = min(once(10) for _ in range(2))
            dt = min(dt, max((t2 - t1) / 8, 1e-9))
        print(
            f"{name}: {dt*1e3:.2f} ms/iter ({(in_b+out_b)/dt/1e9:.0f} GB/s if in+out)",
            flush=True,
        )

    def guard(name, fn):
        try:
            timeit_loop(name, fn)
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:120]}", flush=True)

    def d(x, s):
        out = bitunpack_pallas_tiled_seeded(x, s, b)
        return jnp.sum(out[0, 0, :], dtype=jnp.uint32)

    guard("twostep-kernel + row checksum", d)

    def c(x, s):
        out = bitunpack_pallas_tiled_seeded(x, s, b)
        return jnp.sum(out, dtype=jnp.uint32)

    guard("kernel + full u32 sum", c)

    from strawboat_tpu.kernels.bitunpack_pallas import bitunpack_tiled_to_flat

    def f(x, s):
        out = bitunpack_pallas_tiled_seeded(x, s, b)
        flat = bitunpack_tiled_to_flat(out, b)
        return jnp.sum(flat[:128], dtype=jnp.uint32)

    guard("kernel + to_flat + row checksum", f)

    def e(x, s):
        out = bitunpack_pallas_tiled_seeded(x, s, b)
        flat = bitunpack_tiled_to_flat(out, b).astype(jnp.int32)
        m = (flat >= 1000) & (flat < 30000)
        return jnp.sum(jnp.where(m, flat, 0), dtype=jnp.int64).astype(jnp.uint32)

    guard("kernel + to_flat + filter + i64 sum", e)

    def g(x, s):
        out = bitunpack_pallas_tiled_seeded(x, s, b).astype(jnp.int32)
        m = (out >= 1000) & (out < 30000)
        return jnp.sum(jnp.where(m, out, 0), dtype=jnp.int64).astype(jnp.uint32)

    guard("kernel + TILED filter + i64 sum (no restore)", g)


if __name__ == "__main__":
    main()
