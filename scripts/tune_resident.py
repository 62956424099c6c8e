#!/usr/bin/env python
"""Piecewise timing of the resident-scan decode pipeline on the real chip.

Stages: (a) device relayout (flat words -> tiled), (b) seeded plane unpack,
(c) natural-order restore, (d) filter+sum, plus composites.  Finds which
piece keeps the composite off the streaming ceiling.
"""
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
        TILE3D,
        bitunpack_pallas_tiled_seeded,
        bitunpack_tiled_to_flat,
        tiled_rows_to_t,
        transpose_words_device_tiled,
        transpose_words_host_tiled,
    )

    b = 16
    n = 1 << 25
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1 << b, n, dtype=np.uint64).astype(np.uint32)
    # pack on host (BitPacker4x layout) via the plain transpose of packed words
    from strawboat_tpu.util.bits import pack_block128

    packed = b"".join(
        pack_block128(vals[i : i + 128], b) for i in range(0, n, 128)
    )
    words = np.frombuffer(packed, np.uint32)
    wt3_np = transpose_words_host_tiled(words, b)
    wt3 = jnp.asarray(wt3_np)
    wflat = jnp.asarray(words)
    wt3.block_until_ready()
    wflat.block_until_ready()
    n_tiles, rows, tile = wt3.shape
    print(f"wt3 {wt3.shape} in={wt3.size*4/1e6:.0f}MB out={n*4/1e6:.0f}MB", flush=True)

    def bench(name, fn, moved):
        @jax.jit
        def run(x, k):
            def body(i, acc):
                return acc + fn(x, (acc & 1).astype(jnp.uint32))

            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        float(run(wt3 if fn.__name__ != "f_relayout" else wflat, 1))
        arg = wt3 if fn.__name__ != "f_relayout" else wflat

        def once(k):
            t0 = time.perf_counter()
            float(run(arg, k))
            return time.perf_counter() - t0

        dt = float("inf")
        for _ in range(4):
            t1 = min(once(2) for _ in range(2))
            t2 = min(once(12) for _ in range(2))
            dt = min(dt, max((t2 - t1) / 10, 1e-9))
        print(
            f"{name}: {dt*1e3:.2f} ms/iter, {moved/dt/1e9:.0f} GB/s agg, "
            f"{n*4/dt/1e9:.1f} GB/s decoded-rate",
            flush=True,
        )

    in_b = wt3.size * 4
    out_b = n_tiles * 32 * tile * 4

    def f_unpack(x, s):
        out = bitunpack_pallas_tiled_seeded(x, s, b)
        return jnp.sum(out[0, 0, :], dtype=jnp.uint32)

    bench("plane unpack only", f_unpack, in_b + out_b)

    def f_unpack_flat(x, s):
        out = bitunpack_pallas_tiled_seeded(x, s, b)
        flat = bitunpack_tiled_to_flat(out, b)
        return jnp.sum(flat[:128], dtype=jnp.uint32)

    bench("unpack + to_flat(gather)", f_unpack_flat, in_b + 3 * out_b)

    # pure-transpose natural restore (no gather): rows (P,b) -> (b,P)
    P = 32 // b

    def to_flat_T(out3):
        t_major = jnp.transpose(
            out3.reshape(n_tiles, P, b, tile), (2, 1, 0, 3)
        ).reshape(32, n_tiles * tile)
        n_blocks2 = (n_tiles * tile) // 4
        return jnp.swapaxes(
            t_major.reshape(32, n_blocks2, 4), 0, 1
        ).reshape(-1)

    def f_unpack_flat_T(x, s):
        out = bitunpack_pallas_tiled_seeded(x, s, b)
        flat = to_flat_T(out)
        return jnp.sum(flat[:128], dtype=jnp.uint32)

    bench("unpack + to_flat(transpose)", f_unpack_flat_T, in_b + 3 * out_b)

    def f_full(x, s):
        out = bitunpack_pallas_tiled_seeded(x, s, b)
        flat = to_flat_T(out)[:n].astype(jnp.int32)
        m = (flat >= 1000) & (flat < 30000)
        return jnp.sum(jnp.where(m, flat, 0)).astype(jnp.uint32)

    bench("unpack + to_flat(T) + filter+sum", f_full, in_b + 4 * out_b)

    # filter+sum in TILED order (permutation-invariant consumers skip restore)
    def f_tiledsum(x, s):
        out = bitunpack_pallas_tiled_seeded(x, s, b).astype(jnp.int32)
        m = (out >= 1000) & (out < 30000)
        return jnp.sum(jnp.where(m, out, 0)).astype(jnp.uint32)

    bench("unpack + tiled filter+sum", f_tiledsum, in_b + 2 * out_b)

    def f_relayout(x, s):
        wt = transpose_words_device_tiled(x ^ s, b, TILE3D)
        return jnp.sum(wt[0, 0, :], dtype=jnp.uint32)

    bench("device relayout only", f_relayout, 3 * in_b)

    # sanity: transpose restore == gather restore
    out3 = bitunpack_pallas_tiled_seeded(wt3, jnp.uint32(0), b)
    a1 = np.asarray(bitunpack_tiled_to_flat(out3, b)[:n])
    a2 = np.asarray(to_flat_T(out3)[:n])
    assert (a1 == a2).all(), "transpose restore mismatch"
    assert (a1 == vals).all(), "decode wrong"
    print("restore parity OK", flush=True)


if __name__ == "__main__":
    main()
