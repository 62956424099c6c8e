#!/usr/bin/env python
"""One-off experiment: squeeze the bitunpack headline past 0.8x roofline.

Variants measured on the real chip (loop-differenced, one fetch per call):
  A. current bench shape: xor pass + pallas tiled decode, 1<<19 blocks
  B. same, 1<<20 blocks (2x working set -> overhead amortizes)
  C. xor folded into the kernel as an SMEM scalar (one phase, in+out moved)
  D. B with bigger n_big
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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from strawboat_tpu.kernels.bitunpack_pallas import (
        bitunpack_pallas_tiled,
        transpose_words_host_tiled,
    )

    b = 16
    HBM = 819.0

    def setup(n_blocks):
        rng = np.random.default_rng(0)
        words = rng.integers(0, 1 << 32, n_blocks * b * 4, dtype=np.uint64).astype(
            np.uint32
        )
        wt = jnp.asarray(transpose_words_host_tiled(words, b))
        wt.block_until_ready()
        return wt

    def run_variant(name, wt, decode, moved, n_small, n_big, rounds=6):
        @jax.jit
        def run(wt, n):
            def body(i, acc):
                return acc + decode(wt, acc & jnp.uint32(1))

            return jax.lax.fori_loop(0, n, body, jnp.uint32(0))

        float(run(wt, 1))

        def once(n):
            t0 = time.perf_counter()
            float(run(wt, n))
            return time.perf_counter() - t0

        dt = float("inf")
        for _ in range(rounds):
            t_small = min(once(n_small) for _ in range(2))
            t_big = min(once(n_big) for _ in range(2))
            dt = min(dt, max((t_big - t_small) / (n_big - n_small), 1e-9))
        gbps = moved / dt / 1e9
        print(
            f"{name}: {gbps:.1f} GB/s ({gbps/HBM*100:.1f}% roofline, "
            f"vs 0.8x target {gbps/(0.8*HBM):.4f})",
            flush=True,
        )
        return gbps

    # A: current bench shape
    wt = setup(1 << 19)
    in_b = wt.size * 4
    out_b = wt.shape[0] * 32 * wt.shape[2] * 4
    row_b = wt.shape[2] * 4

    def dec_a(w, seed):
        out = bitunpack_pallas_tiled(w ^ seed, b)
        return jnp.sum(out[0, 0, :], dtype=jnp.uint32)

    run_variant("A 1<<19 xor-phase n36", wt, dec_a, 3 * in_b + out_b + row_b, 4, 36)

    # B: 2x working set
    wt2 = setup(1 << 20)
    in2 = wt2.size * 4
    out2 = wt2.shape[0] * 32 * wt2.shape[2] * 4
    run_variant("B 1<<20 xor-phase n20", wt2, dec_a, 3 * in2 + out2 + row_b, 2, 20)

    # C: xor folded into kernel (seeded pallas), one phase
    from strawboat_tpu.kernels.bitunpack_pallas import bitunpack_pallas_tiled_seeded

    def dec_c(w, seed):
        out = bitunpack_pallas_tiled_seeded(w, seed, b)
        return jnp.sum(out[0, 0, :], dtype=jnp.uint32)

    run_variant("C 1<<20 seeded n20", wt2, dec_c, in2 + out2 + row_b, 2, 20)
    run_variant("C2 1<<19 seeded n36", wt, dec_c, in_b + out_b + row_b, 4, 36)

    # D: longer big loop on B
    run_variant("D 1<<20 xor-phase n40", wt2, dec_a, 3 * in2 + out2 + row_b, 2, 40)


if __name__ == "__main__":
    main()
