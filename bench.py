"""Headline benchmark: on-device bitpacked page decode throughput.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measurement notes (this box reaches the TPU through the axon relay, where
``block_until_ready`` returns before execution and host fetches can stall):
timing runs N kernel iterations inside one jitted ``fori_loop`` with a forced
data dependency, fetches a single scalar, and differences two N values to
cancel fixed dispatch/fetch costs.

Baseline: the reference publishes no numbers (BASELINE.md); the target is
0.8 x HBM roofline on primitive-column decode.  v5e HBM ~819 GB/s, so
vs_baseline = achieved_bytes_moved_per_sec / (0.8 * 819 GB/s).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

HBM_GBPS = 819.0  # TPU v5e peak HBM bandwidth
TARGET = 0.8 * HBM_GBPS


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from strawboat_tpu.kernels.bitunpack_pallas import (
        bitunpack_pallas_tmajor,
        transpose_words_host,
    )
    from strawboat_tpu.kernels.decode import bitunpack_flat_device

    b = 16
    n_blocks = 1 << 17  # 16.7M values; in 32 MB, out 64 MB
    rng = np.random.default_rng(0)
    words = rng.integers(0, 1 << 32, n_blocks * b * 4, dtype=np.uint64).astype(
        np.uint32
    )
    wt = jnp.asarray(transpose_words_host(words, b))
    in_bytes = wt.size * 4
    out_bytes = n_blocks * 128 * 4

    # pallas kernel preferred; XLA flat-unpack fallback if Mosaic fails
    def decode_pallas(w):
        return bitunpack_pallas_tmajor(w, b)

    words_flat = jnp.asarray(words)

    def decode_xla(w):
        return bitunpack_flat_device(w, b)

    try:
        _probe = decode_pallas(wt)
        _probe.block_until_ready()
        decode, arg = decode_pallas, wt
    except Exception:
        decode, arg = decode_xla, words_flat
        in_bytes = words_flat.size * 4
    wt = arg

    @jax.jit
    def run(wt, n):
        def body(i, carry):
            w, acc = carry
            w = w ^ (acc & jnp.uint32(1))  # forces a fresh decode per iter
            out = decode(w)
            return (w, acc + jnp.sum(out, dtype=jnp.uint32))

        _, acc = jax.lax.fori_loop(0, n, body, (wt, jnp.uint32(0)))
        return acc

    # warm / compile
    float(run(wt, 1))

    def once(n: int) -> float:
        t0 = time.perf_counter()
        float(run(wt, n))
        return time.perf_counter() - t0

    n_small, n_big = 2, 12
    t_small = min(once(n_small) for _ in range(3))
    t_big = min(once(n_big) for _ in range(3))
    dt = max((t_big - t_small) / (n_big - n_small), 1e-9)

    # traffic per iteration: xor pass (r+w input) + decode (r input, w output)
    # + reduce (r output, fused with decode write → counted once)
    moved = 3 * in_bytes + out_bytes
    gbps = moved / dt / 1e9
    print(
        json.dumps(
            {
                "metric": "bitpack_decode_bandwidth",
                "value": round(gbps, 2),
                "unit": "GB/s",
                "vs_baseline": round(gbps / TARGET, 4),
            }
        )
    )
    return 0


def _watchdog_main() -> int:
    """Run main() with a hard watchdog.

    The axon relay can wedge (device→host transfers hang indefinitely after
    an OOM); emit a sentinel result rather than hanging the driver.
    """
    import threading
    import os

    result = {}

    def runner():
        try:
            result["rc"] = main()
        except Exception as e:  # noqa: BLE001
            result["error"] = str(e)

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    t.join(timeout=1500)
    if t.is_alive() or "error" in result:
        note = result.get("error", "device wedged: fetch timeout")
        print(
            json.dumps(
                {
                    "metric": "bitpack_decode_bandwidth",
                    "value": 0.0,
                    "unit": "GB/s",
                    "vs_baseline": 0.0,
                    "note": note[:200],
                }
            )
        )
        os._exit(1)
    return result.get("rc", 0)


if __name__ == "__main__":
    sys.exit(_watchdog_main())
