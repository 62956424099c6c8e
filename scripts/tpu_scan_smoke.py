#!/usr/bin/env python
"""Real-TPU smoke of every device scan path.

Forces each codec with the env seams (reference util/env.rs pattern), writes
a file per codec, scans it on the ACTUAL backend (no interpret mode), and
compares rows against the host reader.  Interpret-mode kernel tests cannot
prove Mosaic lowering; this does.  Run: python scripts/tpu_scan_smoke.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CASES = [
    # (label, env var, data maker)
    ("bitpack", "STRAWBOAT_BITPACK_COMPRESSION", "bp"),
    ("dict", "STRAWBOAT_DICT_COMPRESSION", "lowcard"),
    ("rle", "STRAWBOAT_RLE_COMPRESSION", "runs"),
    ("freq", "STRAWBOAT_FREQ_COMPRESSION", "skewed"),
    ("patas", "STRAWBOAT_PATAS_COMPRESSION", "floats"),
    ("lz4", None, "random"),
    ("delta", None, "sorted_ratio"),
    ("strings_dict", "STRAWBOAT_DICT_COMPRESSION", "strings"),
]


def make(kind, n=65536):
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(7)
    if kind == "bp":
        return pa.table({"a": pa.array(rng.integers(0, 1 << 11, n).astype(np.uint32))})
    if kind == "lowcard":
        return pa.table({"a": pa.array(rng.integers(0, 37, n).astype(np.int64))})
    if kind == "runs":
        vals = np.repeat(rng.integers(0, 100, n // 64), 64)[:n]
        return pa.table({"a": pa.array(vals.astype(np.int64))})
    if kind == "skewed":
        vals = np.full(n, 42, dtype=np.int64)
        idx = rng.choice(n, n // 50, replace=False)
        vals[idx] = rng.integers(0, 1000, len(idx))
        return pa.table({"a": pa.array(vals)})
    if kind == "floats":
        return pa.table({"a": pa.array(np.cumsum(rng.random(n)) * 0.001)})
    if kind == "random":
        return pa.table({"a": pa.array(rng.integers(0, 1 << 40, n).astype(np.int64))})
    if kind == "sorted_ratio":
        return pa.table(
            {"a": pa.array(np.sort(rng.integers(0, 1 << 20, n)).astype(np.uint32))}
        )
    if kind == "strings":
        words = [f"w{i}" for i in range(50)]
        return pa.table(
            {"a": pa.array([words[i] for i in rng.integers(0, 50, n)], pa.string())}
        )
    raise ValueError(kind)


def main() -> int:
    import numpy as np
    import jax

    from strawboat_tpu.api import read_table, write_file
    from strawboat_tpu.codecs import WriteOptions
    from strawboat_tpu.constants import Compression
    from strawboat_tpu.exec import scan_file

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    backend = jax.default_backend()
    print(f"backend: {backend} devices: {jax.devices()}")
    failures = 0
    with tempfile.TemporaryDirectory(prefix="sb_smoke_") as td:
        for label, env_var, kind in CASES:
            table = make(kind)
            path = os.path.join(td, f"{label}.str")
            opts = WriteOptions(
                default_compression=Compression.LZ4,
                max_page_size=8192,
                default_compress_ratio=(
                    1.0 if kind == "sorted_ratio" else None
                ),
                sample_seed=0,
            )
            if env_var:
                os.environ[env_var] = "1"
            try:
                write_file(path, table, options=opts)
            finally:
                if env_var:
                    del os.environ[env_var]
            try:
                dt = scan_file(path)
                got = dt.to_arrow().column("a")
                want = read_table(path).column("a")
                ok = got.combine_chunks().equals(want.combine_chunks())
            except Exception as e:  # noqa: BLE001
                print(f"{label:14s} ERROR: {e}")
                failures += 1
                continue
            print(f"{label:14s} {'PASS' if ok else 'FAIL'} ({table.num_rows} rows)")
            failures += 0 if ok else 1
    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'} on {backend}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
