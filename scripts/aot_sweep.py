#!/usr/bin/env python
"""AOT-compile every device kernel for the real TPU target.

Validates Mosaic/XLA lowering without executing (works even when the
device data path is unavailable) and pre-warms the persistent compile
cache used by bench.py and the scan pipeline."""
import sys
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/strawboat_jaxcache")
import strawboat_tpu.kernels
from strawboat_tpu.kernels.decode import (
    bitunpack_device, bitunpack_flat_device, rle_expand_device,
    dict_gather_device, freq_scatter_device, one_value_device,
    unpack_validity_device, delta_bitunpack_device)
from strawboat_tpu.kernels.encode import stats_device, block_bit_widths, bitpacked_size_bytes, distinct_estimate
from strawboat_tpu.exec.aggregate import grouped_aggregate, scalar_aggregate, list_segment_sum
from strawboat_tpu.exec.join import _join_indices

S = jax.ShapeDtypeStruct
ok = fail = 0
def comp(name, fn, *shapes):
    global ok, fail
    try:
        jax.jit(fn).lower(*shapes).compile()
        ok += 1
    except Exception as e:
        fail += 1
        print(f"FAIL {name}: {str(e)[:150]}")

comp("bitunpack", lambda w: bitunpack_device(w, 13), S((4096, 52), jnp.uint32))
comp("bitunpack_flat", lambda w: bitunpack_flat_device(w, 13), S((4096*52,), jnp.uint32))
comp("delta", lambda w: delta_bitunpack_device(w, 20), S((4096, 80), jnp.uint32))
comp("rle", lambda c, v: rle_expand_device(c, v, 65536), S((512,), jnp.int32), S((512,), jnp.int64))
comp("dict", dict_gather_device, S((65536,), jnp.uint32), S((1024,), jnp.int64))
comp("freq", lambda t, p, e: freq_scatter_device(t, p, e, 65536), S((), jnp.int64), S((1024,), jnp.int32), S((1024,), jnp.int64))
comp("onevalue", lambda v: one_value_device(v, 65536), S((), jnp.int64))
comp("validity", lambda p: unpack_validity_device(p, 65536), S((8192,), jnp.uint8))
comp("stats", stats_device, S((65536,), jnp.int64), S((65536,), jnp.bool_))
comp("widths", block_bit_widths, S((65536*128,), jnp.uint32))
comp("bp_size", bitpacked_size_bytes, S((65536*128,), jnp.uint32))
comp("distinct", distinct_estimate, S((65536,), jnp.int64))
comp("group_agg", lambda k, v, m: grouped_aggregate((k,), (v,), m, 4096, (("sum", 0), ("count", 0))),
     S((1<<20,), jnp.int64), S((1<<20,), jnp.int64), S((1<<20,), jnp.bool_))
comp("scalar_agg", lambda v, m: scalar_aggregate(v, m, "sum"), S((1<<20,), jnp.int64), S((1<<20,), jnp.bool_))
comp("join", lambda b, p: _join_indices(b, p, 2), S((65536,), jnp.int64), S((1<<20,), jnp.int64))
comp("segsum", lambda v, o: list_segment_sum(v, o, 65536), S((1<<18,), jnp.int64), S((65537,), jnp.int32))
print(f"TPU AOT sweep: {ok} ok, {fail} fail")
