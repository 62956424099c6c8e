"""Device kernel unit tests (CPU-forced jax): decode kernels vs host codecs,
encoder stats vs host gen_stats."""

import numpy as np
import pytest

import jax.numpy as jnp

from strawboat_tpu.codecs._family import gen_stats
from strawboat_tpu.kernels.decode import (
    bitunpack_device,
    bitunpack_flat_device,
    dict_gather_device,
    freq_scatter_device,
    one_value_device,
    rle_expand_device,
    unpack_validity_device,
)
from strawboat_tpu.kernels.encode import (
    bitpacked_size_bytes,
    block_bit_widths,
    stats_device,
)
from strawboat_tpu.util.bits import pack_bitmap, pack_block128


def test_bitunpack_matches_host():
    rng = np.random.default_rng(0)
    for b in (1, 5, 13, 16, 24, 32):
        n_blocks = 8
        vals = rng.integers(0, 1 << b if b < 32 else 1 << 32, (n_blocks, 128), dtype=np.uint64).astype(np.uint32)
        packed = b"".join(pack_block128(v, b) for v in vals)
        words = np.frombuffer(packed, np.uint32).reshape(n_blocks, b * 4)
        got = np.asarray(bitunpack_device(jnp.asarray(words), b))
        np.testing.assert_array_equal(got, vals)


def test_bitunpack_flat_matches_host():
    import math

    rng = np.random.default_rng(1)
    for b in (3, 11, 16, 20):
        bpr = math.lcm(4 * b, 128) // (4 * b)
        n_blocks = bpr * 4
        vals = rng.integers(0, 1 << b, (n_blocks, 128), dtype=np.uint64).astype(np.uint32)
        packed = b"".join(pack_block128(v, b) for v in vals)
        words = np.frombuffer(packed, np.uint32)
        got = np.asarray(bitunpack_flat_device(jnp.asarray(words), b)).reshape(n_blocks, 128)
        np.testing.assert_array_equal(got, vals)


def test_rle_expand():
    counts = jnp.asarray(np.array([3, 1, 4, 0, 2], np.int32))
    values = jnp.asarray(np.array([7, 8, 9, 0, 10], np.int64))
    out = np.asarray(rle_expand_device(counts, values, 10))
    np.testing.assert_array_equal(out, [7, 7, 7, 8, 9, 9, 9, 9, 10, 10])


def test_dict_freq_onevalue_validity():
    idx = jnp.asarray(np.array([0, 2, 1, 2], np.uint32))
    d = jnp.asarray(np.array([10, 20, 30], np.int64))
    np.testing.assert_array_equal(np.asarray(dict_gather_device(idx, d)), [10, 30, 20, 30])
    np.testing.assert_array_equal(np.asarray(one_value_device(jnp.int64(5), 4)), [5] * 4)
    out = freq_scatter_device(jnp.int64(9), jnp.asarray(np.array([1, 3], np.int32)), jnp.asarray(np.array([5, 6], np.int64)), 5)
    np.testing.assert_array_equal(np.asarray(out), [9, 5, 9, 6, 9])
    bools = np.random.default_rng(0).random(100) > 0.4
    packed = jnp.asarray(np.frombuffer(pack_bitmap(bools), np.uint8))
    np.testing.assert_array_equal(np.asarray(unpack_validity_device(packed, 100)), bools)


def test_stats_device_matches_host():
    rng = np.random.default_rng(2)
    vals = rng.integers(0, 50, 1000).astype(np.int64)
    mask = rng.random(1000) > 0.3
    host = gen_stats(vals, mask)
    dev = stats_device(jnp.asarray(vals), jnp.asarray(mask))
    assert int(dev["min"]) == vals.min() and int(dev["max"]) == vals.max()
    assert int(dev["null_count"]) == host.null_count
    assert int(dev["set_count"]) == host.set_count
    # run count definition matches the reference scalar loop
    run_count = 0
    last = 0
    for v, m in zip(vals, mask):
        if m and v != last:
            run_count += 1
            last = v
    assert int(dev["run_count"]) == run_count
    sorted_vals = np.sort(rng.integers(0, 10**6, 512)).astype(np.int64)
    assert bool(stats_device(jnp.asarray(sorted_vals), None)["is_sorted"])


def test_bitpacked_size_matches_encoder():
    from strawboat_tpu.codecs.integer import bitpack_encode

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 1 << 15, 128 * 16, dtype=np.uint64).astype(np.uint32)
    host = len(bitpack_encode(vals))
    dev = int(bitpacked_size_bytes(jnp.asarray(vals)))
    assert host == dev
    widths = np.asarray(block_bit_widths(jnp.asarray(vals)))
    assert widths.shape == (16,)


def test_bitunpack_pallas_interpret():
    """Pallas kernel logic via the interpreter (real-TPU compile covered by bench)."""
    from unittest import mock

    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", patched):
        import importlib

        from strawboat_tpu.kernels import bitunpack_pallas as m

        importlib.reload(m)
        rng = np.random.default_rng(0)
        for b in (1, 13, 16, 32):
            n_blocks = 256
            vals = rng.integers(
                0, 1 << b if b < 32 else 1 << 32, (n_blocks, 128), dtype=np.uint64
            ).astype(np.uint32)
            packed = b"".join(pack_block128(v, b) for v in vals)
            wt = m.transpose_words_host(np.frombuffer(packed, np.uint32), b)
            got = np.asarray(m.bitunpack_pallas(jnp.asarray(wt), b))[
                : n_blocks * 128
            ].reshape(n_blocks, 128)
            np.testing.assert_array_equal(got, vals, err_msg=str(b))
    importlib.reload(m)


def test_bitunpack_pallas_tiled_interpret():
    """Tiled (3D) plane/rowloop kernels + flat-order restore, interpreted."""
    from unittest import mock

    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", patched):
        import importlib

        from strawboat_tpu.kernels import bitunpack_pallas as m

        importlib.reload(m)
        rng = np.random.default_rng(1)
        for b in (1, 2, 4, 8, 16, 32, 5, 13, 27):
            n_blocks = 64
            vals = rng.integers(
                0, 1 << b if b < 32 else 1 << 32, (n_blocks, 128), dtype=np.uint64
            ).astype(np.uint32)
            packed = b"".join(pack_block128(v, b) for v in vals)
            wt3 = m.transpose_words_host_tiled(
                np.frombuffer(packed, np.uint32), b, tile=512
            )
            out3 = m.bitunpack_pallas_tiled(jnp.asarray(wt3), b)
            flat = np.asarray(m.bitunpack_tiled_to_flat(out3, b))
            got = flat[: n_blocks * 128].reshape(n_blocks, 128)
            np.testing.assert_array_equal(got, vals, err_msg=str(b))

            # seeded variant: unpack(wt ^ seed) without the xored copy
            seeded = m.bitunpack_pallas_tiled_seeded(
                jnp.asarray(wt3), jnp.uint32(0), b
            )
            np.testing.assert_array_equal(
                np.asarray(seeded), np.asarray(out3), err_msg=f"seed0 b={b}"
            )
            s = np.uint32(0xA5A5_00FF)
            seeded = m.bitunpack_pallas_tiled_seeded(jnp.asarray(wt3), jnp.uint32(s), b)
            ref = m.bitunpack_pallas_tiled(jnp.asarray(wt3 ^ s), b)
            np.testing.assert_array_equal(
                np.asarray(seeded), np.asarray(ref), err_msg=f"seeded b={b}"
            )
    importlib.reload(m)


def test_bitunpack_natural_kernel_interpret():
    """In-VMEM natural-order kernel: reshape(-1) IS flat natural order."""
    from unittest import mock

    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", patched):
        import importlib

        from strawboat_tpu.kernels import bitunpack_pallas as m

        importlib.reload(m)
        rng = np.random.default_rng(3)
        for b in (1, 2, 4, 8, 16, 32):
            n_blocks = 256
            vals = rng.integers(
                0, 1 << b if b < 32 else 1 << 32, (n_blocks, 128), dtype=np.uint64
            ).astype(np.uint32)
            packed = b"".join(pack_block128(v, b) for v in vals)
            wt3 = m.transpose_words_host_tiled(
                np.frombuffer(packed, np.uint32), b, tile=512
            )
            out = m.bitunpack_pallas_tiled_natural(
                jnp.asarray(wt3), jnp.uint32(0), b
            )
            flat = np.asarray(out).reshape(-1)[: n_blocks * 128]
            np.testing.assert_array_equal(
                flat.reshape(n_blocks, 128), vals, err_msg=str(b)
            )
            # seed parity with the two-step path
            s = np.uint32(0x5A5A1234)
            out_s = m.bitunpack_pallas_tiled_natural(
                jnp.asarray(wt3), jnp.uint32(s), b
            )
            ref = m.bitunpack_tiled_to_flat(
                m.bitunpack_pallas_tiled(jnp.asarray(wt3 ^ s), b), b
            )
            np.testing.assert_array_equal(
                np.asarray(out_s).reshape(-1),
                np.asarray(ref),
                err_msg=f"seeded b={b}",
            )
    importlib.reload(m)
