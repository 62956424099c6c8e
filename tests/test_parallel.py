"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY §4: the
multi-host test model is shard_map simulation — no reference counterpart)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from strawboat_tpu.parallel import (
    distributed_aggregate,
    hash_partition_ids,
    make_mesh,
    shuffle_by_key,
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "expected 8 virtual CPU devices"
    return make_mesh(8)


def _shard(mesh, arr):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(arr, NamedSharding(mesh, P("shards")))


def test_shuffle_brings_equal_keys_together(mesh):
    rng = np.random.default_rng(0)
    n = 8 * 512
    key = rng.integers(0, 50, n).astype(np.int64)
    val = rng.integers(0, 1000, n).astype(np.int64)
    k = _shard(mesh, jnp.asarray(key))
    v = _shard(mesh, jnp.asarray(val))
    out_key, (out_val,), valid = shuffle_by_key(mesh, "shards", k, (v,), capacity=512)
    ok, ov, om = np.asarray(out_key), np.asarray(out_val), np.asarray(valid)
    # all rows survive (no overflow at this capacity)
    assert om.sum() == n
    # every key lands on exactly one shard
    per_shard = ok.reshape(8, -1)
    per_mask = om.reshape(8, -1)
    owner = {}
    for s in range(8):
        for kk in np.unique(per_shard[s][per_mask[s]]):
            assert owner.setdefault(int(kk), s) == s
    # multiset of (key, val) pairs preserved
    got = sorted(zip(ok[om].tolist(), ov[om].tolist()))
    exp = sorted(zip(key.tolist(), val.tolist()))
    assert got == exp


def test_distributed_aggregate_matches_single_device(mesh):
    rng = np.random.default_rng(1)
    n = 8 * 1024
    key = rng.integers(0, 40, n).astype(np.int64)
    val = rng.integers(0, 10**6, n).astype(np.int64)
    k = _shard(mesh, jnp.asarray(key))
    v = _shard(mesh, jnp.asarray(val))
    res = distributed_aggregate(
        mesh, "shards", k, {"total": ("sum", v), "mx": ("max", v)}, num_groups=256
    )
    keys = np.asarray(res["keys"])
    valid = np.asarray(res["valid"])
    totals = np.asarray(res["total"])
    mxs = np.asarray(res["mx"])
    got = {}
    for kk, t, m, ok in zip(keys, totals, mxs, valid):
        if ok:
            assert int(kk) not in got, "key appears on two shards"
            got[int(kk)] = (int(t), int(m))
    exp = {}
    for kk in np.unique(key):
        sel = key == kk
        exp[int(kk)] = (int(val[sel].sum()), int(val[sel].max()))
    assert got == exp


def test_skew_salting_spreads_hot_key(mesh):
    n = 8 * 256
    key = jnp.zeros(n, dtype=jnp.int64)  # one hot key
    parts_plain = hash_partition_ids(key, 8)
    parts_salted = hash_partition_ids(key, 8, salt=8)
    assert len(np.unique(np.asarray(parts_plain))) == 1
    assert len(np.unique(np.asarray(parts_salted))) == 8


def test_distributed_scan_aggregate_end_to_end(mesh, tmp_path):
    """Config-5 shape: partitioned file scan → shuffle → distributed agg."""
    import pyarrow as pa

    from strawboat_tpu.api import write_file
    from strawboat_tpu.codecs import WriteOptions
    from strawboat_tpu.constants import Compression
    from strawboat_tpu.parallel.dist_scan import distributed_scan

    rng = np.random.default_rng(4)
    n = 8 * 1500
    key = rng.integers(0, 30, n).astype(np.int64)
    val = rng.integers(0, 10**6, n).astype(np.int64)
    table = pa.table({"k": pa.array(key), "v": pa.array(val)})
    path = str(tmp_path / "dist.str")
    write_file(
        path,
        table,
        options=WriteOptions(
            default_compression=Compression.LZ4,
            default_compress_ratio=1.0,
            max_page_size=512,
        ),
    )
    dt = distributed_scan(path, mesh)
    res = distributed_aggregate(
        mesh,
        "shards",
        dt["k"].values,
        {"total": ("sum", dt["v"].values)},
        mask=dt["__valid__"].values,
        num_groups=128,
    )
    got = {}
    for kk, t, ok in zip(
        np.asarray(res["keys"]), np.asarray(res["total"]), np.asarray(res["valid"])
    ):
        if ok:
            got[int(kk)] = int(t)
    exp = {int(k): int(val[key == k].sum()) for k in np.unique(key)}
    assert got == exp


def test_pipelined_aggregate_matches(mesh):
    from strawboat_tpu.parallel.pipeline import pipelined_distributed_aggregate

    rng = np.random.default_rng(7)
    n_chunks, per_chunk = 3, 8 * 512
    keys_all, vals_all = [], []
    chunks = []
    for c in range(n_chunks):
        k = rng.integers(0, 25, per_chunk).astype(np.int64)
        v = rng.integers(0, 10**5, per_chunk).astype(np.int64)
        keys_all.append(k)
        vals_all.append(v)
        chunks.append(
            (
                _shard(mesh, jnp.asarray(k)),
                {"total": ("sum", _shard(mesh, jnp.asarray(v)))},
                None,
            )
        )
    res = pipelined_distributed_aggregate(mesh, "shards", chunks, num_groups=128)
    got = {}
    for kk, t, ok in zip(
        np.asarray(res["keys"]), np.asarray(res["total"]), np.asarray(res["valid"])
    ):
        if ok:
            assert int(kk) not in got
            got[int(kk)] = int(t)
    key = np.concatenate(keys_all)
    val = np.concatenate(vals_all)
    exp = {int(k): int(val[key == k].sum()) for k in np.unique(key)}
    assert got == exp


def test_distributed_join_matches(mesh):
    from strawboat_tpu.parallel.dist_join import distributed_join

    rng = np.random.default_rng(17)
    n, m = 8 * 512, 8 * 64
    pk = rng.integers(0, 200, n).astype(np.int64)
    pv = rng.integers(0, 1000, n).astype(np.int64)
    bk_unique = rng.permutation(512)[:m].astype(np.int64)  # unique build keys
    bw = rng.integers(1, 10, m).astype(np.int64)
    key, out_p, out_b, valid = distributed_join(
        mesh,
        "shards",
        _shard(mesh, jnp.asarray(pk)),
        (_shard(mesh, jnp.asarray(pv)),),
        _shard(mesh, jnp.asarray(bk_unique)),
        (_shard(mesh, jnp.asarray(bw)),),
        capacity_per_shard=512,
    )
    v = np.asarray(valid)
    got = int((np.asarray(out_p[0])[v] * np.asarray(out_b[0])[v]).sum())
    # numpy reference
    wmap = {int(k): int(w) for k, w in zip(bk_unique, bw)}
    exp = sum(int(val) * wmap[int(k)] for k, val in zip(pk, pv) if int(k) in wmap)
    assert got == exp
    assert int(v.sum()) == sum(1 for k in pk if int(k) in wmap)
