"""Distributed hash aggregate: local partials → keyed exchange → final.

The scalable shape of BASELINE config 5 (hash-partitioned scan → shuffle →
hash aggregate across hosts): each shard pre-aggregates its local rows
(bounding exchange volume by group cardinality, which also neutralizes row
skew), partial groups are repartitioned by key hash, and each shard finishes
its key range.  Communication is one all_to_all of (num_groups_local) rows
instead of the raw table.

The whole pipeline builds once per (mesh, axis, agg-spec) and runs as a
single jit — repeated calls hit the compilation cache.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..exec.aggregate import grouped_aggregate
from .shuffle import build_send_bins, hash_partition_ids

_COMBINE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


@functools.lru_cache(maxsize=None)
def _build(mesh: Mesh, axis: str, fns: Tuple[str, ...], num_groups: int, has_mask: bool):
    n_parts = mesh.shape[axis]
    specs = tuple((fns[i], i) for i in range(len(fns)))
    combine_specs = tuple((_COMBINE[fns[i]], i) for i in range(len(fns)))
    n_cols = len(fns)
    capacity = num_groups  # worst case: all local groups hash to one shard

    def shard_fn(local_key, local_cols, local_mask):
        # stage 1: local partial aggregate
        _uniq, n_grp, rep, outs = grouped_aggregate(
            (local_key,), local_cols, local_mask, num_groups, specs
        )
        slot = jnp.arange(num_groups)
        pvalid = slot < n_grp
        pkeys = local_key[jnp.clip(rep, 0, local_key.shape[0] - 1)]
        # stage 2: exchange partial groups by key hash
        part = hash_partition_ids(pkeys, n_parts)
        payloads = (pkeys,) + tuple(outs) + (pvalid,)
        bins, bvalid, counts = build_send_bins(part, payloads, n_parts, capacity)
        exchanged = [
            jax.lax.all_to_all(b, axis, split_axis=0, concat_axis=0, tiled=True)
            for b in bins
        ]
        bvalid_x = jax.lax.all_to_all(
            bvalid, axis, split_axis=0, concat_axis=0, tiled=True
        )
        k2 = exchanged[0].reshape(-1)
        partials = tuple(e.reshape(-1) for e in exchanged[1 : 1 + n_cols])
        sent_valid = exchanged[-1].reshape(-1)
        recv_valid = bvalid_x.reshape(-1) & sent_valid
        # stage 3: final combine on the owning shard
        _u2, n2, rep2, outs2 = grouped_aggregate(
            (k2,), partials, recv_valid, num_groups, combine_specs
        )
        fvalid = jnp.arange(num_groups) < n2
        fkeys = k2[jnp.clip(rep2, 0, k2.shape[0] - 1)]
        # overflow anywhere (capacity-clipped groups or bins would otherwise
        # silently drop rows) is surfaced per shard; callers retry larger
        required = jnp.maximum(
            jnp.maximum(n_grp, n2), jnp.max(counts)
        ).reshape(1).astype(jnp.int32)
        return fkeys, tuple(outs2), fvalid, required

    col_specs = tuple(P(axis) for _ in range(n_cols))
    out_specs = (P(axis), col_specs, P(axis), P(axis))
    if has_mask:
        fn = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(axis), col_specs, P(axis)),
            out_specs=out_specs,
            check_vma=False,
        )
    else:
        fn = shard_map(
            lambda k, c: shard_fn(k, c, None),
            mesh=mesh,
            in_specs=(P(axis), col_specs),
            out_specs=out_specs,
            check_vma=False,
        )
    return jax.jit(fn)


def distributed_aggregate(
    mesh: Mesh,
    axis: str,
    key: jax.Array,
    values: Dict[str, Tuple[str, jax.Array]],
    mask: Optional[jax.Array] = None,
    num_groups: int = 4096,
    on_overflow: str = "grow",
):
    """Group ``key`` rows sharded over ``axis``; returns per-shard final
    (keys, aggs, valid) — globally partitioned by key hash.

    values: out_name -> (fn, sharded value array); fn in {sum,count,min,max}.
    Group-capacity overflow is detected on device; ``on_overflow="grow"``
    (default) doubles ``num_groups`` and retries, ``"raise"`` raises
    :class:`CapacityError` — never silently-wrong sums.
    """
    from ..errors import CapacityError

    agg_names = tuple(values.keys())
    fns = tuple(values[n][0] for n in agg_names)
    cols = tuple(values[n][1] for n in agg_names)
    cap = num_groups
    while True:
        runner = _build(mesh, axis, fns, cap, mask is not None)
        if mask is not None:
            fkeys, fouts, fvalid, required = runner(key, cols, mask)
        else:
            fkeys, fouts, fvalid, required = runner(key, cols)
        need = int(jax.device_get(jnp.max(required)))
        if need <= cap:
            break
        if on_overflow == "raise":
            raise CapacityError("distributed aggregate groups", cap, need)
        cap = 1 << (need - 1).bit_length()
    result = {"keys": fkeys, "valid": fvalid}
    for name, o in zip(agg_names, fouts):
        result[name] = o
    return result
