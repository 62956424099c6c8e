"""Distributed hash aggregate: local partials → keyed exchange → final.

The scalable shape of BASELINE config 5 (hash-partitioned scan → shuffle →
hash aggregate across hosts): each shard pre-aggregates its local rows
(bounding exchange volume by group cardinality, which also neutralizes row
skew), partial groups are repartitioned by key hash, and each shard finishes
its key range.  Communication is one all_to_all of (num_groups_local) rows
instead of the raw table.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..exec.aggregate import grouped_aggregate
from .shuffle import shuffle_by_key

_COMBINE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def distributed_aggregate(
    mesh: Mesh,
    axis: str,
    key: jax.Array,
    values: Dict[str, Tuple[str, jax.Array]],
    mask: Optional[jax.Array] = None,
    num_groups: int = 4096,
):
    """Group ``key`` rows sharded over ``axis``; returns per-shard final
    (keys, n_groups, aggs) — globally partitioned by key hash.

    values: out_name -> (fn, sharded value array); fn in {sum,count,min,max}.
    """
    import functools

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    agg_names = tuple(values.keys())
    fns = tuple(values[n][0] for n in agg_names)
    cols = tuple(values[n][1] for n in agg_names)
    specs = tuple((fns[i], i) for i in range(len(cols)))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), tuple(P(axis) for _ in cols))
        + ((P(axis),) if mask is not None else ()),
        out_specs=(P(axis), tuple(P(axis) for _ in cols), P(axis)),
        check_vma=False,
    )
    def _local_partial(local_key, local_cols, *maybe_mask):
        m = maybe_mask[0] if maybe_mask else None
        uniq, n_grp, rep, outs = grouped_aggregate(
            (local_key,), local_cols, m, num_groups, specs
        )
        slot = jnp.arange(num_groups)
        valid = slot < n_grp
        # recover the raw key from the representative row
        raw_keys = local_key[jnp.clip(rep, 0, local_key.shape[0] - 1)]
        return raw_keys, tuple(outs), valid

    args = (key, cols) + ((mask,) if mask is not None else ())
    pkeys, partials, pvalid = _local_partial(*args)

    # second stage: exchange partial groups by key hash, then final combine
    capacity = num_groups  # worst case: all local groups hash to one shard
    payloads = tuple(partials) + (pvalid,)
    k2, outs2, valid2 = shuffle_by_key(mesh, axis, pkeys, payloads, capacity)
    recv_valid = jnp.logical_and(valid2, outs2[-1])
    recv_partials = outs2[:-1]

    combine_specs = tuple((_COMBINE[fns[i]], i) for i in range(len(cols)))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), tuple(P(axis) for _ in recv_partials), P(axis)),
        out_specs=(P(axis), tuple(P(axis) for _ in recv_partials), P(axis)),
        check_vma=False,
    )
    def _final(local_key, local_partials, local_valid):
        uniq, n_grp, rep, outs = grouped_aggregate(
            (local_key,), local_partials, local_valid, num_groups, combine_specs
        )
        slot = jnp.arange(num_groups)
        valid = slot < n_grp
        raw_keys = local_key[jnp.clip(rep, 0, local_key.shape[0] - 1)]
        return raw_keys, tuple(outs), valid

    fkeys, fouts, fvalid = _final(k2, recv_partials, recv_valid)
    result = {"keys": fkeys, "valid": fvalid}
    for name, o in zip(agg_names, fouts):
        result[name] = o
    return result
