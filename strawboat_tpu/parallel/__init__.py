"""Multi-chip / multi-host scale-out over a JAX device mesh.

No reference counterpart (the reference is single-threaded; SURVEY §2.8):
this is first-class here.  Tables are hash-partitioned across mesh shards;
scans decode locally; repartitioning rides ``shard_map`` + ``all_to_all``
over ICI (DCN across slices), with salted keys for skew; partial aggregates
combine via a second keyed exchange instead of a full gather.
"""

from .mesh import make_mesh, distributed_init  # noqa: F401
from .shuffle import hash_partition_ids, shuffle_by_key  # noqa: F401
from .dist_agg import distributed_aggregate  # noqa: F401
from .pipeline import pipelined_distributed_aggregate  # noqa: F401
from .dist_join import distributed_join  # noqa: F401
from .dist_scan import (  # noqa: F401
    distributed_scan,
    distributed_scan_dataset,
    local_shard_table,
)
from .dist_resident import shard_resident, sharded_group_sum  # noqa: F401
