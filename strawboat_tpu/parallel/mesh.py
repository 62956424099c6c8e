"""Mesh construction and multi-host bootstrap."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("shards",)
) -> Mesh:
    """1-D (or reshaped) device mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.asarray(devices)
    if len(axis_names) > 1:
        # split the device count as evenly as possible over leading axes
        n = len(devices)
        dims = [1] * len(axis_names)
        rem = n
        for i in range(len(axis_names) - 1):
            d = 1
            while rem % 2 == 0 and d * 2 * int(np.prod(dims)) <= n:
                d *= 2
                rem //= 2
            dims[i] = d
        dims[-1] = n // int(np.prod(dims[:-1]))
        arr = arr.reshape(dims)
    return Mesh(arr, axis_names=tuple(axis_names))


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` wrapper — the multi-host bootstrap
    (the engine's equivalent of an MPI launcher; SURVEY §2.8)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
