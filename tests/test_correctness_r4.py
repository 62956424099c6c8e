"""Round-4 correctness tests: silent-wrong-answer classes from VERDICT r3.

1. Masked min/max at EXACT group capacity: masked-out rows are routed to
   segment ``num_groups - 1``; when the real group count exactly fills the
   capacity that segment is a real group, so min/max must neutralize masked
   values (sum/count already did).
"""

import numpy as np

import jax.numpy as jnp

from strawboat_tpu.exec.aggregate import hash_aggregate
from strawboat_tpu.exec.scan import DeviceColumn, DeviceTable


def _table(cols):
    dcols = {
        name: DeviceColumn(name, None, jnp.asarray(v), validity)
        for name, (v, validity) in cols.items()
    }
    n = len(next(iter(cols.values()))[0])
    return DeviceTable(dcols, n)


def test_masked_min_at_exact_capacity():
    # 4 real groups, capacity exactly 4 → masked rows land IN group 3
    k = np.array([0, 1, 2, 3, 3, 3], dtype=np.int64)
    v = np.array([10, 20, 30, 50, -999, 999], dtype=np.int64)
    mask = jnp.asarray([True, True, True, True, False, False])
    t = _table({"k": (k, None), "v": (v, None)})
    res = hash_aggregate(
        t,
        ["k"],
        {"mn": ("min", "v"), "mx": ("max", "v"), "s": ("sum", "v"),
         "c": ("count", "v")},
        num_groups=4,
        mask=mask,
        on_overflow="raise",
    )
    assert int(res["n_groups"]) == 4
    by_key = {
        int(res["key_k"][i]): (
            int(res["mn"][i]), int(res["mx"][i]), int(res["s"][i]),
            int(res["c"][i]),
        )
        for i in range(4)
    }
    # group 3 must NOT absorb the masked -999/999 rows in any aggregate
    assert by_key[3] == (50, 50, 50, 1)
    assert by_key[0] == (10, 10, 10, 1)


def test_masked_minmax_float_at_exact_capacity():
    k = np.array([0, 1, 1], dtype=np.int64)
    v = np.array([1.5, 2.5, -100.0], dtype=np.float64)
    mask = jnp.asarray([True, True, False])
    t = _table({"k": (k, None), "v": (v, None)})
    res = hash_aggregate(
        t,
        ["k"],
        {"mn": ("min", "v"), "mx": ("max", "v")},
        num_groups=2,
        mask=mask,
        on_overflow="raise",
    )
    assert int(res["n_groups"]) == 2
    by_key = {
        int(res["key_k"][i]): (float(res["mn"][i]), float(res["mx"][i]))
        for i in range(2)
    }
    assert by_key[1] == (2.5, 2.5)
