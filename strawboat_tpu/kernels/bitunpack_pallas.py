"""Pallas TPU bitunpack: shuffle-free unpack over transposed word layout.

Host layout: the packed stream is transposed once at plan time to
``WT[w, lane]`` of shape ``(b, n_lanes)`` (n_lanes = 4 * n_blocks, padded to
the lane tile) — so every value decode is a *row* select + elementwise shift,
with no cross-lane gathers.  The kernel writes a t-major tile (value index t
varies along rows); natural row order is ``tm[t, 4*block + l] →
out[128*block + 4t + l]``, obtained with one XLA transpose when a consumer
needs physical row order (aggregates/filters over a single column don't).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 512  # lanes per program == 128 blocks
BLOCKS_PER_TILE = LANE_TILE // 4


def _kernel(b: int, wt_ref, out_ref):
    w = wt_ref[:, :]  # (b, LANE_TILE) uint32
    mask = jnp.uint32((1 << b) - 1) if b < 32 else jnp.uint32(0xFFFFFFFF)
    for t in range(32):
        s = t * b
        w0, sh = s // 32, s % 32
        lo = w[w0, :] >> np.uint32(sh)
        if sh + b > 32:
            v = lo | (w[w0 + 1, :] << np.uint32(32 - sh))
        else:
            v = lo
        out_ref[t, :] = v & mask


@functools.partial(jax.jit, static_argnums=(1,))
def bitunpack_pallas_tmajor(wt: jax.Array, num_bits: int) -> jax.Array:
    """wt: (b, n_lanes) u32 transposed words → (32, n_lanes) t-major values."""
    b = num_bits
    n_lanes = wt.shape[1]
    assert n_lanes % LANE_TILE == 0
    rows = wt.shape[0]  # b padded up to a multiple of 8 (sublane tile)
    grid = (n_lanes // LANE_TILE,)
    # Mosaic rejects i64 grid index maps; force 32-bit tracing locally even
    # when the engine runs with global x64 enabled
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_kernel, b),
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (rows, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec(
                (32, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((32, n_lanes), jnp.uint32),
        )(wt)


@functools.partial(jax.jit, static_argnums=(1,))
def bitunpack_pallas(wt: jax.Array, num_bits: int) -> jax.Array:
    """Natural-order unpack: (b, n_lanes) → (n_blocks*128,) u32."""
    tm = bitunpack_pallas_tmajor(wt, num_bits)
    n_lanes = tm.shape[1]
    n_blocks = n_lanes // 4
    # tm[t, 4*block + l] → out[block, 4t + l]
    nat = jnp.swapaxes(tm.reshape(32, n_blocks, 4), 0, 1).reshape(n_blocks, 128)
    return nat.reshape(-1)


def transpose_words_host(words: np.ndarray, b: int) -> np.ndarray:
    """(n_blocks * 4b,) packed words → (b, n_lanes) transposed, lane-padded."""
    n_blocks = words.size // (4 * b)
    w = words.reshape(n_blocks, b, 4)  # [block, word, lane]
    wt = np.ascontiguousarray(w.transpose(1, 0, 2).reshape(b, n_blocks * 4))
    n_lanes = wt.shape[1]
    pad = (-n_lanes) % LANE_TILE
    if pad:
        wt = np.pad(wt, ((0, 0), (0, pad)))
    return wt
