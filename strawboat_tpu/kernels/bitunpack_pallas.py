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


# ---------------------------------------------------------------------------
# Tiled (3D) layout: roofline path.
#
# The 2D stripe layout above DMAs 16 strided 4KB strips per grid step; on a
# real v5e that caps the kernel near ~470 GB/s.  Packing each grid step's
# words contiguously as ``(n_tiles, b, TILE3D)`` makes every input/output DMA
# one contiguous block, and for divisor widths (b | 32) the unpack becomes
# 32/b full-tile shift+mask "plane" ops with contiguous sublane-range stores —
# measured at the chip's practical streaming ceiling (~670 GB/s agg on v5e,
# equal to an XLA xor-copy of the same footprint).
#
# Plane row order: output row p*b + j of a tile holds value t = j*(32//b) + p
# (for divisor b); the general kernel writes rows in t order directly.
# ``tiled_rows_to_t`` exposes the mapping; ``bitunpack_tiled_to_flat``
# restores flat natural value order for consumers that need it.
# ---------------------------------------------------------------------------

TILE3D = 16384


def transpose_words_host_tiled(
    words: np.ndarray, b: int, tile: int = TILE3D
) -> np.ndarray:
    """(n_blocks * 4b,) packed words → (n_tiles, b, tile) contiguous tiles."""
    wt = transpose_words_host(words, b)  # (b, n_lanes) lane-padded to 512
    n_lanes = wt.shape[1]
    pad = (-n_lanes) % tile
    if pad:
        wt = np.pad(wt, ((0, 0), (0, pad)))
    n_tiles = wt.shape[1] // tile
    return np.ascontiguousarray(
        wt.reshape(b, n_tiles, tile).transpose(1, 0, 2)
    )


def _plane_kernel(b: int, wt_ref, out_ref):
    """Divisor widths (b | 32): plane p is one full-tile shift+mask."""
    w = wt_ref[0]  # (b, tile)
    mask = jnp.uint32((1 << b) - 1) if b < 32 else jnp.uint32(0xFFFFFFFF)
    for p in range(32 // b):
        out_ref[0, p * b : (p + 1) * b, :] = (w >> jnp.uint32(p * b)) & mask


def _rowloop_kernel(b: int, wt_ref, out_ref):
    """General widths: per-value row extract with cross-word carry."""
    w = wt_ref[0]  # (b, tile)
    mask = jnp.uint32((1 << b) - 1) if b < 32 else jnp.uint32(0xFFFFFFFF)
    for t in range(32):
        s = t * b
        w0, sh = s // 32, s % 32
        v = w[w0, :] >> np.uint32(sh)
        if sh + b > 32:
            v = v | (w[w0 + 1, :] << np.uint32(32 - sh))
        out_ref[0, t, :] = v & mask


def tiled_rows_to_t(b: int) -> np.ndarray:
    """row → value-index t mapping of the tiled kernel's 32 output rows."""
    if 32 % b == 0:
        P = 32 // b
        rows = np.arange(32)
        return (rows % b) * P + rows // b
    return np.arange(32)


@functools.partial(jax.jit, static_argnums=(1, 2))
def transpose_words_device_tiled(
    words: jax.Array, b: int, tile: int = TILE3D
) -> jax.Array:
    """Device-side relayout: flat packed words → (n_tiles, b, tile) tiles.

    One fused XLA transpose (r+w of the input at streaming bandwidth, ~100x
    cheaper than the numpy pad+transpose it replaces on the host path)."""
    n_blocks = words.shape[0] // (4 * b)
    wt = jnp.swapaxes(words.reshape(n_blocks, b, 4), 0, 1).reshape(
        b, n_blocks * 4
    )
    pad = (-(n_blocks * 4)) % tile
    if pad:
        wt = jnp.pad(wt, ((0, 0), (0, pad)))
    n_tiles = wt.shape[1] // tile
    return jnp.swapaxes(wt.reshape(b, n_tiles, tile), 0, 1)


@functools.partial(jax.jit, static_argnums=(1,))
def bitunpack_pallas_tiled(wt3: jax.Array, num_bits: int) -> jax.Array:
    """(n_tiles, b, tile) u32 → (n_tiles, 32, tile) values (row order per
    ``tiled_rows_to_t``)."""
    b = num_bits
    n_tiles, rows, tile = wt3.shape
    kern = _plane_kernel if 32 % b == 0 else _rowloop_kernel
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(kern, b),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (1, rows, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec(
                (1, 32, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_tiles, 32, tile), jnp.uint32),
        )(wt3)


def _plane_kernel_seeded(b: int, seed_ref, wt_ref, out_ref):
    """Plane kernel with the freshness xor fused in (seed rides in SMEM).

    Benchmark building block: xoring a loop-carried scalar inside the kernel
    keeps XLA from hoisting the call out of a timing loop *without* a separate
    xor pass over the input — per iteration only (input + output) bytes move.
    """
    w = wt_ref[0] ^ seed_ref[0]
    mask = jnp.uint32((1 << b) - 1) if b < 32 else jnp.uint32(0xFFFFFFFF)
    for p in range(32 // b):
        out_ref[0, p * b : (p + 1) * b, :] = (w >> jnp.uint32(p * b)) & mask


def _rowloop_kernel_seeded(b: int, seed_ref, wt_ref, out_ref):
    w = wt_ref[0] ^ seed_ref[0]
    mask = jnp.uint32((1 << b) - 1) if b < 32 else jnp.uint32(0xFFFFFFFF)
    for t in range(32):
        s = t * b
        w0, sh = s // 32, s % 32
        v = w[w0, :] >> np.uint32(sh)
        if sh + b > 32:
            v = v | (w[w0 + 1, :] << np.uint32(32 - sh))
        out_ref[0, t, :] = v & mask


@functools.partial(jax.jit, static_argnums=(2,))
def bitunpack_pallas_tiled_seeded(
    wt3: jax.Array, seed: jax.Array, num_bits: int
) -> jax.Array:
    """``bitunpack_pallas_tiled`` of ``wt3 ^ seed`` without materializing the
    xored copy (seed: uint32 scalar, broadcast from SMEM)."""
    b = num_bits
    n_tiles, rows, tile = wt3.shape
    kern = _plane_kernel_seeded if 32 % b == 0 else _rowloop_kernel_seeded
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(kern, b),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (1,), lambda i: (0,), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(
                    (1, rows, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 32, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_tiles, 32, tile), jnp.uint32),
        )(seed.astype(jnp.uint32).reshape(1), wt3)


def _plane_kernel_natural(b: int, seed_ref, wt_ref, out_ref):
    """Divisor widths: unpack AND restore natural value order in VMEM.

    HBM-side transposes of the t-major layout have 16-byte granularity
    (lane = 4*block + l, value = 128*block + 4t + l) and run ~20x off the
    streaming ceiling; doing the same rearrangement on the tile while it
    sits in VMEM keeps every HBM access contiguous.  Output tile is
    (tile/4, 128): row = block, columns = the block's 128 values — so the
    full output reshapes STRAIGHT to flat natural order.
    """
    w = wt_ref[0] ^ seed_ref[0]  # (b, tile)
    mask = jnp.uint32((1 << b) - 1) if b < 32 else jnp.uint32(0xFFFFFFFF)
    P = 32 // b
    tile = w.shape[1]
    # rows in t order: t = j*P + p → word j = t // P, shift (t % P) * b
    vt = jnp.concatenate(
        [
            ((w[j : j + 1, :] >> jnp.uint32(p * b)) & mask)
            for j in range(b)
            for p in range(P)
        ],
        axis=0,
    )  # (32, tile), row index IS t
    out_ref[0, :, :] = (
        vt.reshape(32, tile // 4, 4).transpose(1, 0, 2).reshape(tile // 4, 128)
    )


def _rowloop_kernel_natural(b: int, seed_ref, wt_ref, out_ref):
    """Non-divisor widths: rowloop extract in t order, then the same in-VMEM
    natural-order rearrangement as the divisor-width kernel."""
    w = wt_ref[0] ^ seed_ref[0]  # (b, tile)
    mask = jnp.uint32((1 << b) - 1) if b < 32 else jnp.uint32(0xFFFFFFFF)
    tile = w.shape[1]
    rows = []
    for t in range(32):
        s = t * b
        w0, sh = s // 32, s % 32
        v = w[w0 : w0 + 1, :] >> np.uint32(sh)
        if sh + b > 32:
            v = v | (w[w0 + 1 : w0 + 2, :] << np.uint32(32 - sh))
        rows.append(v & mask)
    vt = jnp.concatenate(rows, axis=0)  # (32, tile), row index IS t
    out_ref[0, :, :] = (
        vt.reshape(32, tile // 4, 4).transpose(1, 0, 2).reshape(tile // 4, 128)
    )


@functools.partial(jax.jit, static_argnums=(2,))
def bitunpack_pallas_tiled_natural(
    wt3: jax.Array, seed: jax.Array, num_bits: int
) -> jax.Array:
    """(n_tiles, b, tile) ^ seed → (n_tiles*tile/4, 128) blocks in NATURAL
    order: ``result.reshape(-1)`` is the flat natural-order column (padded)."""
    b = num_bits
    n_tiles, rows, tile = wt3.shape
    kern = _plane_kernel_natural if 32 % b == 0 else _rowloop_kernel_natural
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(kern, b),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, rows, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, tile // 4, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n_tiles, tile // 4, 128), jnp.uint32
            ),
        )(seed.astype(jnp.uint32).reshape(1), wt3)
    return out.reshape(n_tiles * (tile // 4), 128)


@functools.partial(jax.jit, static_argnums=(1,))
def bitunpack_tiled_to_flat(out3: jax.Array, num_bits: int) -> jax.Array:
    """Tiled kernel output → flat natural value order (padded length).

    value index = 128*block + 4*t + l where lane = 4*block + l; lanes run
    tile-major across out3's last axis.  For divisor widths the plane
    kernel's row order (row p*b+j holds t = j*P+p) is itself a (P, b) row
    transpose, so the restore is pure reshape/transpose — no gather."""
    n_tiles, _, tile = out3.shape
    n_lanes = n_tiles * tile
    b = num_bits
    if 32 % b == 0:
        P = 32 // b
        tm = jnp.transpose(
            out3.reshape(n_tiles, P, b, tile), (2, 1, 0, 3)
        ).reshape(32, n_lanes)
    else:
        inv = np.argsort(tiled_rows_to_t(b))  # row holding value t
        tm = jnp.swapaxes(out3, 0, 1)[jnp.asarray(inv)].reshape(32, n_lanes)
    n_blocks = n_lanes // 4
    nat = jnp.swapaxes(tm.reshape(32, n_blocks, 4), 0, 1).reshape(-1)
    return nat
