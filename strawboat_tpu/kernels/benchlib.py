"""Reliable on-device timing for the axon-relayed TPU.

On this backend ``block_until_ready`` returns before execution finishes and
device→host fetches can stall, so wall-clock around dispatches is garbage.
Strategy: run N iterations of the kernel inside ONE jitted ``fori_loop`` with
a forced data dependency (a scalar derived from the previous output perturbs
the next input, preventing hoisting/CSE), fetch one scalar at the end, and
difference two different N to cancel fixed costs.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def timed_loop(kernel: Callable, args, n_iters: int, perturb: Callable):
    """Build a jitted N-iteration loop: args' = perturb(args, acc)."""

    @partial(jax.jit, static_argnums=(1,))
    def run(args, n):
        def body(i, carry):
            args, acc = carry
            out = kernel(*args)
            scalar = out.reshape(-1)[0]
            return perturb(args, scalar), acc + scalar.astype(jnp.float32)

        (_, acc) = jax.lax.fori_loop(0, n, body, (args, jnp.float32(0)))
        return acc

    return run


def measure_seconds_per_iter(
    kernel: Callable, args, perturb: Callable, n_small: int = 4, n_big: int = 24
) -> float:
    """Seconds per kernel invocation, fixed costs differenced out."""
    run = timed_loop(kernel, args, 0, perturb)
    # warm both compilations
    float(run(args, n_small))
    float(run(args, n_big))

    def once(n):
        t0 = time.perf_counter()
        v = float(run(args, n))
        return time.perf_counter() - t0

    t_small = min(once(n_small) for _ in range(3))
    t_big = min(once(n_big) for _ in range(3))
    return max((t_big - t_small) / (n_big - n_small), 1e-9)
