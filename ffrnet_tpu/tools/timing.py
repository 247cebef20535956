"""Relay-safe device timing helpers.

Through this image's TPU relay, block_until_ready is unreliable and any
device_get pays a ~50ms RTT, so per-op timing uses CHAINED dependent
executions: feed a tiny scalar token derived from iteration i's output into
iteration i+1's input, run a short and a long chain, and take the slope —
the constant RTT/dispatch overhead cancels. (Methodology notes:
BASELINE.md; the reference only ever wall-clocked whole loop sections,
utils/timer.py.)
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def time_op(fn: Callable, x0, iters: int = 8, warmup: int = 2) -> float:
    """Per-call milliseconds for y = fn(x), x0-shaped input.

    fn must return an array (or tuple whose first element is an array);
    the chain token is 1e-30 * sum(y) added back onto the input, so the
    measured program includes one small reduce — negligible for the
    model/kernel-sized ops this is used on.
    """
    f = jax.jit(fn)

    def first(y):
        return y[0] if isinstance(y, (tuple, list)) else y

    def run(n):
        tok = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            y = first(f(x0 + tok.astype(x0.dtype)))
            tok = jnp.sum(y.astype(jnp.float32)) * jnp.float32(1e-30)
        float(jax.device_get(tok))
        return time.perf_counter() - t0

    run(1)  # compile
    run(warmup)
    # Relay throughput can swing between the short and long chain calls,
    # making the slope non-positive; retry a few times before giving up
    # (callers treat 0.0 as a glitched round and drop it).
    for _ in range(3):
        dt = run(2 + iters) - run(2)
        if dt > 0.0:
            return dt / iters * 1e3
    return 0.0
