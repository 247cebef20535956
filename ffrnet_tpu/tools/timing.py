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


def robust_min_slope(run: Callable[[int], float], iters: int,
                     rounds: int = 3, max_retries: int = 3,
                     short: int = 2, floor_frac: float = 0.25,
                     on_discard: Callable[[float, float], None] = None):
    """Stall-proof min-of-rounds slope: the headline estimator (bench.py).

    Each round times a short (`short`-iter) and a long (`short + iters`)
    chain; the difference is `iters` iterations of pure device time with
    the constant RTT/dispatch overhead cancelled. Relay stalls inside the
    LONG chain only ADD time, so min over rounds is a valid lower-bound
    estimator — but a stall inside the SHORT chain corrupts the round the
    other way (slope non-positive or implausibly small), and such a round
    must be DISCARDED and re-run, never clamped: a clamped near-zero slope
    would win the min and inflate the result arbitrarily (ADVICE r4).

    Returns (min_slope_seconds, all_kept_round_slopes). Discards:
      - non-positive slopes (re-run, up to `max_retries` extra attempts;
        `on_discard(t_short, t_long)` is called for each),
      - positive slopes under `floor_frac` x the round median (a stall
        that landed MOSTLY inside the short chain).
    Raises RuntimeError when every attempt was corrupted — the caller
    must see the failure, not a fabricated number.
    """
    sl, retries = [], 0
    while len(sl) < rounds and retries <= max_retries:
        t_short = run(short)
        t_long = run(short + iters)
        s = t_long - t_short
        if s <= 0:
            retries += 1
            if on_discard is not None:
                on_discard(t_short, t_long)
            continue
        sl.append(s)
    if not sl:
        raise RuntimeError(
            "robust_min_slope: no positive slope in %d attempts (stalls "
            "inside every short chain)" % (rounds + max_retries))
    if len(sl) >= 2:
        med = sorted(sl)[len(sl) // 2]
        kept = [s for s in sl if s >= floor_frac * med]
    else:
        kept = sl
    return min(kept), sl
