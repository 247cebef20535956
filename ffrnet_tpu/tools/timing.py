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
                     short: int = 2,
                     on_discard: Callable[[float, float], None] = None):
    """Stall-proof slope: the headline estimator (bench.py).

    Each round times a short (`short`-iter) and a long (`short + iters`)
    chain; their difference is `iters` iterations of pure device time
    with the constant RTT/dispatch overhead cancelled. On this relay,
    stalls only ever ADD time — to whichever chain they land in. A stall
    in a LONG chain inflates that round's difference; a stall in a SHORT
    chain deflates it (toward an arbitrarily inflated faces/s), and the
    two cannot be told apart from the per-round differences alone (a
    majority of deflated rounds drags any median/quantile floor down
    with it).

    So the estimate is CROSS-round: min(t_long over rounds) -
    min(t_short over rounds). Each min approaches the stall-free value
    from above, so one corrupted round — in either chain, any number of
    rounds minority or majority — cannot move the estimate; corrupting
    it requires EVERY round's short chain to stall simultaneously.
    Among kept pairs t_long > t_short per round, so min(longs) >
    min(shorts) and the estimate is always positive. Residual error is
    bounded by the smallest per-round noise, which a min over >= 3
    mostly-healthy rounds makes negligible.

    Rounds with t_long <= t_short (a stall swallowed the whole long-vs-
    short gap) are discarded and re-run (`on_discard(t_short, t_long)`
    per discard), up to `rounds + max_retries` total attempts. Raises
    RuntimeError when no attempt produced a usable pair — the caller
    must see the failure, not a fabricated number.

    Returns (slope_seconds, per_round_differences). The per-round
    differences are the relay-health record (their spread shows stall
    activity); the returned slope is the cross-min estimate, which
    always lies between the smallest and the largest per-round
    difference — and sits ABOVE the smallest exactly when that round's
    short chain was stall-deflated (the resistance this estimator adds).
    """
    shorts, longs, per_round = [], [], []
    attempts = 0
    while len(per_round) < rounds and attempts < rounds + max_retries:
        attempts += 1
        t_short = run(short)
        t_long = run(short + iters)
        if t_long <= t_short:
            if on_discard is not None:
                on_discard(t_short, t_long)
            continue
        shorts.append(t_short)
        longs.append(t_long)
        per_round.append(t_long - t_short)
    if not per_round:
        raise RuntimeError(
            "robust_min_slope: no positive slope in %d attempts (stalls "
            "inside every short chain)" % attempts)
    return min(longs) - min(shorts), per_round
