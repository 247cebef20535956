"""tools/timing.py: the chained-slope estimators behind every bench
number (BASELINE.md methodology invariants; reference analog: whole-loop
wall-clock only, utils/timer.py:14-30)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ffrnet_tpu.tools.timing import robust_min_slope, time_op


def test_time_op_positive_on_real_op():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((64, 64)),
                    jnp.float32)
    ms = time_op(lambda a: a @ a, x, iters=4, warmup=1)
    assert ms >= 0.0  # 0.0 is the documented glitched-round sentinel


class FakeChain:
    """run(n) = n * per_iter + overhead, with scripted stall injections
    consumed one call at a time (stalls only ever ADD time — the relay
    property the estimator is built on)."""

    def __init__(self, per_iter=0.1, overhead=0.5, stalls=()):
        self.per_iter, self.overhead = per_iter, overhead
        self.stalls = list(stalls)
        self.calls = []

    def __call__(self, n):
        extra = self.stalls.pop(0) if self.stalls else 0.0
        self.calls.append((n, extra))
        return n * self.per_iter + self.overhead + extra


def test_robust_min_slope_clean_rounds():
    run = FakeChain()
    m, sl = robust_min_slope(run, iters=10, rounds=3)
    assert m == pytest.approx(1.0, rel=1e-6)  # 10 iters * 0.1s
    assert len(sl) == 3 and len(run.calls) == 6


def test_robust_min_slope_discards_swallowing_short_chain_stall():
    # a 5s stall inside round-1's SHORT chain makes t_long <= t_short:
    # the round is discarded and re-run; clamping it to ~0 would have
    # inflated the headline arbitrarily (the ADVICE r4 failure mode)
    run = FakeChain(stalls=[5.0, 0.0])
    discards = []
    m, sl = robust_min_slope(run, iters=10, rounds=3,
                             on_discard=lambda a, b: discards.append((a, b)))
    assert m == pytest.approx(1.0, rel=1e-6)
    assert len(sl) == 3 and all(s > 0 for s in sl)
    assert len(run.calls) == 8  # one extra short+long pair for the retry
    assert len(discards) == 1


def test_robust_min_slope_long_chain_stall_only_adds_time():
    # a stall inside one LONG chain inflates that round's difference;
    # the cross-min estimate ignores it
    run = FakeChain(stalls=[0.0, 3.0])
    m, sl = robust_min_slope(run, iters=10, rounds=3)
    assert m == pytest.approx(1.0, rel=1e-6)
    assert max(sl) == pytest.approx(4.0, rel=1e-6)


def test_robust_min_slope_partial_short_stall_single_round():
    # a stall that lands MOSTLY inside one short chain leaves a positive
    # but deflated per-round difference (0.05 here); the cross-min
    # estimate takes the clean rounds' t_short and stays correct
    run = FakeChain(stalls=[0.95, 0.0])
    m, sl = robust_min_slope(run, iters=10, rounds=3)
    assert m == pytest.approx(1.0, rel=1e-6)
    assert min(sl) == pytest.approx(0.05, rel=1e-6)  # kept in the record


def test_robust_min_slope_majority_corrupted_rounds():
    # TWO of three rounds deflated by partial short-chain stalls: any
    # per-round median/quantile floor is dragged down with the corrupted
    # majority (inline-review regression), but one clean round is enough
    # for the cross-min estimate — min(longs) - min(shorts) pairs the
    # clean short with the clean long
    run = FakeChain(stalls=[0.9, 0.0, 0.8, 0.0, 0.0, 0.0])
    m, sl = robust_min_slope(run, iters=10, rounds=3)
    assert m == pytest.approx(1.0, rel=1e-6)
    assert sorted(sl)[:2] == [pytest.approx(0.1), pytest.approx(0.2)]


def test_robust_min_slope_raises_when_all_corrupted():
    run = FakeChain(stalls=[9.0, 0.0] * 10)  # every short chain stalls
    discards = []
    with pytest.raises(RuntimeError, match="no positive slope in 6"):
        robust_min_slope(run, iters=10, rounds=3, max_retries=3,
                         on_discard=lambda a, b: discards.append((a, b)))
    # total attempts are capped at rounds + max_retries, every one
    # discarded, and the error message reports the TRUE attempt count
    assert len(discards) == 6
