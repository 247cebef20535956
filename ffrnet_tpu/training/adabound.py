"""AdaBound optimizer as an optax gradient transformation.

Re-derivation of the algorithm the reference vendors (utils/adabound.py,
"Adaptive Gradient Methods with Dynamic Bound of Learning Rate", Luo et al.,
ICLR 2019): Adam moments with bias correction, but the per-element step size
lr_eff = lr * sqrt(1 - b2^t) / (1 - b1^t) / (sqrt(v_t) + eps) is clamped to
the band

    final_lr * (1 - 1/(gamma t + 1))  <=  lr_eff  <=  final_lr * (1 + 1/(gamma t))

which tightens around final_lr as t grows — a smooth Adam -> SGD transition.
When the base lr follows a schedule, final_lr scales by lr_t / base_lr
(the "lr_scheduler cannot affect final_lr" workaround, utils/adabound.py:110).

FFR-Net selects this with `--optimizer adabound`, final_lr = 100 * lr
(models/trainer.py:125-127).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Union

import chex
import jax
import jax.numpy as jnp
import optax

ScalarOrSchedule = Union[float, Callable[[chex.Numeric], chex.Numeric]]


class AdaBoundState(NamedTuple):
    count: chex.Array  # int32 step counter
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates
    max_exp_avg_sq: optax.Updates  # only used when amsbound


def adabound(
    learning_rate: ScalarOrSchedule,
    *,
    base_lr: float | None = None,
    final_lr: float = 0.1,
    b1: float = 0.9,
    b2: float = 0.999,
    gamma: float = 1e-3,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    amsbound: bool = False,
) -> optax.GradientTransformation:
    """Build the AdaBound transformation (applies the update with its sign,
    i.e. the returned updates are ready for `optax.apply_updates`)."""

    sched = learning_rate if callable(learning_rate) else (lambda _: learning_rate)
    if base_lr is None:
        base_lr = float(sched(0))

    def init_fn(params):
        # Three independent zero trees: donated buffers must not alias.
        return AdaBoundState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=jax.tree.map(jnp.zeros_like, params),
            exp_avg_sq=jax.tree.map(jnp.zeros_like, params),
            max_exp_avg_sq=(jax.tree.map(jnp.zeros_like, params) if amsbound
                            else jax.tree.map(lambda p: jnp.zeros((), p.dtype),
                                              params)),
        )

    def update_fn(updates, state, params=None):
        if weight_decay:
            if params is None:
                raise ValueError("adabound with weight_decay needs params")
            updates = jax.tree.map(lambda g, p: g + weight_decay * p, updates, params)

        count = state.count + 1  # torch state['step'] after increment
        t = count.astype(jnp.float32)
        lr = jnp.asarray(sched(state.count), jnp.float32)

        exp_avg = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                               state.exp_avg, updates)
        exp_avg_sq = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                  state.exp_avg_sq, updates)
        if amsbound:
            max_sq = jax.tree.map(jnp.maximum, state.max_exp_avg_sq, exp_avg_sq)
            denom_src = max_sq
        else:
            max_sq = state.max_exp_avg_sq
            denom_src = exp_avg_sq

        bias1 = 1 - b1 ** t
        bias2 = 1 - b2 ** t
        step_size = lr * jnp.sqrt(bias2) / bias1
        flr = final_lr * lr / base_lr
        lower = flr * (1 - 1 / (gamma * t + 1))
        upper = flr * (1 + 1 / (gamma * t))

        def step(m, v):
            eff = jnp.clip(step_size / (jnp.sqrt(v) + eps), lower, upper)
            return -eff * m

        new_updates = jax.tree.map(step, exp_avg, denom_src)
        return new_updates, AdaBoundState(count, exp_avg, exp_avg_sq, max_sq)

    return optax.GradientTransformation(init_fn, update_fn)
