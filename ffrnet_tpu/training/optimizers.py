"""Optimizer registry with exact torch semantics (the reference's options:
adam / rmsprop / sgd / adabound, models/trainer.py:115-127), composed with
elementwise gradient clipping at 1.0 (clip_grad_value_, models/trainer.py:186).

All weight decay is torch-style L2-into-gradient (not decoupled).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ffrnet_tpu.training.adabound import adabound


def _sched(learning_rate) -> Callable:
    return learning_rate if callable(learning_rate) else (lambda _: learning_rate)


def _l2_weight_decay(weight_decay: float) -> optax.GradientTransformation:
    if not weight_decay:
        return optax.identity()
    return optax.add_decayed_weights(weight_decay)


def _scale_by_neg_schedule(learning_rate) -> optax.GradientTransformation:
    sched = _sched(learning_rate)
    return optax.scale_by_schedule(lambda count: -sched(count))


def adam(learning_rate, *, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0):
    """torch.optim.Adam: L2 into grad, bias-corrected moments."""
    return optax.chain(
        _l2_weight_decay(weight_decay),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        _scale_by_neg_schedule(learning_rate),
    )


class RMSpropState(NamedTuple):
    square_avg: optax.Updates
    momentum: optax.Updates


def rmsprop(learning_rate, *, alpha=0.99, eps=1e-8, momentum=0.9, weight_decay=0.0):
    """torch.optim.RMSprop semantics: v = a v + (1-a) g^2;
    buf = mu buf + g/(sqrt(v)+eps); p -= lr buf."""

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return RMSpropState(zeros, jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        sq = jax.tree.map(lambda v, g: alpha * v + (1 - alpha) * g * g,
                          state.square_avg, updates)
        if momentum:
            buf = jax.tree.map(lambda b, g, v: momentum * b + g / (jnp.sqrt(v) + eps),
                               state.momentum, updates, sq)
            out = buf
        else:
            buf = state.momentum
            out = jax.tree.map(lambda g, v: g / (jnp.sqrt(v) + eps), updates, sq)
        return out, RMSpropState(sq, buf)

    return optax.chain(
        _l2_weight_decay(weight_decay),
        optax.GradientTransformation(init_fn, update_fn),
        _scale_by_neg_schedule(learning_rate),
    )


def sgd(learning_rate, *, momentum=0.9, weight_decay=0.0, nesterov=False):
    """torch.optim.SGD: buf = mu buf + g (no dampening); p -= lr buf."""
    return optax.chain(
        _l2_weight_decay(weight_decay),
        optax.trace(decay=momentum, nesterov=nesterov) if momentum else optax.identity(),
        _scale_by_neg_schedule(learning_rate),
    )


def make_optimizer(name: str, learning_rate, *, b1=0.9, b2=0.999, momentum=0.9,
                   weight_decay=0.0, nesterov: bool = False,
                   clip_value: float | None = 1.0,
                   base_lr: float | None = None):
    """Build the full update rule used by the trainer: elementwise clip at
    `clip_value` (reference: clip_grad_value_(1.0)) then the named optimizer.

    For 'adabound', final_lr = 100 * lr (models/trainer.py:126).
    """
    name = name.lower()
    sched = _sched(learning_rate)
    if base_lr is None:
        base_lr = float(sched(0))
    if name == "adam":
        tx = adam(learning_rate, b1=b1, b2=b2, weight_decay=weight_decay)
    elif name == "rmsprop":
        tx = rmsprop(learning_rate, momentum=momentum, weight_decay=weight_decay)
    elif name == "sgd":
        tx = sgd(learning_rate, momentum=momentum, weight_decay=weight_decay,
                 nesterov=nesterov)
    elif name == "adabound":
        tx = adabound(learning_rate, base_lr=base_lr, final_lr=100.0 * base_lr,
                      b1=b1, b2=b2, weight_decay=weight_decay)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    clip = optax.clip(clip_value) if clip_value is not None else optax.identity()
    return optax.chain(clip, tx)
