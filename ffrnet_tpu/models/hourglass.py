"""Simplified hourglass block + SELayer (parity components).

Rebuilds of the reference's unused-but-present modules (SURVEY.md §2.2):
  * HGBlock — recursive hourglass over ConvLayer up/down branches
    (models/recnet.py:145-200)
  * se_layer — the additive-gating variant `x + x*sigmoid(fc(gap(x)))`
    (models/recnet.py:325-340; note the +x residual, unlike the encoder's
    multiplicative SEModule)
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ffrnet_tpu.models import layers as L
from ffrnet_tpu.ops import nn as ops


def init_hgblock(key, depth: int, c_in: int, c_out: int, *, c_mid: int = 64,
                 norm_type: str = "bn", relu_type: str = "prelu",
                 dtype=jnp.float32):
    kw = {"norm_type": norm_type, "relu_type": relu_type, "dtype": dtype}
    keys = iter(jax.random.split(key, depth * 4 + 2))
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    for level in range(depth, 0, -1):
        c1, c2 = (c_in, c_mid) if level == depth else (c_mid, c_mid)
        params[f"b1_{level}"], state[f"b1_{level}"] = L.init_conv_layer(
            next(keys), c1, c2, 3, **kw)
        params[f"b2_{level}"], state[f"b2_{level}"] = L.init_conv_layer(
            next(keys), c1, c2, 3, **kw)
        if level == 1:
            params[f"b2_plus_{level}"], state[f"b2_plus_{level}"] = \
                L.init_conv_layer(next(keys), c_mid, c_mid, 3, **kw)
        params[f"b3_{level}"], state[f"b3_{level}"] = L.init_conv_layer(
            next(keys), c_mid, c_mid, 3, **kw)
    params["out"], state["out"] = L.init_conv_layer(
        next(keys), c_mid, c_out, 3, norm_type="none", relu_type="none",
        dtype=dtype)
    return params, state


def apply_hgblock(params, state, x, *, depth: int, norm_type: str = "bn",
                  relu_type: str = "prelu", training: bool = False):
    kw = {"norm_type": norm_type, "relu_type": relu_type, "training": training}
    new_state: Dict[str, Any] = {}

    def conv(name, v, **extra):
        y, s = L.apply_conv_layer(params[name], state[name], v, **kw, **extra)
        new_state[name] = s
        return y

    def recurse(level, v):
        up1 = conv(f"b1_{level}", v)
        low1 = conv(f"b2_{level}", v, scale="down")
        if level > 1:
            low2 = recurse(level - 1, low1)
        else:
            low2 = conv(f"b2_plus_{level}", low1)
        up2 = conv(f"b3_{level}", low2, scale="up")
        if up1.shape[1:3] != up2.shape[1:3]:
            up2 = jax.image.resize(up2, up1.shape, method="nearest")
        return up1 + up2

    y = recurse(depth, x)
    y, s = L.apply_conv_layer(params["out"], state["out"], y,
                              norm_type="none", relu_type="none",
                              training=training)
    new_state["out"] = s
    return y, new_state


def init_se_layer(key, channel: int, reduction: int = 16, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    r = channel // reduction
    return {
        "fc1": {"w": ops.kaiming_uniform(k1, (r, channel), channel, dtype=dtype)},
        "fc2": {"w": ops.kaiming_uniform(k2, (channel, r), r, dtype=dtype)},
    }


def apply_se_layer(params, x):
    """x + x * sigmoid(fc2(relu(fc1(gap(x))))) (models/recnet.py:336-340)."""
    pooled = ops.global_avg_pool(x)
    g = ops.relu(ops.linear(pooled, params["fc1"]["w"]))
    g = jax.nn.sigmoid(ops.linear(g, params["fc2"]["w"]))
    return x + x * g[:, None, None, :]
