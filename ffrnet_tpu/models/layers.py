"""Composable block library: ConvLayer / ResidualBlock / norm / activation.

Functional rebuild of the reference block vocabulary
(models/recnet.py:52-218): each block is an (init, apply) pair over explicit
param/state pytrees. `apply` threads BatchNorm running statistics through a
state tree so everything stays pure and jit/pjit-friendly.

Reference semantics preserved:
  * ConvLayer = [optional 2x nearest upsample] -> ReflectionPad(k//2) ->
    Conv2d(stride 2 iff scale=='down', bias iff norm in {pixel, none}) ->
    norm -> activation (models/recnet.py:52-85; note norm BEFORE relu).
  * ReluLayer: relu / leakyrelu(0.2) / prelu(per-channel) / selu / none.
  * NormLayer: bn / in / gn(32) / pixel / layer / none.
  * ResidualBlock: two ConvLayers + identity shortcut.

Weight init mirrors the reference's `init_weights(..., 'kaiming')` pass
(models/recnet.py:13-42): Conv/Linear weights ~ kaiming-normal(fan_in),
biases 0, BatchNorm weight ~ N(1, 0.02), bias 0. PReLU slopes start at 0.25.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ffrnet_tpu.ops import nn as ops

Params = Dict[str, Any]
State = Dict[str, Any]


# ---------------------------------------------------------------------------
# Norm layer
# ---------------------------------------------------------------------------


def init_norm(key, channels: int, norm_type: str, dtype=jnp.float32):
    """Returns (params, state) for a NormLayer."""
    if norm_type == "bn":
        params = {
            "scale": 1.0 + 0.02 * jax.random.normal(key, (channels,), dtype),
            "bias": jnp.zeros((channels,), dtype),
        }
        state = {
            "mean": jnp.zeros((channels,), dtype),
            "var": jnp.ones((channels,), dtype),
        }
        return params, state
    if norm_type in ("in", "gn", "layer"):
        return (
            {"scale": jnp.ones((channels,), dtype), "bias": jnp.zeros((channels,), dtype)},
            {},
        )
    if norm_type in ("pixel", "none"):
        return {}, {}
    raise ValueError(f"Norm type {norm_type} not supported.")


def apply_norm(params, state, x, norm_type: str, *, training: bool):
    """Apply a NormLayer; returns (y, new_state). Channels last."""
    if norm_type == "bn":
        y, mean, var = ops.batch_norm(
            x, params["scale"], params["bias"], state["mean"], state["var"],
            training=training,
        )
        return y, {"mean": mean, "var": var}
    if norm_type == "in":
        return ops.instance_norm(x, params["scale"], params["bias"]), state
    if norm_type == "gn":
        return ops.group_norm(x, params["scale"], params["bias"]), state
    if norm_type == "pixel":
        return ops.pixel_norm(x), state
    if norm_type == "layer":
        return ops.layer_norm(x, params["scale"], params["bias"]), state
    if norm_type == "none":
        return x, state
    raise ValueError(f"Norm type {norm_type} not supported.")


# ---------------------------------------------------------------------------
# Activation layer
# ---------------------------------------------------------------------------


def init_relu(channels: int, relu_type: str, dtype=jnp.float32):
    if relu_type == "prelu":
        return {"slope": jnp.full((channels,), 0.25, dtype)}
    if relu_type in ("relu", "leakyrelu", "selu", "none"):
        return {}
    raise ValueError(f"Relu type {relu_type} not supported.")


def apply_relu(params, x, relu_type: str, *, channel_axis: int = -1):
    if relu_type == "relu":
        return ops.relu(x)
    if relu_type == "leakyrelu":
        return ops.leaky_relu(x, 0.2)
    if relu_type == "prelu":
        return ops.prelu(x, params["slope"], axis=channel_axis)
    if relu_type == "selu":
        return ops.selu(x)
    if relu_type == "none":
        return x
    raise ValueError(f"Relu type {relu_type} not supported.")


# ---------------------------------------------------------------------------
# ConvLayer
# ---------------------------------------------------------------------------


def init_conv_layer(
    key,
    in_channels: int,
    out_channels: int,
    kernel_size: int = 3,
    *,
    norm_type: str = "none",
    relu_type: str = "none",
    dtype=jnp.float32,
):
    """Params/state for a reference ConvLayer (kaiming-init)."""
    kw, kb, kn = jax.random.split(key, 3)
    use_bias = norm_type in ("pixel", "none")
    fan_in = in_channels * kernel_size * kernel_size
    params: Params = {
        "conv": {
            "w": ops.kaiming_normal(
                kw, (kernel_size, kernel_size, in_channels, out_channels), fan_in, dtype
            )
        }
    }
    if use_bias:
        params["conv"]["b"] = jnp.zeros((out_channels,), dtype)
    norm_p, norm_s = init_norm(kn, out_channels, norm_type, dtype)
    params["norm"] = norm_p
    params["relu"] = init_relu(out_channels, relu_type, dtype)
    return params, {"norm": norm_s}


def apply_conv_layer(
    params,
    state,
    x,
    *,
    kernel_size: int = 3,
    scale: str = "none",
    norm_type: str = "none",
    relu_type: str = "none",
    use_pad: bool = True,
    training: bool = False,
):
    """NHWC ConvLayer forward; returns (y, new_state)."""
    if scale == "up":
        x = ops.upsample_nearest_2x(x)
    if use_pad:
        x = ops.reflect_pad(x, kernel_size // 2)
    stride = 2 if scale == "down" else 1
    y = ops.conv2d(x, params["conv"]["w"], params["conv"].get("b"), stride=stride)
    y, norm_s = apply_norm(params["norm"], state["norm"], y, norm_type, training=training)
    y = apply_relu(params["relu"], y, relu_type)
    return y, {"norm": norm_s}


# ---------------------------------------------------------------------------
# ResidualBlock
# ---------------------------------------------------------------------------


def init_residual_block(
    key, inplanes: int, planes: int, kernel_size: int = 3, *,
    norm_type: str = "none", relu_type: str = "none", dtype=jnp.float32,
):
    k1, k2 = jax.random.split(key)
    p1, s1 = init_conv_layer(k1, inplanes, planes, kernel_size,
                             norm_type=norm_type, relu_type=relu_type, dtype=dtype)
    p2, s2 = init_conv_layer(k2, planes, planes, kernel_size,
                             norm_type=norm_type, relu_type=relu_type, dtype=dtype)
    return {"conv1": p1, "conv2": p2}, {"conv1": s1, "conv2": s2}


def apply_residual_block(
    params, state, x, *, kernel_size: int = 3,
    norm_type: str = "none", relu_type: str = "none", training: bool = False,
):
    res = x
    y, s1 = apply_conv_layer(params["conv1"], state["conv1"], x,
                             kernel_size=kernel_size, norm_type=norm_type,
                             relu_type=relu_type, training=training)
    y, s2 = apply_conv_layer(params["conv2"], state["conv2"], y,
                             kernel_size=kernel_size, norm_type=norm_type,
                             relu_type=relu_type, training=training)
    return y + res, {"conv1": s1, "conv2": s2}


# ---------------------------------------------------------------------------
# Linear (torch layout) with kaiming init, for Conv4Channel blocks
# ---------------------------------------------------------------------------


def init_linear(key, in_features: int, out_features: int, *, init: str = "kaiming",
                dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    if init == "kaiming":
        w = ops.kaiming_normal(kw, (out_features, in_features), in_features, dtype)
        b = jnp.zeros((out_features,), dtype)
    elif init == "torch_default":
        w = ops.kaiming_uniform(kw, (out_features, in_features), in_features, dtype=dtype)
        b = ops.bias_uniform(kb, (out_features,), in_features, dtype)
    else:
        raise ValueError(init)
    return {"w": w, "b": b}


def apply_linear(params, x):
    return ops.linear(x, params["w"], params.get("b"))
