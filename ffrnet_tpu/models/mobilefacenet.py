"""MobileFaceNet: depthwise-separable face embedding net (parity component).

NHWC functional rebuild of the reference MobileFaceNet
(pretrain/model_ir_se50.py:156-252) — present in the reference API surface
(never instantiated on the main path, SURVEY.md §2.2) but provided for full
capability parity: conv/dw-conv blocks, bottleneck Depth_Wise units with
residuals, a 7x7 depthwise "global" conv, linear head to `embedding_size`
and BN1d, returning an L2-normalized embedding for 112x112 inputs.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ffrnet_tpu.ops import nn as ops


def _init_bn(c, dtype):
    return ({"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)},
            {"mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)})


def _init_conv(key, kh, kw, cin_per_group, cout, dtype):
    fan_in = cin_per_group * kh * kw
    return {"w": ops.kaiming_uniform(key, (kh, kw, cin_per_group, cout), fan_in,
                                     dtype=dtype)}


def _conv_block(key, cin, cout, kernel, groups, dtype, prelu=True):
    """Conv_block / Linear_block: conv -> BN [-> PReLU]."""
    bn_p, bn_s = _init_bn(cout, dtype)
    p = {"conv": _init_conv(key, kernel[0], kernel[1], cin // groups, cout, dtype),
         "bn": bn_p}
    if prelu:
        p["prelu"] = {"slope": jnp.full((cout,), 0.25, dtype)}
    return p, {"bn": bn_s}


def _apply_conv_block(p, s, x, *, stride, padding, groups, training):
    y = ops.conv2d(x, p["conv"]["w"], stride=stride, padding=padding,
                   groups=groups)
    y, mean, var = ops.batch_norm(y, p["bn"]["scale"], p["bn"]["bias"],
                                  s["bn"]["mean"], s["bn"]["var"],
                                  training=training)
    if "prelu" in p:
        y = ops.prelu(y, p["prelu"]["slope"], axis=-1)
    return y, {"bn": {"mean": mean, "var": var}}


# Depth_Wise: 1x1 conv(in->g) -> 3x3 dw conv(g) -> 1x1 linear proj(g->out)
def _init_depthwise(key, cin, cout, groups, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    c1, s1 = _conv_block(k1, cin, groups, (1, 1), 1, dtype)
    c2, s2 = _conv_block(k2, groups, groups, (3, 3), groups, dtype)
    c3, s3 = _conv_block(k3, groups, cout, (1, 1), 1, dtype, prelu=False)
    return {"conv": c1, "conv_dw": c2, "project": c3}, \
           {"conv": s1, "conv_dw": s2, "project": s3}


def _apply_depthwise(p, s, x, *, stride, groups, residual, training):
    y, s1 = _apply_conv_block(p["conv"], s["conv"], x, stride=1, padding=0,
                              groups=1, training=training)
    y, s2 = _apply_conv_block(p["conv_dw"], s["conv_dw"], y, stride=stride,
                              padding=1, groups=groups, training=training)
    y, s3 = _apply_conv_block(p["project"], s["project"], y, stride=1,
                              padding=0, groups=1, training=training)
    if residual:
        y = y + x
    return y, {"conv": s1, "conv_dw": s2, "project": s3}


# (name, kind, cin, cout, kernel, stride, padding, groups, num_blocks)
_ARCH = [
    ("conv1", "conv", 3, 64, (3, 3), 2, 1, 1, 0),
    ("conv2_dw", "conv", 64, 64, (3, 3), 1, 1, 64, 0),
    ("conv_23", "dw", 64, 64, None, 2, 1, 128, 0),
    ("conv_3", "res", 64, 64, None, 1, 1, 128, 4),
    ("conv_34", "dw", 64, 128, None, 2, 1, 256, 0),
    ("conv_4", "res", 128, 128, None, 1, 1, 256, 6),
    ("conv_45", "dw", 128, 128, None, 2, 1, 512, 0),
    ("conv_5", "res", 128, 128, None, 1, 1, 256, 2),
    ("conv_6_sep", "conv", 128, 512, (1, 1), 1, 0, 1, 0),
    ("conv_6_dw", "linear", 512, 512, (7, 7), 1, 0, 512, 0),
]


def init(key, embedding_size: int = 512, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64))
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    for name, kind, cin, cout, kernel, stride, pad, groups, nblocks in _ARCH:
        if kind in ("conv", "linear"):
            params[name], state[name] = _conv_block(
                next(keys), cin, cout, kernel, groups, dtype,
                prelu=(kind == "conv"))
        elif kind == "dw":
            params[name], state[name] = _init_depthwise(
                next(keys), cin, cout, groups, dtype)
        elif kind == "res":
            ps, ss = [], []
            for _ in range(nblocks):
                p, s = _init_depthwise(next(keys), cin, cout, groups, dtype)
                ps.append(p)
                ss.append(s)
            params[name], state[name] = ps, ss
    klin, _ = jax.random.split(next(keys))
    params["linear"] = {"w": ops.kaiming_uniform(klin, (embedding_size, 512),
                                                 512, dtype=dtype)}
    bn_p, bn_s = _init_bn(embedding_size, dtype)
    params["bn"], state["bn"] = bn_p, bn_s
    return params, state


def apply(params, state, x, *, training: bool = False):
    """x: (N, 112, 112, 3) -> L2-normalized (N, embedding_size)."""
    new_state: Dict[str, Any] = {}
    y = x
    for name, kind, cin, cout, kernel, stride, pad, groups, nblocks in _ARCH:
        if kind in ("conv", "linear"):
            y, new_state[name] = _apply_conv_block(
                params[name], state[name], y, stride=stride, padding=pad,
                groups=groups, training=training)
        elif kind == "dw":
            y, new_state[name] = _apply_depthwise(
                params[name], state[name], y, stride=stride, groups=groups,
                residual=False, training=training)
        elif kind == "res":
            ss = []
            for p, s in zip(params[name], state[name]):
                y, s_new = _apply_depthwise(p, s, y, stride=stride,
                                            groups=groups, residual=True,
                                            training=training)
                ss.append(s_new)
            new_state[name] = ss
    y = y.reshape(y.shape[0], -1)  # (N, 512) after the 7x7 dw conv
    y = ops.linear(y, params["linear"]["w"])
    y, mean, var = ops.batch_norm(y, params["bn"]["scale"], params["bn"]["bias"],
                                  state["bn"]["mean"], state["bn"]["var"],
                                  training=training)
    new_state["bn"] = {"mean": mean, "var": var}
    return ops.l2_norm_div(y, axis=1), new_state
