"""Inference-graph optimizations for the frozen encoder.

The encoder always runs in inference mode (frozen during FFR-Net training,
models/trainer.py:62-63,79), so every conv -> BN pair can be folded into
the conv weights at load time:

    y = BN(conv(x))  ==  conv'(x) + b'   with
    w'[..., o] = w[..., o] * g_o,  b'_o = beta_o - mean_o * g_o,
    g = gamma / sqrt(var + eps)

`fold_backbone_bn` rewrites an IR-SE param/state pair in place-of: folded
convs gain a bias, folded BNs become exact identities (scale 1, shift 0,
mean 0, var 1 - eps). Standalone BNs (the unit input BN, the featmap BN,
the head's BN2d) have no preceding conv here and stay as cheap affine ops.
Numerically exact in fp32 up to reassociation (~1e-6).
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-5


def _identity_bn(channels, dtype):
    return (
        {"scale": jnp.ones((channels,), dtype),
         "bias": jnp.zeros((channels,), dtype)},
        {"mean": jnp.zeros((channels,), dtype),
         "var": jnp.full((channels,), 1.0 - _EPS, dtype)},
    )


def _fold(conv_w, bn_p, bn_s):
    """Returns (w', b', identity bn params, identity bn state)."""
    g = bn_p["scale"] / jnp.sqrt(bn_s["var"] + _EPS)
    w = conv_w * g.reshape((1,) * (conv_w.ndim - 1) + (-1,))
    b = bn_p["bias"] - bn_s["mean"] * g
    ident_p, ident_s = _identity_bn(conv_w.shape[-1], conv_w.dtype)
    return w, b, ident_p, ident_s


def _fold_linear(w, bias, bn_p, bn_s):
    """Linear (out, in) followed by BN1d over out features."""
    g = bn_p["scale"] / jnp.sqrt(bn_s["var"] + _EPS)
    w2 = w * g[:, None]
    b2 = (bias - bn_s["mean"]) * g + bn_p["bias"]
    ident_p, ident_s = _identity_bn(w.shape[0], w.dtype)
    return w2, b2, ident_p, ident_s


def fold_backbone_bn(params, state) -> Tuple[Any, Any]:
    """Fold all conv->BN / linear->BN pairs of an IR-SE backbone."""
    params = copy.deepcopy(jax.device_get(params))
    state = copy.deepcopy(jax.device_get(state))

    # stem: conv -> bn -> prelu
    w, b, ip, is_ = _fold(params["input"]["conv"]["w"], params["input"]["bn"],
                          state["input"]["bn"])
    params["input"]["conv"] = {"w": w, "b": b}
    params["input"]["bn"], state["input"]["bn"] = ip, is_

    for up, us in zip(params["body"], state["body"]):
        if "shortcut" in up:
            w, b, ip, is_ = _fold(up["shortcut"]["conv"]["w"],
                                  up["shortcut"]["bn"], us["shortcut"]["bn"])
            up["shortcut"]["conv"] = {"w": w, "b": b}
            up["shortcut"]["bn"], us["shortcut"]["bn"] = ip, is_
        # conv2 -> bn2 (conv1 is followed by PReLU: not foldable)
        w, b, ip, is_ = _fold(up["res"]["conv2"]["w"], up["res"]["bn2"],
                              us["res"]["bn2"])
        up["res"]["conv2"] = {"w": w, "b": b}
        up["res"]["bn2"], us["res"]["bn2"] = ip, is_

    # head: linear -> bn1d
    w, b, ip, is_ = _fold_linear(params["output"]["linear"]["w"],
                                 params["output"]["linear"]["b"],
                                 params["output"]["bn1d"],
                                 state["output"]["bn1d"])
    params["output"]["linear"] = {"w": w, "b": b}
    params["output"]["bn1d"], state["output"]["bn1d"] = ip, is_
    # return device arrays throughout (host leaves would re-upload per call)
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)
    return params, state


def pad_stem_input_channels(params, to: int = 8):
    """Zero-pad the stem conv's input-channel axis 3 -> `to` (default 8).

    The IR-SE stem conv (pretrain/model_ir_se50.py:86, a 3x3 s1 conv on
    3-channel input) starves the MXU: XLA's C=3 convolution runs at ~2.7
    TFLOP/s bf16 vs 76-174 for the C>=64 stages (bench_stages roofline).
    Padding both operands' input-channel axis with zeros is bit-identical
    math (zero channels contribute exactly 0 to the contraction) and lets
    XLA pick the packed-layout path; irse.apply detects the padded weight
    shape and pads x to match, so the tree is a drop-in. Measured:
    BASELINE.md round-4 "Stem channel-pad duel".

    Works on raw or BN-folded trees; idempotent for widths <= `to`.
    """
    params = copy.deepcopy(jax.device_get(params))
    w = params["input"]["conv"]["w"]  # (3, 3, C_in, 64) HWIO
    cin = w.shape[2]
    if cin < to:
        w = jnp.pad(jnp.asarray(w), ((0, 0), (0, 0), (0, to - cin), (0, 0)))
        params["input"]["conv"]["w"] = w
    return jax.tree.map(jnp.asarray, params)
