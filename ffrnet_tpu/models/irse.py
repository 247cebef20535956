"""IR-SE ResNet face encoder (ArcFace-style), TPU-native NHWC rebuild.

Capability parity with the reference `Backbone`
(pretrain/model_ir_se50.py:108-154):

  stem:   Conv3x3(3->64, s1, zero-pad 1, no bias) -> BN -> PReLU(64)
  body:   bottleneck units per `num_layers` in {50, 100, 152}; each unit is
          BN -> Conv3x3 -> PReLU -> Conv3x3(stride) -> BN [-> SE(r=16)]
          plus a shortcut (stride-slice identity when in==depth, else
          Conv1x1(stride)+BN projection)   (model_ir_se50.py:38-76)
  heads:  featmap y = BN2d(body)                        (N, 7, 7, 512)
          embed   = l2_norm(BN1d(Linear(Flatten(Dropout(BN2d(body))))))
          (model_ir_se50.py:121-141; Flatten is torch C-major order —
          preserved here so imported Linear weights match bit-for-bit)

The encoder is frozen in FFR-Net training (models/trainer.py:62-63,79) and
always runs in inference mode (BN running stats, dropout off); a `training`
flag is still threaded for completeness.

Functional API:
  init(key, num_layers=50, mode='ir_se')            -> (params, state)
  apply(params, state, x_nhwc, training=False, rng=None)
                                                    -> (featmap, embed, state)
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ffrnet_tpu.ops import nn as ops

# (in_channel, depth, num_units) per stage; every stage opens with stride 2.
_BLOCK_SPECS = {
    50: [(64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3)],
    100: [(64, 64, 3), (64, 128, 13), (128, 256, 30), (256, 512, 3)],
    152: [(64, 64, 3), (64, 128, 8), (128, 256, 36), (256, 512, 3)],
}

EMBED_DIM = 512
FEAT_HW = 7


def unit_configs(num_layers: int) -> List[Tuple[int, int, int]]:
    """Flat list of (in_channel, depth, stride) over all bottleneck units."""
    units = []
    for in_ch, depth, num in _BLOCK_SPECS[num_layers]:
        units.append((in_ch, depth, 2))
        units.extend((depth, depth, 1) for _ in range(num - 1))
    return units


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_bn(channels, dtype):
    return (
        {"scale": jnp.ones((channels,), dtype), "bias": jnp.zeros((channels,), dtype)},
        {"mean": jnp.zeros((channels,), dtype), "var": jnp.ones((channels,), dtype)},
    )


def _init_conv(key, kh, kw, cin, cout, dtype):
    fan_in = cin * kh * kw
    return {"w": ops.kaiming_uniform(key, (kh, kw, cin, cout), fan_in, dtype=dtype)}


def _init_unit(key, in_ch, depth, stride, mode, dtype):
    ks = jax.random.split(key, 5)
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    if in_ch != depth:
        bn_p, bn_s = _init_bn(depth, dtype)
        params["shortcut"] = {"conv": _init_conv(ks[0], 1, 1, in_ch, depth, dtype), "bn": bn_p}
        state["shortcut"] = {"bn": bn_s}
    bn1_p, bn1_s = _init_bn(in_ch, dtype)
    bn2_p, bn2_s = _init_bn(depth, dtype)
    params["res"] = {
        "bn1": bn1_p,
        "conv1": _init_conv(ks[1], 3, 3, in_ch, depth, dtype),
        "prelu": {"slope": jnp.full((depth,), 0.25, dtype)},
        "conv2": _init_conv(ks[2], 3, 3, depth, depth, dtype),
        "bn2": bn2_p,
    }
    state["res"] = {"bn1": bn1_s, "bn2": bn2_s}
    if mode == "ir_se":
        r = depth // 16
        params["res"]["se"] = {
            "fc1": {"w": ops.kaiming_uniform(ks[3], (r, depth), depth, dtype=dtype)},
            "fc2": {"w": ops.kaiming_uniform(ks[4], (depth, r), r, dtype=dtype)},
        }
    return params, state


def init(key, *, num_layers: int = 50, mode: str = "ir_se", drop_ratio: float = 0.6,
         dtype=jnp.float32):
    """Random-init params/state (pretrained weights normally imported instead)."""
    assert num_layers in _BLOCK_SPECS and mode in ("ir", "ir_se")
    units = unit_configs(num_layers)
    keys = jax.random.split(key, len(units) + 3)

    stem_bn_p, stem_bn_s = _init_bn(64, dtype)
    params: Dict[str, Any] = {
        "input": {
            "conv": _init_conv(keys[0], 3, 3, 3, 64, dtype),
            "bn": stem_bn_p,
            "prelu": {"slope": jnp.full((64,), 0.25, dtype)},
        }
    }
    state: Dict[str, Any] = {"input": {"bn": stem_bn_s}}

    body_p, body_s = [], []
    for i, (in_ch, depth, stride) in enumerate(units):
        p, s = _init_unit(keys[i + 1], in_ch, depth, stride, mode, dtype)
        body_p.append(p)
        body_s.append(s)
    params["body"], state["body"] = body_p, body_s

    feat_bn_p, feat_bn_s = _init_bn(EMBED_DIM, dtype)
    params["bn"], state["bn"] = feat_bn_p, feat_bn_s

    out_bn2d_p, out_bn2d_s = _init_bn(EMBED_DIM, dtype)
    out_bn1d_p, out_bn1d_s = _init_bn(EMBED_DIM, dtype)
    klin, kb = jax.random.split(keys[-1])
    in_features = EMBED_DIM * FEAT_HW * FEAT_HW
    params["output"] = {
        "bn2d": out_bn2d_p,
        "linear": {
            "w": ops.kaiming_uniform(klin, (EMBED_DIM, in_features), in_features, dtype=dtype),
            "b": ops.bias_uniform(kb, (EMBED_DIM,), in_features, dtype),
        },
        "bn1d": out_bn1d_p,
    }
    state["output"] = {"bn2d": out_bn2d_s, "bn1d": out_bn1d_s}
    return params, state


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _bn(params, state, x, training):
    y, mean, var = ops.batch_norm(
        x, params["scale"], params["bias"], state["mean"], state["var"],
        training=training,
    )
    return y, {"mean": mean, "var": var}


def _se(params, x, impl: str = "xla"):
    """Squeeze-excitation gate (model_ir_se50.py:18-36)."""
    if impl == "pallas":
        from ffrnet_tpu.ops.pallas.se_gating import se_gating_pallas

        return se_gating_pallas(x, params["fc1"]["w"], params["fc2"]["w"])
    pooled = ops.global_avg_pool(x)  # (N, C)
    g = ops.relu(ops.linear(pooled, params["fc1"]["w"]))
    g = jax.nn.sigmoid(ops.linear(g, params["fc2"]["w"]))
    return x * g[:, None, None, :]


def _apply_unit(params, state, x, stride, mode, training, se_impl="xla"):
    new_state: Dict[str, Any] = {}
    if "shortcut" in params:
        sc = ops.conv2d(x, params["shortcut"]["conv"]["w"],
                        params["shortcut"]["conv"].get("b"),
                        stride=stride, padding=0)
        sc, bn_s = _bn(params["shortcut"]["bn"], state["shortcut"]["bn"], sc, training)
        new_state["shortcut"] = {"bn": bn_s}
    else:
        sc = ops.stride_pool(x, stride)

    r = params["res"]
    y, bn1_s = _bn(r["bn1"], state["res"]["bn1"], x, training)
    y = ops.conv2d(y, r["conv1"]["w"], r["conv1"].get("b"), stride=1, padding=1)
    y = ops.prelu(y, r["prelu"]["slope"], axis=-1)
    y = ops.conv2d(y, r["conv2"]["w"], r["conv2"].get("b"), stride=stride,
                   padding=1)
    y, bn2_s = _bn(r["bn2"], state["res"]["bn2"], y, training)
    if mode == "ir_se":
        y = _se(r["se"], y, impl=se_impl)
    new_state["res"] = {"bn1": bn1_s, "bn2": bn2_s}
    return y + sc, new_state


def apply(params, state, x, *, num_layers: int = 50, mode: str = "ir_se",
          drop_ratio: float = 0.6, training: bool = False, rng=None,
          se_impl: str = "xla"):
    """Forward pass.

    x: (N, 112, 112, 3) NHWC in [-1, 1], BGR channel order (the reference's
    data protocol re-merges PIL channels to BGR, data/dataset.py:137-140).

    Returns (featmap (N,7,7,512), embed (N,512) L2-normalized, new_state).
    """
    units = unit_configs(num_layers)
    # fail fast on params/arg mismatches (round-5 review): a 100-layer
    # tree under num_layers=50 would silently zip-truncate to 24 units
    # with wrong stride placement, and an ir_se tree under mode='ir'
    # would silently skip every SE gate — both produce plausible-looking
    # but wrong embeddings
    if len(params["body"]) != len(units):
        raise ValueError(
            f"params tree has {len(params['body'])} residual units but "
            f"num_layers={num_layers} expects {len(units)} — pass the "
            "num_layers the tree was initialized with")
    has_se = "se" in params["body"][0]["res"]
    if (mode == "ir_se") != has_se:
        raise ValueError(
            f"mode={mode!r} does not match the params tree (which "
            f"{'has' if has_se else 'lacks'} SE blocks)")
    if training and rng is None and drop_ratio > 0:
        raise ValueError(
            "training=True needs an rng for dropout (drop_ratio="
            f"{drop_ratio}); silently disabling it would train under a "
            "different regime than requested")
    new_state: Dict[str, Any] = {}

    w_in = params["input"]["conv"]["w"]
    if w_in.shape[2] > x.shape[-1]:
        if x.shape[-1] != 3:
            # only the documented 3-channel stem input is silently padded;
            # anything else (e.g. a grayscale batch) is a caller bug that
            # must keep raising, not produce plausible-looking embeddings
            # (ADVICE r4)
            raise ValueError(
                f"channel-padded stem expects 3-channel input, got "
                f"{x.shape[-1]} channels (weight expects {w_in.shape[2]})")
        # channel-padded stem (models/optimize.py pad_stem_input_channels):
        # the weight tree carries zero-padded input channels; pad x to
        # match. Identical math (zero channels contribute exactly 0);
        # measured 3x on the isolated stem conv — the C=3 layout starves
        # the MXU (BASELINE.md round-4 "Stem channel-pad duel").
        x = jnp.pad(x, ((0, 0),) * 3 + ((0, w_in.shape[2] - x.shape[-1]),))
    y = ops.conv2d(x, w_in,
                   params["input"]["conv"].get("b"), stride=1, padding=1)
    y, bn_s = _bn(params["input"]["bn"], state["input"]["bn"], y, training)
    y = ops.prelu(y, params["input"]["prelu"]["slope"], axis=-1)
    new_state["input"] = {"bn": bn_s}

    body_state = []
    for p, s, (_, _, stride) in zip(params["body"], state["body"], units):
        y, us = _apply_unit(p, s, y, stride, mode, training, se_impl)
        body_state.append(us)
    new_state["body"] = body_state

    featmap, fm_bn_s = _bn(params["bn"], state["bn"], y, training)
    new_state["bn"] = fm_bn_s

    # Embedding head. Flatten in torch C-major (C,H,W) order for weight parity.
    h, bn2d_s = _bn(params["output"]["bn2d"], state["output"]["bn2d"], y, training)
    h = ops.dropout(h, drop_ratio, rng=rng, training=training)
    n = h.shape[0]
    h = h.transpose(0, 3, 1, 2).reshape(n, -1)  # NHWC -> NCHW -> (N, C*H*W)
    h = ops.linear(h, params["output"]["linear"]["w"], params["output"]["linear"]["b"])
    h, bn1d_s = _bn(params["output"]["bn1d"], state["output"]["bn1d"], h, training)
    new_state["output"] = {"bn2d": bn2d_s, "bn1d": bn1d_s}

    embed = ops.l2_norm_div(h, axis=1)
    return featmap, embed, new_state
