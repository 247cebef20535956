"""Convert PyTorch state_dicts <-> ffrnet_tpu param/state pytrees.

Key layout mapping (see ffrnet_tpu/ops/nn.py docstring):
  * Conv2d weight  OIHW -> HWIO (transpose (2, 3, 1, 0))
  * Linear weight  kept in torch (out, in) orientation — straight copy
  * SE 1x1 convs   (out, in, 1, 1) -> (out, in) dense matrices
  * BatchNorm      weight/bias -> params.scale/bias,
                   running_mean/var -> state.mean/var
  * The encoder's flatten happens in torch C-major order on our side too
    (models/irse.py apply), so output_layer Linear weights copy unchanged.

State-dict key schemas follow the reference modules:
  Backbone  — pretrain/model_ir_se50.py:108-134
  RecNet    — models/recnet.py:356-396 (ConvLayer children are
              `conv2d`/`norm.norm`/`relu.func`, models/recnet.py:52-70)

The converters are bidirectional so native checkpoints can be exported to
`.pth.gzip` files loadable by the PyTorch reference (`save_pth`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from ffrnet_tpu.models import irse
from ffrnet_tpu.models.recnet import RecNetConfig

Array = np.ndarray
SD = Dict[str, Array]


def _np(x) -> Array:
    arr = np.asarray(x)
    return arr


def _conv_w(sd: SD, key: str) -> Array:
    return _np(sd[key]).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _conv_w_back(w) -> Array:
    return np.asarray(w).transpose(3, 2, 0, 1)  # HWIO -> OIHW


def _bn(sd: SD, prefix: str) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    state = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, state


def _bn_back(out: SD, prefix: str, params, state) -> None:
    out[f"{prefix}.weight"] = np.asarray(params["scale"])
    out[f"{prefix}.bias"] = np.asarray(params["bias"])
    out[f"{prefix}.running_mean"] = np.asarray(state["mean"])
    out[f"{prefix}.running_var"] = np.asarray(state["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


# ---------------------------------------------------------------------------
# Backbone (IR-SE)
# ---------------------------------------------------------------------------


def backbone_from_torch(sd: SD, *, num_layers: int = 50, mode: str = "ir_se"):
    """torch Backbone state_dict -> (params, state) for models/irse.apply."""
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}

    bn_p, bn_s = _bn(sd, "input_layer.1")
    params["input"] = {
        "conv": {"w": _conv_w(sd, "input_layer.0.weight")},
        "bn": bn_p,
        "prelu": {"slope": _np(sd["input_layer.2.weight"])},
    }
    state["input"] = {"bn": bn_s}

    units = irse.unit_configs(num_layers)
    body_p, body_s = [], []
    for i, (in_ch, depth, _stride) in enumerate(units):
        up: Dict[str, Any] = {}
        us: Dict[str, Any] = {}
        if in_ch != depth:
            sbn_p, sbn_s = _bn(sd, f"body.{i}.shortcut_layer.1")
            up["shortcut"] = {
                "conv": {"w": _conv_w(sd, f"body.{i}.shortcut_layer.0.weight")},
                "bn": sbn_p,
            }
            us["shortcut"] = {"bn": sbn_s}
        bn1_p, bn1_s = _bn(sd, f"body.{i}.res_layer.0")
        bn2_p, bn2_s = _bn(sd, f"body.{i}.res_layer.4")
        up["res"] = {
            "bn1": bn1_p,
            "conv1": {"w": _conv_w(sd, f"body.{i}.res_layer.1.weight")},
            "prelu": {"slope": _np(sd[f"body.{i}.res_layer.2.weight"])},
            "conv2": {"w": _conv_w(sd, f"body.{i}.res_layer.3.weight")},
            "bn2": bn2_p,
        }
        us["res"] = {"bn1": bn1_s, "bn2": bn2_s}
        if mode == "ir_se":
            up["res"]["se"] = {
                "fc1": {"w": _np(sd[f"body.{i}.res_layer.5.fc1.weight"])[:, :, 0, 0]},
                "fc2": {"w": _np(sd[f"body.{i}.res_layer.5.fc2.weight"])[:, :, 0, 0]},
            }
        body_p.append(up)
        body_s.append(us)
    params["body"], state["body"] = body_p, body_s

    params["bn"], state["bn"] = _bn(sd, "bn")

    bn2d_p, bn2d_s = _bn(sd, "output_layer.0")
    bn1d_p, bn1d_s = _bn(sd, "output_layer.4")
    params["output"] = {
        "bn2d": bn2d_p,
        "linear": {
            "w": _np(sd["output_layer.3.weight"]),
            "b": _np(sd["output_layer.3.bias"]),
        },
        "bn1d": bn1d_p,
    }
    state["output"] = {"bn2d": bn2d_s, "bn1d": bn1d_s}
    return params, state


def backbone_to_torch(params, state, *, num_layers: int = 50, mode: str = "ir_se") -> SD:
    out: SD = {}
    out["input_layer.0.weight"] = _conv_w_back(params["input"]["conv"]["w"])
    _bn_back(out, "input_layer.1", params["input"]["bn"], state["input"]["bn"])
    out["input_layer.2.weight"] = np.asarray(params["input"]["prelu"]["slope"])

    units = irse.unit_configs(num_layers)
    for i, (in_ch, depth, _stride) in enumerate(units):
        up, us = params["body"][i], state["body"][i]
        if in_ch != depth:
            out[f"body.{i}.shortcut_layer.0.weight"] = _conv_w_back(
                up["shortcut"]["conv"]["w"])
            _bn_back(out, f"body.{i}.shortcut_layer.1",
                     up["shortcut"]["bn"], us["shortcut"]["bn"])
        _bn_back(out, f"body.{i}.res_layer.0", up["res"]["bn1"], us["res"]["bn1"])
        out[f"body.{i}.res_layer.1.weight"] = _conv_w_back(up["res"]["conv1"]["w"])
        out[f"body.{i}.res_layer.2.weight"] = np.asarray(up["res"]["prelu"]["slope"])
        out[f"body.{i}.res_layer.3.weight"] = _conv_w_back(up["res"]["conv2"]["w"])
        _bn_back(out, f"body.{i}.res_layer.4", up["res"]["bn2"], us["res"]["bn2"])
        if mode == "ir_se":
            out[f"body.{i}.res_layer.5.fc1.weight"] = np.asarray(
                up["res"]["se"]["fc1"]["w"])[:, :, None, None]
            out[f"body.{i}.res_layer.5.fc2.weight"] = np.asarray(
                up["res"]["se"]["fc2"]["w"])[:, :, None, None]

    _bn_back(out, "bn", params["bn"], state["bn"])
    _bn_back(out, "output_layer.0", params["output"]["bn2d"], state["output"]["bn2d"])
    out["output_layer.3.weight"] = np.asarray(params["output"]["linear"]["w"])
    out["output_layer.3.bias"] = np.asarray(params["output"]["linear"]["b"])
    _bn_back(out, "output_layer.4", params["output"]["bn1d"], state["output"]["bn1d"])
    return out


# ---------------------------------------------------------------------------
# RecNet
# ---------------------------------------------------------------------------


def _conv_layer_from(sd: SD, prefix: str):
    """Reference ConvLayer (models/recnet.py:52-70), norm='bn', relu='prelu'."""
    bn_p, bn_s = _bn(sd, f"{prefix}.norm.norm")
    params = {
        "conv": {"w": _conv_w(sd, f"{prefix}.conv2d.weight")},
        "norm": bn_p,
        "relu": {"slope": _np(sd[f"{prefix}.relu.func.weight"])},
    }
    if f"{prefix}.conv2d.bias" in sd:
        params["conv"]["b"] = _np(sd[f"{prefix}.conv2d.bias"])
    return params, {"norm": bn_s}


def _conv_layer_back(out: SD, prefix: str, params, state) -> None:
    out[f"{prefix}.conv2d.weight"] = _conv_w_back(params["conv"]["w"])
    if "b" in params["conv"]:
        out[f"{prefix}.conv2d.bias"] = np.asarray(params["conv"]["b"])
    _bn_back(out, f"{prefix}.norm.norm", params["norm"], state["norm"])
    out[f"{prefix}.relu.func.weight"] = np.asarray(params["relu"]["slope"])


def _res_block_from(sd: SD, prefix: str):
    p1, s1 = _conv_layer_from(sd, f"{prefix}.conv1")
    p2, s2 = _conv_layer_from(sd, f"{prefix}.conv2")
    return {"conv1": p1, "conv2": p2}, {"conv1": s1, "conv2": s2}


def _res_block_back(out: SD, prefix: str, params, state) -> None:
    _conv_layer_back(out, f"{prefix}.conv1", params["conv1"], state["conv1"])
    _conv_layer_back(out, f"{prefix}.conv2", params["conv2"], state["conv2"])


def recnet_from_torch(sd: SD, cfg: Optional[RecNetConfig] = None):
    """torch RecNet state_dict -> (params, state) for models/recnet.apply.

    The key schema is the reference's fixed RecNet layout. When a cfg is
    given it is VALIDATED against the checkpoint: a classifier whose class
    count disagrees with cfg.num_classes fails here with a clear message
    rather than deep inside the first jitted step. cfg=None (e.g. resume,
    where the checkpoint is self-describing) skips the check."""
    if cfg is not None:
        cls_w = sd.get("classifier.weight")
        if cls_w is not None and cfg.num_classes != cls_w.shape[0]:
            raise ValueError(
                f"checkpoint classifier has {cls_w.shape[0]} classes but "
                f"cfg.num_classes={cfg.num_classes} — pass the matching "
                "RecNetConfig (the reference default is 10575)")
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}

    # Conv4Space: Sequential [Conv, Res, Conv, Res, Conv, Res, Sigmoid]
    space_p, space_s = {}, {}
    for name, idx in [("c0", 0), ("r0", 1), ("c1", 2), ("r1", 3), ("c2", 4), ("r2", 5)]:
        loader = _conv_layer_from if name.startswith("c") else _res_block_from
        space_p[name], space_s[name] = loader(sd, f"Conv4Space.{idx}")
    params["conv4space"], state["conv4space"] = space_p, space_s

    # Conv4Channel: [Lin, PReLU, Lin, Lin, PReLU, Lin, Lin, PReLU, Lin, Sigmoid]
    chan_p: Dict[str, Any] = {}
    lin_idx = [0, 2, 3, 5, 6, 8]
    for i, idx in enumerate(lin_idx):
        chan_p[f"lin{i}"] = {
            "w": _np(sd[f"Conv4Channel.{idx}.weight"]),
            "b": _np(sd[f"Conv4Channel.{idx}.bias"]),
        }
    for i, idx in enumerate([1, 4, 7]):
        chan_p[f"prelu{i}"] = {"slope": _np(sd[f"Conv4Channel.{idx}.func.weight"])}
    params["conv4channel"] = chan_p

    fm_c, fm_cs = _conv_layer_from(sd, "ChannelFlipMerge.0")
    fm_r, fm_rs = _res_block_from(sd, "ChannelFlipMerge.1")
    params["flipmerge"], state["flipmerge"] = {"c": fm_c, "r": fm_r}, {"c": fm_cs, "r": fm_rs}

    mg_c, mg_cs = _conv_layer_from(sd, "Conv4Merge.0")
    mg_r, mg_rs = _res_block_from(sd, "Conv4Merge.1")
    params["merge"], state["merge"] = {"c": mg_c, "r": mg_r}, {"c": mg_cs, "r": mg_rs}

    params["classifier"] = {"w": _np(sd["classifier.weight"])}
    return params, state


def recnet_to_torch(params, state) -> SD:
    out: SD = {}
    for name, idx in [("c0", 0), ("r0", 1), ("c1", 2), ("r1", 3), ("c2", 4), ("r2", 5)]:
        back = _conv_layer_back if name.startswith("c") else _res_block_back
        back(out, f"Conv4Space.{idx}", params["conv4space"][name],
             state["conv4space"][name])
    lin_idx = [0, 2, 3, 5, 6, 8]
    for i, idx in enumerate(lin_idx):
        out[f"Conv4Channel.{idx}.weight"] = np.asarray(
            params["conv4channel"][f"lin{i}"]["w"])
        out[f"Conv4Channel.{idx}.bias"] = np.asarray(
            params["conv4channel"][f"lin{i}"]["b"])
    for i, idx in enumerate([1, 4, 7]):
        out[f"Conv4Channel.{idx}.func.weight"] = np.asarray(
            params["conv4channel"][f"prelu{i}"]["slope"])
    _conv_layer_back(out, "ChannelFlipMerge.0", params["flipmerge"]["c"],
                     state["flipmerge"]["c"])
    _res_block_back(out, "ChannelFlipMerge.1", params["flipmerge"]["r"],
                    state["flipmerge"]["r"])
    _conv_layer_back(out, "Conv4Merge.0", params["merge"]["c"], state["merge"]["c"])
    _res_block_back(out, "Conv4Merge.1", params["merge"]["r"], state["merge"]["r"])
    out["classifier.weight"] = np.asarray(params["classifier"]["w"])
    return out
