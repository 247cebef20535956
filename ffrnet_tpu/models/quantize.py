"""Post-training int8 quantization of the frozen IR-SE encoder.

Walks an `models.irse` params tree and replaces conv / linear weight
leaves with int8 quantized dicts (`ops/quant.py`), so the unmodified
`irse.apply` runs the MXU int8 path via the transparent dispatch in
`ops.nn.conv2d` / `ops.nn.linear`.

What is quantized (and what is deliberately not):
  - body unit convs (conv1/conv2/shortcut): the FLOP mass — yes;
  - the (512, 25088) output Linear: yes by default (flag);
  - the stem conv: NO — cin=3 makes it layout-bound, not FLOP-bound
    (measured 2.9 TF/s floor, BASELINE.md), and the first layer is the
    most quantization-sensitive, so int8 buys nothing there;
  - SE fc1/fc2: NO — (C, C/16) gates are negligible FLOPs and sigmoid
    gates amplify error;
  - BN / PReLU params: NO — folded per-channel affines stay float.

The encoder is frozen in FFR-Net training (reference models/trainer.py:
62-63,79) and the reference has no quantized path; this is an opt-in
beyond-reference serving/eval capability. Accuracy and throughput deltas
are measured in BASELINE.md ("Int8 encoder"); default paths stay bf16.
"""

from __future__ import annotations

import copy

import numpy as np

from ffrnet_tpu.ops import quant


def quantize_encoder_params(params, *, quantize_linear: bool = True):
    """Return a new irse params tree with int8 conv/linear weight leaves.

    `params` is the tree produced by `irse.init` or the checkpoint
    converter. Idempotent on already-quantized leaves. Quantize AFTER any
    dtype cast (`tree_cast_floats`) so scales are computed from the
    weights actually served.
    """
    out = copy.copy(params)
    out["body"] = []
    for unit in params["body"]:
        u = copy.deepcopy(unit)
        for path in (("res", "conv1"), ("res", "conv2"), ("shortcut", "conv")):
            node = u
            for k in path[:-1]:
                node = node.get(k)
                if node is None:
                    break
            else:
                conv = node.get(path[-1])
                if conv is not None and not quant.is_quantized(conv["w"]):
                    conv["w"] = quant.quantize_weight(conv["w"], channel_axis=-1)
        out["body"].append(u)
    if quantize_linear:
        outp = copy.deepcopy(params["output"])
        if not quant.is_quantized(outp["linear"]["w"]):
            outp["linear"]["w"] = quant.quantize_weight(
                outp["linear"]["w"], channel_axis=0)
        out["output"] = outp
    return out


def _quantized_leaves_in_exec_order(qparams):
    """Quantized weight leaves in `irse.apply` execution order: per unit
    shortcut -> conv1 -> conv2 (irse.py::_apply_unit computes the shortcut
    first), then the output linear."""
    leaves = []
    for unit in qparams["body"]:
        if "shortcut" in unit and quant.is_quantized(unit["shortcut"]["conv"]["w"]):
            leaves.append(unit["shortcut"]["conv"]["w"])
        for name in ("conv1", "conv2"):
            if quant.is_quantized(unit["res"][name]["w"]):
                leaves.append(unit["res"][name]["w"])
    if quant.is_quantized(qparams["output"]["linear"]["w"]):
        leaves.append(qparams["output"]["linear"]["w"])
    return leaves


def calibrate_activation_scales(qparams, state, batches, *, margin: float = 1.0,
                                **apply_kwargs):
    """Bake static per-tensor activation scales into a quantized tree.

    Runs each calibration batch through the EAGER (un-jitted) quantized
    encoder with the dynamic-quant collector armed, takes the max observed
    activation amax per conv/linear site across batches, and returns a new
    tree whose quantized leaves carry `x_scale = margin * amax / 127` —
    removing the per-call amax reduce (a full activation read) from the
    compiled graph; out-of-range inference values saturate at +/-127.

    `qparams` must be freshly quantized (no x_scale yet — baked leaves
    skip the collector and would desynchronize the site ordering).
    Standard post-training static quantization; the reference has no
    equivalent. Accuracy/perf deltas: BASELINE.md "Int8 encoder".
    """
    from ffrnet_tpu.models import irse

    sites = _quantized_leaves_in_exec_order(qparams)
    if any("x_scale" in s for s in sites):
        raise ValueError("tree already has baked x_scale leaves; "
                         "re-quantize before calibrating")
    per_batch = []
    for x in batches:
        quant._calibration_amaxes = rec = []
        try:
            irse.apply(qparams, state, x, training=False, **apply_kwargs)
        finally:
            quant._calibration_amaxes = None
        if len(rec) != len(sites):
            raise AssertionError(
                f"calibration recorded {len(rec)} amaxes for {len(sites)} "
                "quantized sites — apply order drifted from the walker")
        per_batch.append(rec)
    amax = np.max(np.asarray(per_batch, np.float64), axis=0)

    import jax.numpy as jnp

    out = copy.deepcopy(qparams)
    for leaf, a in zip(_quantized_leaves_in_exec_order(out), amax):
        # device scalar, NOT a numpy host leaf: host leaves in jitted-call
        # args re-upload every call through the relay (CLAUDE.md)
        leaf["x_scale"] = jnp.float32(max(a, 1e-12) * margin / 127.0)
    return out
