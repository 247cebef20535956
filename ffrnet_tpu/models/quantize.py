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


def _quantized_leaves(qparams):
    """All quantized weight leaves of an irse params tree (walker order;
    calibration matches collectors to sites BY LEAF, so the order here
    carries no semantic weight)."""
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
    encoder with a per-leaf amax collector armed (quant.CALIBRATION_KEY —
    each quantized weight leaf records the amaxes of ITS OWN activation, so
    there is no execution-order contract to drift), takes the max observed
    amax per site across batches, and returns a new tree whose quantized
    leaves carry `x_scale = margin * amax / 127` — removing the per-call
    amax reduce (a full activation read) from the compiled graph AND the
    dynamic path's batch-composition dependence; inference values beyond
    the calibrated range saturate at +/-127 (standard PTQ clipping —
    tests/test_quant.py bounds the held-out accuracy cost).

    `qparams` must be freshly quantized (no x_scale yet — a baked leaf's
    site never computes a dynamic amax to record). Standard post-training
    static quantization; the reference has no equivalent. Accuracy/perf
    deltas: BASELINE.md "Int8 encoder".
    """
    import jax.numpy as jnp

    from ffrnet_tpu.models import irse

    if any("x_scale" in s for s in _quantized_leaves(qparams)):
        raise ValueError("tree already has baked x_scale leaves; "
                         "re-quantize before calibrating")
    out = copy.deepcopy(qparams)
    sites = _quantized_leaves(out)
    for leaf in sites:
        leaf[quant.CALIBRATION_KEY] = []
    n_batches = 0
    try:
        for x in batches:
            irse.apply(out, state, x, training=False, **apply_kwargs)
            n_batches += 1
    finally:
        records = [leaf.pop(quant.CALIBRATION_KEY) for leaf in sites]
    if n_batches == 0:
        raise ValueError("calibration needs at least one batch")
    for leaf, rec in zip(sites, records):
        if len(rec) != n_batches:
            raise AssertionError(
                f"a quantized site recorded {len(rec)} amaxes over "
                f"{n_batches} calibration batches — its op did not run "
                "exactly once per apply")
        # device scalar, NOT a numpy host leaf: host leaves in jitted-call
        # args re-upload every call through the relay (CLAUDE.md)
        leaf["x_scale"] = jnp.float32(max(max(rec), 1e-12) * margin / 127.0)
    return out
