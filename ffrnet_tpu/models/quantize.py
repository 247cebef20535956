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
