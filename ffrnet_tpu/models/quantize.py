"""Post-training int8 quantization of the frozen IR-SE encoder and RecNet.

Walks a `models.irse` / `models.recnet` params tree and replaces conv /
linear weight leaves with int8 quantized dicts (`ops/quant.py`), so the
unmodified `irse.apply` / `recnet.apply` runs the MXU int8 path via the
transparent dispatch in `ops.nn.conv2d` / `ops.nn.linear`.

Encoder — what is quantized (and what is deliberately not):
  - body unit convs (conv1/conv2/shortcut): the FLOP mass — yes;
  - the (512, 25088) output Linear: yes by default (flag);
  - the stem conv: NO — cin=3 makes it layout-bound, not FLOP-bound
    (measured 2.9 TF/s floor, BASELINE.md), and the first layer is the
    most quantization-sensitive, so int8 buys nothing there;
  - SE fc1/fc2: NO — (C, C/16) gates are negligible FLOPs and sigmoid
    gates amplify error;
  - BN / PReLU params: NO — folded per-channel affines stay float.

RecNet (reference models/recnet.py:347-429) — what is quantized:
  - the conv chains, which carry the head's conv FLOP mass: Conv4Space
    (c0/r0/c1/r1/c2/r2), ChannelFlipMerge and Conv4Merge (conv + res
    each) — 15 conv sites;
  - NOT the Conv4Channel linears: the factored path multiplies the
    (32,32) weight pairs together at trace time (recnet.py::
    _conv4channel_factored), which int8 weight dicts would break, and
    the whole branch is ~1 GFLOP/batch — noise;
  - NOT the rectification matmuls (activation x activation — there is
    no weight to quantize) and NOT the CosFace classifier (cosine
    normalization amplifies error; it only runs in training anyway).

The encoder is frozen in FFR-Net training (reference models/trainer.py:
62-63,79) and the reference has no quantized path; this is an opt-in
beyond-reference serving/eval capability. Accuracy and throughput deltas
are measured in BASELINE.md ("Int8 encoder" / numbers-of-record); default
paths stay bf16.
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


def quantized_leaf_items(tree):
    """[(path, leaf)] for every quantized weight leaf of ANY params tree.

    path is the '/'-joined key/index trail (e.g. "body/3/res/conv1/w") —
    the STABLE identity of a quantization site. The scale cache
    (tools/int8_cache.py) keys scales by these paths, so a refactor that
    reorders the walk cannot silently mis-assign scales across sites;
    only a rename/move of the site itself invalidates its entry (which is
    exactly when its scale should be re-derived anyway). Walk order is
    deterministic (sorted dict keys, list/tuple index order) but carries
    no semantic weight anywhere.
    """
    items = []

    def walk(node, path):
        if quant.is_quantized(node):
            items.append(("/".join(map(str, path)), node))
            return
        if isinstance(node, dict):
            for k in sorted(node):
                walk(node[k], path + (k,))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, path + (i,))

    walk(tree, ())
    return items


def tree_quantized_leaves(tree):
    """All quantized weight leaves of ANY params tree (deterministic walk;
    see quantized_leaf_items for the path-keyed variant)."""
    return [leaf for _, leaf in quantized_leaf_items(tree)]


# irse-shaped alias kept for older call sites; identical generic walk —
# calibration matches collectors to sites BY LEAF and the scale cache
# matches BY PATH, so no caller depends on a particular order.
_quantized_leaves = tree_quantized_leaves


def _quantize_conv_weights(node):
    """Recursively quantize every conv-layer weight (`{"conv": {"w": ...}}`
    nodes) in a params subtree, in place. Per-out-channel scales on the
    HWIO output axis."""
    if not isinstance(node, dict):
        return
    conv = node.get("conv")
    if (isinstance(conv, dict) and "w" in conv
            and not quant.is_quantized(conv["w"])
            and getattr(conv["w"], "ndim", 0) == 4):
        conv["w"] = quant.quantize_weight(conv["w"], channel_axis=-1)
    for k, v in node.items():
        if k != "conv":
            _quantize_conv_weights(v)


RECNET_INT8_SITES = ("conv4space", "flipmerge", "merge")


def quantize_recnet_params(params, *, sites=RECNET_INT8_SITES):
    """Return a new recnet params tree with int8 conv weight leaves.

    Quantizes the conv chains only (module docstring has the site policy);
    Conv4Channel linears, PReLU/BN params, and the classifier stay float.
    Idempotent on already-quantized leaves. Quantize AFTER any dtype cast
    so scales are computed from the weights actually served.
    """
    out = copy.copy(params)
    for site in sites:
        sub = copy.deepcopy(params[site])
        _quantize_conv_weights(sub)
        out[site] = sub
    return out


def _bake_static_scales(sites, apply_batch, batches, *, margin: float):
    """Calibration engine shared by the irse/recnet entry points.

    Arms a per-leaf amax collector on every quantized leaf in `sites`,
    runs `apply_batch(x)` EAGERLY once per calibration batch (each
    quantized op records its own activation amax and then runs on the
    dequantized float weight — standard PTQ, ~30x faster than emulated
    int8 on the CPU backend), and bakes `x_scale = margin * amax / 127`
    into each leaf in place. Callers deepcopy first.
    """
    import jax.numpy as jnp

    if margin <= 0:
        # a zero/negative margin would bake x_scale=0 into every leaf,
        # saturating all activations to +/-127 and silently producing
        # garbage embeddings (review finding, round 5)
        raise ValueError(f"margin must be positive, got {margin}")
    if any("x_scale" in s for s in sites):
        raise ValueError("tree already has baked x_scale leaves; "
                         "re-quantize before calibrating")
    if not sites:
        raise ValueError("no quantized leaves to calibrate")
    for leaf in sites:
        leaf[quant.CALIBRATION_KEY] = []
    n_batches = 0
    try:
        for x in batches:
            apply_batch(x)
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

    `capture_featmaps`: optional list; when given, each calibration
    batch's (N, 7, 7, 512) encoder feature map is appended — the natural
    calibration inputs for a downstream quantized RecNet, at no extra
    eager encoder pass (api.FFRNet.calibrate_int8 chains them).
    """
    from ffrnet_tpu.models import irse

    capture_featmaps = apply_kwargs.pop("capture_featmaps", None)
    out = copy.deepcopy(qparams)

    def apply_batch(x):
        featmap, _, _ = irse.apply(out, state, x, training=False,
                                   **apply_kwargs)
        if capture_featmaps is not None:
            capture_featmaps.append(featmap)

    _bake_static_scales(_quantized_leaves(out), apply_batch, batches,
                        margin=margin)
    return out


def calibrate_recnet_activation_scales(qparams, state, batches, *,
                                       cfg=None, margin: float = 1.0,
                                       **apply_kwargs):
    """Bake static activation scales into a quantized RecNet tree.

    `batches`: iterable of (N, 7, 7, 512) NHWC frozen-encoder feature
    maps (capture them from the encoder calibration pass via
    `calibrate_activation_scales(..., capture_featmaps=[])`, or run the
    float encoder over the calibration images). Same eager host-CPU
    recipe, semantics, and saturation behavior as the encoder version.
    """
    from ffrnet_tpu.models import recnet

    if cfg is None:
        cfg = recnet.RecNetConfig()
    out = copy.deepcopy(qparams)
    _bake_static_scales(
        tree_quantized_leaves(out),
        lambda fm: recnet.apply(out, state, fm, cfg=cfg, training=False,
                                **apply_kwargs),
        batches, margin=margin)
    return out
