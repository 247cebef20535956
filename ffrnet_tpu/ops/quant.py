"""Int8 quantized inference ops for the TPU MXU int8 path.

The v5e MXU executes int8 x int8 -> int32 dot products at 2x the bf16
rate (97.7 TOPS vs 49.6 TFLOP/s), the one remaining measured headroom on
the frozen IR-SE50 encoder after it reached ~80% of bf16 peak
(BASELINE.md "Encoder utilization"). This module provides an OPT-IN
weight+activation int8 path for frozen inference:

  - weights: symmetric per-output-channel int8 (scale = amax/127 over the
    receptive field), quantized ONCE on the host at load time;
  - activations: symmetric per-tensor dynamic int8 (scale from the batch
    amax inside the graph — no calibration data needed, matches the
    "dynamic quantization" recipe torch uses for frozen modules);
  - accumulation: int32 via `preferred_element_type`, dequantized into the
    caller's activation dtype with the fused (s_x * s_w[c]) multiplier.

Quantized weights live in the SAME pytree slot as the float weight — a
conv leaf `{"w": f32 HWIO}` becomes `{"w": {"q": int8, "scale": f32}}` —
so `ops.nn.conv2d` / `ops.nn.linear` transparently dispatch here and the
model `apply` functions need no changes. Quantization error is bounded by
tests (per-op relative error and end-to-end embedding cosine) and the
accuracy/perf tradeoff is measured in BASELINE.md; the default paths stay
bf16/fp32 everywhere.

The reference has no quantized path (frozen encoder runs fp32 CUDA,
pretrain/model_ir_se50.py:108-154); this is a beyond-reference serving
capability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_CONV_DN = ("NHWC", "HWIO", "NHWC")
_QMAX = 127.0
_EPS = 1e-12


def is_quantized(w) -> bool:
    """True if `w` is a quantized-weight dict (the pytree leaf contract)."""
    return isinstance(w, dict) and "q" in w and "scale" in w


def quantize_weight(w, *, channel_axis: int = -1):
    """Symmetric per-channel int8 quantization of a float weight.

    channel_axis: the output-channel axis (HWIO convs: -1; torch-layout
    Linear (out, in): 0). Returns {"q": int8, "scale": f32 (cout,)} with
    dequantization w ~= q * scale broadcast over channel_axis.
    """
    w = jnp.asarray(w, jnp.float32)
    axis = channel_axis % w.ndim
    reduce_axes = tuple(a for a in range(w.ndim) if a != axis)
    amax = jnp.max(jnp.abs(w), axis=reduce_axes)
    scale = jnp.maximum(amax, _EPS) / _QMAX
    shape = [1] * w.ndim
    shape[axis] = -1
    q = jnp.clip(jnp.round(w / scale.reshape(shape)), -_QMAX, _QMAX).astype(jnp.int8)
    return {"q": q, "scale": scale}


# Key temporarily inserted into a quantized weight leaf during an eager
# calibration pass (models/quantize.py::calibrate_activation_scales): a list
# that collects this site's per-batch activation amaxes. Matching collectors
# to sites BY LEAF — not by execution order or module-global state — makes
# calibration robust to any future reordering of `irse.apply`.
CALIBRATION_KEY = "_amax_collect"


def tree_has_quantized(tree) -> bool:
    """True if any leaf of `tree` is a quantized-weight dict."""
    return any(is_quantized(l) for l in
               jax.tree.leaves(tree, is_leaf=is_quantized))


def _quantize_activation(x, wq):
    """Symmetric per-tensor int8 activation quantization.

    Without a baked `wq["x_scale"]`: dynamic — scale from this batch's amax,
    an extra full read of the activation, and (NOTE) a batch-composition
    dependence: a sample's int8 embedding varies slightly with what else is
    in its batch, since every sample shares the batch-max scale. Calibrated
    static scales (models/quantize.py::calibrate_activation_scales) remove
    both the reduce and the nondeterminism; with them, values beyond the
    calibrated range saturate at +/-127 (standard PTQ clipping).
    """
    xf = x.astype(jnp.float32)
    x_scale = wq.get("x_scale")
    if x_scale is None:
        amax = jnp.max(jnp.abs(xf))
        scale = jnp.maximum(amax, _EPS) / _QMAX
    else:
        scale = jnp.maximum(jnp.asarray(x_scale, jnp.float32), _EPS)
    x_q = jnp.clip(jnp.round(xf / scale), -_QMAX, _QMAX)
    return x_q.astype(jnp.int8), scale


def _record_calibration_amax(x, wq) -> bool:
    """If `wq` carries an armed collector (and no baked scale yet), record
    this site's activation amax and return True — the caller then runs the
    op on the DEQUANTIZED float weight instead of the int8 path. The
    recorded amax is exactly what the dynamic path would use; running the
    op itself in float is the standard PTQ calibration recipe and is ~30x
    faster than emulated int8 on the CPU backend the eager calibration
    pass runs on (models/quantize.py::calibrate_activation_scales)."""
    rec = wq.get(CALIBRATION_KEY)
    if rec is None or "x_scale" in wq:
        return False
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    try:
        rec.append(float(amax))
    except jax.errors.ConcretizationTypeError as e:
        raise RuntimeError(
            "int8 activation calibration must run EAGERLY: the "
            "calibration pass reads concrete per-batch amax values, "
            "which a traced/jitted apply cannot provide. Call "
            "calibrate_activation_scales with an un-jitted apply "
            "path.") from e
    return True


def conv2d_int8(x, wq, b=None, *, stride=1, padding=0, groups=1):
    """Int8 x int8 -> int32 convolution with fused dequantization.

    Drop-in for ops.nn.conv2d when the weight leaf is quantized; output is
    in the activation dtype of `x`.
    """
    out_dtype = x.dtype
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    if _record_calibration_amax(x, wq):  # calibration: float fast path
        y = lax.conv_general_dilated(
            x.astype(jnp.float32), dequantize_weight(wq),
            window_strides=stride, padding=padding,
            dimension_numbers=_CONV_DN, feature_group_count=groups,
            preferred_element_type=jnp.float32)
    else:
        x_q, s_x = _quantize_activation(x, wq)
        y = lax.conv_general_dilated(
            x_q,
            wq["q"],
            window_strides=stride,
            padding=padding,
            dimension_numbers=_CONV_DN,
            feature_group_count=groups,
            preferred_element_type=jnp.int32,
        )
        deq = (s_x * wq["scale"]).astype(jnp.float32)
        y = y.astype(jnp.float32) * deq.reshape((1, 1, 1, -1))
    if b is not None:
        y = y + b.reshape((1, 1, 1, -1)).astype(jnp.float32)
    return y.astype(out_dtype)


def linear_int8(x, wq, b=None):
    """Int8 dense layer; weight in torch layout (out, in), per-out-channel scale."""
    out_dtype = x.dtype
    if _record_calibration_amax(x, wq):  # calibration: float fast path
        y = lax.dot_general(
            x.astype(jnp.float32), dequantize_weight(wq, channel_axis=0),
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        x_q, s_x = _quantize_activation(x, wq)
        y = lax.dot_general(
            x_q,
            wq["q"],
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (s_x * wq["scale"]).astype(jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out_dtype)


def dequantize_weight(wq, *, channel_axis: int = -1):
    """Recover the float weight (round-trip helper for tests/tools)."""
    q = wq["q"].astype(jnp.float32)
    shape = [1] * q.ndim
    shape[channel_axis % q.ndim] = -1
    return q * wq["scale"].reshape(shape)
