"""Int8 quantized inference path (ops/quant.py, models/quantize.py).

The reference has no quantized path (the frozen encoder runs fp32 CUDA,
pretrain/model_ir_se50.py:108-154); these tests bound the opt-in int8
path's error per-op and end-to-end and pin the transparent pytree-leaf
dispatch contract in ops.nn.conv2d / ops.nn.linear.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ffrnet_tpu.models import irse
from ffrnet_tpu.models.quantize import quantize_encoder_params
from ffrnet_tpu.ops import nn as ops
from ffrnet_tpu.ops import quant


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-12)


def test_quantize_weight_roundtrip_error_bounded():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 3, 32, 64)) * 0.1
    wq = quant.quantize_weight(w, channel_axis=-1)
    assert wq["q"].dtype == jnp.int8
    assert wq["scale"].shape == (64,)
    back = quant.dequantize_weight(wq, channel_axis=-1)
    # symmetric round-to-nearest: per-element error <= scale/2
    err = np.abs(np.asarray(w) - np.asarray(back))
    bound = np.asarray(wq["scale"])[None, None, None, :] / 2 + 1e-7
    assert (err <= bound).all()


def test_quantize_weight_linear_layout():
    w = jax.random.normal(jax.random.PRNGKey(1), (16, 40))  # (out, in)
    wq = quant.quantize_weight(w, channel_axis=0)
    assert wq["scale"].shape == (16,)
    assert _rel_err(w, quant.dequantize_weight(wq, channel_axis=0)) < 1e-2


def test_conv2d_int8_matches_float_within_tolerance():
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (2, 14, 14, 32))
    w = jax.random.normal(kw, (3, 3, 32, 64)) * 0.05
    b = jnp.linspace(-0.1, 0.1, 64)
    ref = ops.conv2d(x, w, b, stride=2, padding=1)
    # dispatch through the SAME entry point with a quantized leaf
    got = ops.conv2d(x, quant.quantize_weight(w), b, stride=2, padding=1)
    assert got.dtype == ref.dtype and got.shape == ref.shape
    assert _rel_err(ref, got) < 0.02


def test_linear_int8_matches_float_within_tolerance():
    kx, kw = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(kx, (4, 128))
    w = jax.random.normal(kw, (64, 128)) * 0.05
    b = jnp.linspace(-0.2, 0.2, 64)
    ref = ops.linear(x, w, b)
    got = ops.linear(x, quant.quantize_weight(w, channel_axis=0), b)
    assert got.shape == ref.shape
    assert _rel_err(ref, got) < 0.02


def test_quantize_encoder_params_structure():
    params, _ = irse.init(jax.random.PRNGKey(0), num_layers=50)
    qp = quantize_encoder_params(params)
    # stem stays float (layout-bound + most sensitive)
    assert not quant.is_quantized(qp["input"]["conv"]["w"])
    # every body conv quantized; SE gates stay float
    for unit in qp["body"]:
        assert quant.is_quantized(unit["res"]["conv1"]["w"])
        assert quant.is_quantized(unit["res"]["conv2"]["w"])
        if "shortcut" in unit:
            assert quant.is_quantized(unit["shortcut"]["conv"]["w"])
        assert not quant.is_quantized(unit["res"]["se"]["fc1"]["w"])
    assert quant.is_quantized(qp["output"]["linear"]["w"])
    # idempotent (already-int8 leaves pass through unchanged); original
    # tree untouched
    qp2 = quantize_encoder_params(qp)
    a = qp2["body"][0]["res"]["conv1"]["w"]
    b = qp["body"][0]["res"]["conv1"]["w"]
    assert a["q"].dtype == jnp.int8
    assert (np.asarray(a["q"]) == np.asarray(b["q"])).all()
    assert not quant.is_quantized(params["body"][0]["res"]["conv1"]["w"])


def test_encoder_int8_embeddings_track_float():
    key = jax.random.PRNGKey(7)
    params, state = irse.init(key, num_layers=50)
    x = jax.random.uniform(jax.random.PRNGKey(8), (2, 112, 112, 3), minval=-1,
                           maxval=1)
    feat_f, emb_f, _ = irse.apply(params, state, x, training=False)
    feat_q, emb_q, _ = irse.apply(quantize_encoder_params(params), state, x,
                                  training=False)
    cos = np.sum(np.asarray(emb_f) * np.asarray(emb_q), axis=1)
    assert (cos > 0.99).all(), cos
    assert _rel_err(feat_f, feat_q) < 0.1


def test_static_activation_scales():
    """Calibrated static scales (models/quantize.py::calibrate_activation_
    scales) reproduce the dynamic-quant outputs on the calibration data and
    work under jit (no amax reduce left in the graph)."""
    import pytest

    from ffrnet_tpu.models.quantize import calibrate_activation_scales

    params, state = irse.init(jax.random.PRNGKey(11), num_layers=50)
    qp = quantize_encoder_params(params)
    x = jax.random.uniform(jax.random.PRNGKey(12), (2, 112, 112, 3),
                           minval=-1, maxval=1)
    sp = calibrate_activation_scales(qp, state, [x])
    # every quantized leaf got a device-scalar x_scale
    from ffrnet_tpu.models.quantize import _quantized_leaves_in_exec_order
    leaves = _quantized_leaves_in_exec_order(sp)
    assert leaves and all("x_scale" in l for l in leaves)
    # calibrated on the same batch with margin=1 -> scales match the
    # dynamic ones -> embeddings agree tightly
    _, emb_dyn, _ = irse.apply(qp, state, x, training=False)
    _, emb_sta, _ = jax.jit(
        lambda p, xx: irse.apply(p, state, xx, training=False))(sp, x)
    cos = np.sum(np.asarray(emb_dyn) * np.asarray(emb_sta), axis=1)
    assert (cos > 0.999).all(), cos
    # re-calibrating a baked tree is an error (site ordering would drift)
    with pytest.raises(ValueError):
        calibrate_activation_scales(sp, state, [x])
