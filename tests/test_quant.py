"""Int8 quantized inference path (ops/quant.py, models/quantize.py).

The reference has no quantized path (the frozen encoder runs fp32 CUDA,
pretrain/model_ir_se50.py:108-154); these tests bound the opt-in int8
path's error per-op and end-to-end and pin the transparent pytree-leaf
dispatch contract in ops.nn.conv2d / ops.nn.linear.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
    from ffrnet_tpu.models.quantize import _quantized_leaves
    leaves = _quantized_leaves(sp)
    assert leaves and all("x_scale" in l for l in leaves)
    # calibrated on the same batch with margin=1 -> scales match the
    # dynamic ones -> embeddings agree tightly
    _, emb_dyn, _ = irse.apply(qp, state, x, training=False)
    _, emb_sta, _ = jax.jit(
        lambda p, xx: irse.apply(p, state, xx, training=False))(sp, x)
    cos = np.sum(np.asarray(emb_dyn) * np.asarray(emb_sta), axis=1)
    assert (cos > 0.999).all(), cos
    # re-calibrating a baked tree is an error (scales are already static)
    with pytest.raises(ValueError):
        calibrate_activation_scales(sp, state, [x])
    # no collector residue in the returned tree (pytree stays jit-clean)
    assert not any("_amax_collect" in l for l in leaves)


def test_static_scales_held_out_accuracy():
    """Static scales evaluated on data NOT used for calibration: the one
    failure mode static quantization introduces is out-of-range saturation,
    which by construction cannot show on the calibration batches themselves
    (VERDICT r2 weak #2). Held-out embeddings must still track the float
    path tightly."""
    from ffrnet_tpu.models.quantize import calibrate_activation_scales

    params, state = irse.init(jax.random.PRNGKey(21), num_layers=50)
    qp = quantize_encoder_params(params)
    cal = [jax.random.uniform(jax.random.PRNGKey(s), (2, 112, 112, 3),
                              minval=-1, maxval=1) for s in (22, 23)]
    sp = calibrate_activation_scales(qp, state, cal)
    x = jax.random.uniform(jax.random.PRNGKey(99), (3, 112, 112, 3),
                           minval=-1, maxval=1)  # held out
    _, emb_f, _ = irse.apply(params, state, x, training=False)
    _, emb_s, _ = irse.apply(sp, state, x, training=False)
    cos = np.sum(np.asarray(emb_f) * np.asarray(emb_s), axis=1)
    assert (cos > 0.99).all(), cos
    # a calibration margin loosens the scales monotonically
    sp_m = calibrate_activation_scales(qp, state, cal, margin=1.5)
    for a, b in zip(_leaves(sp), _leaves(sp_m)):
        assert float(b["x_scale"]) > float(a["x_scale"])


def _leaves(tree):
    from ffrnet_tpu.models.quantize import _quantized_leaves

    return _quantized_leaves(tree)


def test_static_scale_saturation_semantics():
    """A baked x_scale clips out-of-range activations at +/-127: the int8
    conv on values 2x beyond the calibrated range equals (within int8
    rounding) the float conv on inputs clamped to that range — pinning the
    exact saturation contract the held-out test relies on."""
    kx, kw = jax.random.split(jax.random.PRNGKey(31))
    x = jax.random.uniform(kx, (1, 8, 8, 16), minval=-2.0, maxval=2.0)
    w = jax.random.normal(kw, (3, 3, 16, 32)) * 0.05
    wq = quant.quantize_weight(w)
    wq["x_scale"] = jnp.float32(1.0 / 127.0)  # calibrated for [-1, 1]
    got = ops.conv2d(x, wq, stride=1, padding=1)
    ref = ops.conv2d(jnp.clip(x, -1.0, 1.0), w, stride=1, padding=1)
    assert _rel_err(ref, got) < 0.02
    # and it is NOT equal to the unclipped conv (the clip really engaged)
    assert _rel_err(ops.conv2d(x, w, stride=1, padding=1), got) > 0.05


def test_calibration_under_jit_raises_clear_error():
    """The calibration collector needs concrete values; a traced call must
    fail with the 'must run eagerly' message, not an opaque tracer error
    (ADVICE r2 #3)."""
    import pytest

    w = jax.random.normal(jax.random.PRNGKey(41), (8, 16)) * 0.1
    wq = quant.quantize_weight(w, channel_axis=0)
    wq[quant.CALIBRATION_KEY] = []
    x = jnp.ones((2, 16))
    with pytest.raises(RuntimeError, match="must run EAGERLY"):
        jax.jit(lambda xx: quant.linear_int8(xx, wq))(x)


def test_dynamic_quant_batch_composition_dependence_documented():
    """The dynamic path's per-tensor scale is a batch amax, so a sample's
    int8 embedding depends on its batchmates (ADVICE r2 #2) — pin the
    behavior the docs describe, and that static scales remove it."""
    from ffrnet_tpu.models.quantize import calibrate_activation_scales

    params, state = irse.init(jax.random.PRNGKey(51), num_layers=50)
    qp = quantize_encoder_params(params)
    x2 = jax.random.uniform(jax.random.PRNGKey(52), (2, 112, 112, 3),
                            minval=-1, maxval=1)
    # same sample, alone vs batched with a larger-amplitude companion
    _, e_alone, _ = irse.apply(qp, state, x2[:1], training=False)
    _, e_pair, _ = irse.apply(qp, state, jnp.concatenate(
        [x2[:1], x2[1:] * 0.999], 0), training=False)
    dyn_delta = float(np.abs(np.asarray(e_alone[0]) -
                             np.asarray(e_pair[0])).max())
    sp = calibrate_activation_scales(qp, state, [x2])
    _, s_alone, _ = irse.apply(sp, state, x2[:1], training=False)
    _, s_pair, _ = irse.apply(sp, state, jnp.concatenate(
        [x2[:1], x2[1:] * 0.999], 0), training=False)
    sta_delta = float(np.abs(np.asarray(s_alone[0]) -
                             np.asarray(s_pair[0])).max())
    assert sta_delta == 0.0, "static scales must be batch-independent"
    assert dyn_delta >= sta_delta


# ---------------------------------------------------------------------------
# RecNet int8 (models/quantize.py::quantize_recnet_params)
# ---------------------------------------------------------------------------


def _cos_rows(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return (a * b).sum(1) / np.maximum(
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1), 1e-12)


def test_quantize_recnet_params_structure():
    from ffrnet_tpu.models import recnet
    from ffrnet_tpu.models.quantize import (quantize_recnet_params,
                                            tree_quantized_leaves)

    p, _ = recnet.init(jax.random.PRNGKey(0))
    qp = quantize_recnet_params(p)
    # 15 conv sites: conv4space c0/r0/c1/r1/c2/r2 (1+2+1+2+1+2) +
    # flipmerge conv+res (3) + merge conv+res (3)
    assert len(tree_quantized_leaves(qp)) == 15
    for name in ("c0", "c1", "c2"):
        assert quant.is_quantized(qp["conv4space"][name]["conv"]["w"])
    for name in ("r0", "r1", "r2"):
        assert quant.is_quantized(qp["conv4space"][name]["conv1"]["conv"]["w"])
        assert quant.is_quantized(qp["conv4space"][name]["conv2"]["conv"]["w"])
    for site in ("flipmerge", "merge"):
        assert quant.is_quantized(qp[site]["c"]["conv"]["w"])
    # channel-branch linears and the classifier stay float (the factored
    # path multiplies weight pairs at trace time; cosine head is sensitive)
    assert not quant.tree_has_quantized(qp["conv4channel"])
    assert not quant.is_quantized(qp["classifier"]["w"])
    # idempotent; original untouched
    assert len(tree_quantized_leaves(quantize_recnet_params(qp))) == 15
    assert not quant.tree_has_quantized(p)


def test_recnet_int8_tracks_float_and_calibrates():
    """Dynamic and calibrated-static int8 RecNet track the float head on a
    HELD-OUT feature map; jit-clean after baking."""
    from ffrnet_tpu.models import recnet
    from ffrnet_tpu.models.quantize import (
        calibrate_recnet_activation_scales, quantize_recnet_params,
        tree_quantized_leaves)

    p, s = recnet.init(jax.random.PRNGKey(1))
    qp = quantize_recnet_params(p)
    rng = np.random.default_rng(0)
    fm_cal = jnp.asarray(rng.standard_normal((2, 7, 7, 512)), jnp.float32)
    fm_eval = jnp.asarray(rng.standard_normal((2, 7, 7, 512)), jnp.float32)

    (v_f, _), _ = recnet.apply(p, s, fm_eval, training=False)
    (v_d, _), _ = recnet.apply(qp, s, fm_eval, training=False)
    assert (_cos_rows(v_f, v_d) > 0.99).all()

    cal = calibrate_recnet_activation_scales(qp, s, [fm_cal])
    leaves = tree_quantized_leaves(cal)
    assert len(leaves) == 15 and all("x_scale" in l for l in leaves)
    (v_s, _), _ = jax.jit(
        lambda pp, fm: recnet.apply(pp, s, fm, training=False))(cal, fm_eval)
    assert (_cos_rows(v_f, v_s) > 0.99).all()


def test_api_quantize_int8_modes():
    """prepare(quantize_int8=...) mode dispatch: True=='encoder', 'recnet'
    and 'all' quantize the right trees, bad values raise."""
    import pytest

    from ffrnet_tpu.api import FFRNet

    base = FFRNet.random(0)
    m_enc = base.prepare(quantize_int8=True)
    assert quant.tree_has_quantized(m_enc.enc_params)
    assert not quant.tree_has_quantized(m_enc.rec_params)
    m_rec = base.prepare(quantize_int8="recnet")
    assert not quant.tree_has_quantized(m_rec.enc_params)
    assert quant.tree_has_quantized(m_rec.rec_params)
    m_all = base.prepare(quantize_int8="all")
    assert quant.tree_has_quantized(m_all.enc_params)
    assert quant.tree_has_quantized(m_all.rec_params)
    with pytest.raises(ValueError, match="quantize_int8"):
        base.prepare(quantize_int8="both")


def test_api_calibrate_int8_recnet_only():
    """calibrate_int8 on a recnet-only quantized model: the float encoder
    supplies the calibration feature maps; embed() stays jit-clean and
    tracks the float model."""
    from ffrnet_tpu.api import FFRNet
    from ffrnet_tpu.models.quantize import tree_quantized_leaves

    rng = np.random.default_rng(7)
    cal = rng.uniform(-1, 1, (1, 112, 112, 3)).astype(np.float32)
    ev = rng.uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32)
    m_f = FFRNet.random(3)
    m_q = m_f.prepare(quantize_int8="recnet").calibrate_int8([cal])
    leaves = tree_quantized_leaves(m_q.rec_params)
    assert len(leaves) == 15 and all("x_scale" in l for l in leaves)
    raw_f, rect_f = m_f.embed(ev)
    raw_q, rect_q = m_q.embed(ev)
    # raw path identical (encoder untouched); rectified close
    assert _rel_err(raw_f, raw_q) < 1e-5
    assert (_cos_rows(rect_f, rect_q) > 0.99).all()


@pytest.mark.slow  # ~160s: CPU int8 emulation + two pair-score compiles
def test_quantized_model_evaluate_protocol():
    """FFRNet.evaluate — the full 10-fold verification protocol
    (lfw/lfw_eval.py:272-287) — runs on a quantized model: the eval
    runner's jitted pair-score fn must trace cleanly over quantized
    (dict) weight leaves, and the raw-score protocol output is identical
    because recnet-only quantization leaves the encoder untouched.
    RecNet-only keeps the CPU int8-emulation cost tiny; the int8 eval
    arm in bench.py measures the full-speed variant on device."""
    from ffrnet_tpu.api import FFRNet

    rng = np.random.default_rng(11)
    cal = rng.uniform(-1, 1, (1, 112, 112, 3)).astype(np.float32)
    m_f = FFRNet.random(4)
    m_q = m_f.prepare(quantize_int8="recnet").calibrate_int8([cal])

    batches = [{
        "img1": rng.uniform(-1, 1, (10, 112, 112, 3)).astype(np.float32),
        "img2": rng.uniform(-1, 1, (10, 112, 112, 3)).astype(np.float32),
        "label": rng.integers(0, 2, 10).astype(np.int64),
    }]
    acc_new_q, acc_raw_q = m_q.evaluate(batches)
    acc_new_f, acc_raw_f = m_f.evaluate(batches)
    assert acc_raw_q == acc_raw_f  # float encoder -> identical raw protocol
    # rectified embeds track at >0.99 cosine; on 10 random pairs the fold
    # accuracies themselves stay within one fold's quantum
    assert abs(acc_new_q - acc_new_f) <= 0.2
    assert 0.0 <= acc_new_q <= 1.0


def test_calibration_rejects_nonpositive_margin():
    """margin <= 0 would bake x_scale=0 into every leaf and saturate all
    activations to +/-127 — must raise, not silently produce garbage
    (round-5 review)."""
    from ffrnet_tpu.models.quantize import _bake_static_scales

    for bad in (0.0, -1.0):
        with pytest.raises(ValueError, match="margin"):
            _bake_static_scales([{}], lambda x: None, [], margin=bad)
