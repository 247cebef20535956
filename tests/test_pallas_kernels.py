"""Pallas kernel equivalence tests (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ffrnet_tpu.ops.similarity import self_similarity


def test_self_similarity_pallas_matches_xla():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 7, 7, 512)).astype(np.float32))
    ss_s_ref, ss_c_ref = self_similarity(x, impl="xla")
    ss_s, ss_c = self_similarity(x, impl="pallas")
    np.testing.assert_allclose(np.asarray(ss_s), np.asarray(ss_s_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ss_c), np.asarray(ss_c_ref),
                               atol=1e-5, rtol=1e-5)


def test_self_similarity_pallas_gradient():
    from ffrnet_tpu.ops.pallas.self_similarity import self_similarity_pallas

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 7, 7, 512)).astype(np.float32))

    def f_pallas(x):
        a, b = self_similarity_pallas(x)
        return jnp.sum(a * a) + jnp.sum(jnp.abs(b))

    def f_ref(x):
        a, b = self_similarity(x, impl="xla")
        return jnp.sum(a * a) + jnp.sum(jnp.abs(b))

    g_pallas = jax.grad(f_pallas)(x)
    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_self_similarity_pallas_zero_rows():
    # all-zero feature map: normalize eps path, no NaN/Inf
    x = jnp.zeros((1, 7, 7, 512))
    ss_s, ss_c = self_similarity(x, impl="pallas")
    assert np.isfinite(np.asarray(ss_s)).all()
    assert np.isfinite(np.asarray(ss_c)).all()


def test_se_gating_pallas_matches_xla():
    from ffrnet_tpu.ops.pallas.se_gating import se_gating_pallas, _reference

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((3, 7, 7, 512)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((32, 512)).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.standard_normal((512, 32)).astype(np.float32) * 0.05)
    a = _reference(x, w1, w2)
    b = se_gating_pallas(x, w1, w2)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5,
                               rtol=1e-5)

    # gradient path (custom VJP backward via XLA reference)
    ga = jax.grad(lambda v: jnp.sum(jnp.square(_reference(v, w1, w2))))(x)
    gb = jax.grad(lambda v: jnp.sum(jnp.square(se_gating_pallas(v, w1, w2))))(x)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga), atol=1e-4,
                               rtol=1e-4)


def test_encoder_se_pallas_path():
    from ffrnet_tpu.models import irse

    params, state = irse.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (1, 112, 112, 3)).astype(np.float32))
    fm_x, e_x, _ = irse.apply(params, state, x, se_impl="xla")
    fm_p, e_p, _ = irse.apply(params, state, x, se_impl="pallas")
    np.testing.assert_allclose(np.asarray(e_p), np.asarray(e_x), atol=5e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(fm_p), np.asarray(fm_x), atol=5e-4,
                               rtol=1e-3)


def test_pallas_probe_plumbing(monkeypatch, tmp_path):
    """probe_pallas subprocess plumbing across the three phases (warm /
    pallas / sweep): ok, error, pallas-timeout, warm-timeout, and
    stale-session retry verdicts (the real on-TPU probe runs in bench.py;
    see BASELINE.md)."""
    from ffrnet_tpu.tools import pallas_probe as pp

    monkeypatch.setattr(pp, "_WARM_SRC", "print('RELAY_WARM_OK 2048.0 cpu')")
    monkeypatch.setattr(pp, "_PROBE_SRC", "print('PALLAS_PROBE_OK 2048.0 cpu')")
    res = pp.probe_pallas(timeout_s=30, force=True)
    assert (res["available"], res["verdict"], res["platform"]) == (
        True, "ok", "cpu")
    assert res["attempts"] == 1 and res["warm_s"] >= 0
    # cached
    assert pp.probe_pallas()["available"] is True

    monkeypatch.setattr(pp, "_PROBE_SRC", "raise SystemExit(3)")
    res = pp.probe_pallas(timeout_s=30, force=True)
    assert res["available"] is False and res["verdict"].startswith("error")

    # pallas hangs while plain XLA works -> the documented relay-block
    # verdict, plus a sweep to clear the killed child's stale session
    monkeypatch.setattr(pp, "_PROBE_SRC", "import time; time.sleep(30)")
    res = pp.probe_pallas(timeout_s=1.5, force=True, attempts=2,
                          reap_pause_s=0.0)
    assert res["verdict"] == "relay-blocked-timeout"
    assert res["attempts"] == 2 and res["sweep"] == "ok"

    # even plain XLA cannot run -> relay (not pallas) is unavailable; the
    # pallas child is never spawned
    monkeypatch.setattr(pp, "_WARM_SRC", "import time; time.sleep(30)")
    res = pp.probe_pallas(timeout_s=30, force=True, warm_timeout_s=1.5)
    assert res["verdict"] == "relay-unavailable-timeout"
    assert res["attempts"] == 0

    # stale-session recovery: first pallas attempt hangs (and is killed by
    # the timeout), the automatic retry succeeds
    monkeypatch.setattr(pp, "_WARM_SRC", "print('RELAY_WARM_OK 2048.0 cpu')")
    flag = tmp_path / "session_flag"
    monkeypatch.setattr(pp, "_PROBE_SRC", (
        "import os, time\n"
        f"p = {str(flag)!r}\n"
        "if not os.path.exists(p):\n"
        "    open(p, 'w').close(); time.sleep(60)\n"
        "print('PALLAS_PROBE_OK 2048.0 cpu')\n"))
    # timeout must exceed interpreter startup (~3s: sitecustomize preimports
    # jax) or the child is killed before it can create the flag
    res = pp.probe_pallas(timeout_s=15, force=True, reap_pause_s=0.0)
    assert (res["available"], res["verdict"]) == (True, "ok")
    assert res["attempts"] == 2
    pp._cached.clear()  # don't leak the fake verdict to other tests


def test_warp_band_pallas_matches_gather():
    """Fused column-band warp (interpret mode) vs the XLA gather warp,
    across crop_w configs and both output geometries."""
    from ffrnet_tpu.ops.align import ARCFACE_REF_PTS, cv2_transform, warp_affine
    from ffrnet_tpu.ops.pallas.warp import warp_affine_pallas_band

    rng = np.random.default_rng(11)
    imgs = jnp.asarray(rng.uniform(0, 255, (3, 250, 250, 3)).astype(np.float32))
    pts = jnp.asarray((ARCFACE_REF_PTS[None] * 2.1
                       + rng.normal(0, 2, (3, 5, 2)) + 15).astype(np.float32))
    ref = jnp.broadcast_to(jnp.asarray(ARCFACE_REF_PTS), pts.shape)
    mats = cv2_transform(pts, ref)
    for out_hw in ((112, 112), (112, 96)):
        gold = np.asarray(warp_affine(imgs, mats, out_hw=out_hw))
        for cw in (64, 96):
            got = np.asarray(warp_affine_pallas_band(
                imgs, mats, out_hw=out_hw, crop_w=cw))
            np.testing.assert_allclose(got, gold, atol=1e-2, rtol=1e-4,
                                       err_msg=f"{out_hw} cw={cw}")


def test_align_faces_auto_and_band_guard():
    """impl='auto' is the XLA band (round-4 sweep: faster than the pallas
    kernel, no probe dependency) and must match the gather golden; the
    pallas band's bound guard falls back to the MXU warp on extreme
    transforms (still exact)."""
    from ffrnet_tpu.ops.align import (ARCFACE_REF_PTS, align_faces,
                                      cv2_transform, warp_affine)

    rng = np.random.default_rng(12)
    imgs = jnp.asarray(rng.uniform(0, 255, (2, 250, 250, 3)).astype(np.float32))
    pts = (ARCFACE_REF_PTS[None].repeat(2, 0) * 2.0 + 20).astype(np.float32)
    ref = jnp.broadcast_to(jnp.asarray(ARCFACE_REF_PTS), (2, 5, 2))
    gold = np.asarray(warp_affine(
        imgs, cv2_transform(jnp.asarray(pts), ref), out_hw=(112, 96)))
    out_auto = np.asarray(align_faces(imgs, jnp.asarray(pts), impl="auto"))
    np.testing.assert_allclose(out_auto, gold, atol=1e-2, rtol=1e-4)

    # extreme scale: band bound fails -> silently exact via MXU fallback
    big = (ARCFACE_REF_PTS[None].repeat(2, 0) * 12.0).astype(np.float32)
    big_imgs = jnp.asarray(rng.uniform(0, 255, (2, 300, 300, 3)).astype(np.float32))
    gold_big = np.asarray(warp_affine(big_imgs,
                                      cv2_transform(jnp.asarray(big), ref),
                                      out_hw=(112, 96)))
    got = np.asarray(align_faces(big_imgs, jnp.asarray(big),
                                 impl="pallas_band"))
    np.testing.assert_allclose(got, gold_big, atol=1e-2, rtol=1e-4)
    # ... and impl='auto' must ALSO survive the extreme transform exactly
    got_auto = np.asarray(align_faces(big_imgs, jnp.asarray(big),
                                      impl="auto"))
    np.testing.assert_allclose(got_auto, gold_big, atol=1e-2, rtol=1e-4)


def test_channel_branch_pallas_matches_xla():
    """Fused channel-branch kernel (ops/pallas/channel_branch.py) vs the
    XLA factored path, fp32 interpreter mode."""
    from ffrnet_tpu.models import recnet
    from ffrnet_tpu.ops.pallas.channel_branch import (_reference,
                                                      channel_branch_pallas)

    cfg = recnet.RecNetConfig(num_classes=32)
    params, _ = recnet.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    flat = jnp.asarray(rng.standard_normal((3, 512, 49)).astype(np.float32))
    ref = np.asarray(_reference(flat, params["conv4channel"]))
    got = np.asarray(channel_branch_pallas(flat, params["conv4channel"]))
    assert got.shape == (3, 49, 512)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_channel_branch_pallas_gradient():
    from ffrnet_tpu.models import recnet
    from ffrnet_tpu.ops.pallas.channel_branch import (_reference,
                                                      channel_branch_pallas)

    cfg = recnet.RecNetConfig(num_classes=32)
    params, _ = recnet.init(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(8)
    flat = jnp.asarray(rng.standard_normal((2, 512, 49)).astype(np.float32))

    g_p = jax.grad(lambda f: jnp.sum(
        jnp.tanh(channel_branch_pallas(f, params["conv4channel"]))))(flat)
    g_r = jax.grad(lambda f: jnp.sum(
        jnp.tanh(_reference(f, params["conv4channel"]))))(flat)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
                               atol=1e-4, rtol=1e-4)


def test_recnet_channel_impl_pallas_fused_matches_default():
    """recnet.apply(channel_impl='pallas_fused') inference parity with the
    default XLA path (fp32: both reduce to the same factored math)."""
    from ffrnet_tpu.models import recnet

    cfg = recnet.RecNetConfig(num_classes=32)
    cfg_f = recnet.RecNetConfig(num_classes=32, channel_impl="pallas_fused")
    params, state = recnet.init(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(9)
    fm = jnp.asarray(rng.standard_normal((2, 7, 7, 512)).astype(np.float32))
    (v_ref, fn_ref), _ = recnet.apply(params, state, fm, cfg=cfg,
                                      training=False)
    (v_got, fn_got), _ = recnet.apply(params, state, fm, cfg=cfg_f,
                                      training=False)
    np.testing.assert_allclose(np.asarray(v_got), np.asarray(v_ref),
                               atol=2e-5, rtol=2e-5)
    # kernel accumulates fp32 without the XLA path's intermediate
    # round-trips; reassociation noise amplifies through the merge convs
    np.testing.assert_allclose(np.asarray(fn_got), np.asarray(fn_ref),
                               atol=2e-4, rtol=2e-4)


def test_recnet_channel_impl_pallas_fused_training_falls_back():
    """Training / label-bearing calls must take the XLA branch (the train
    tuple returns M_channel itself) — identical outputs to the default."""
    from ffrnet_tpu.models import recnet

    cfg = recnet.RecNetConfig(num_classes=32)
    cfg_f = recnet.RecNetConfig(num_classes=32, channel_impl="pallas_fused")
    params, state = recnet.init(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(10)
    fm = jnp.asarray(rng.standard_normal((2, 7, 7, 512)).astype(np.float32))
    lbl = jnp.asarray([1, 3])
    out_ref, _ = recnet.apply(params, state, fm, lbl, cfg=cfg, training=True)
    out_got, _ = recnet.apply(params, state, fm, lbl, cfg=cfg_f, training=True)
    np.testing.assert_allclose(np.asarray(out_got.logits),
                               np.asarray(out_ref.logits), atol=0, rtol=0)
    assert out_got.m_channel is not None
