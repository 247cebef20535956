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


def test_pallas_probe_plumbing(monkeypatch):
    """probe_pallas subprocess plumbing: ok / error / timeout verdicts
    (the real on-TPU probe runs in bench.py; see BASELINE.md)."""
    from ffrnet_tpu.tools import pallas_probe as pp

    monkeypatch.setattr(pp, "_PROBE_SRC", "print('PALLAS_PROBE_OK 2048.0 cpu')")
    res = pp.probe_pallas(timeout_s=30, force=True)
    assert res == {"available": True, "verdict": "ok", "platform": "cpu"}
    # cached
    assert pp.probe_pallas()["available"] is True

    monkeypatch.setattr(pp, "_PROBE_SRC", "raise SystemExit(3)")
    res = pp.probe_pallas(timeout_s=30, force=True)
    assert res["available"] is False and res["verdict"].startswith("error")

    monkeypatch.setattr(pp, "_PROBE_SRC", "import time; time.sleep(30)")
    res = pp.probe_pallas(timeout_s=1.5, force=True)
    assert res["verdict"] == "relay-blocked-timeout"
    pp._cached.clear()  # don't leak the fake verdict to other tests
