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
