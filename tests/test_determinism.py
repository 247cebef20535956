"""Determinism guarantees (the reference's only nondeterminism control was
RNG seeding, utils/options.py:96-99; we assert reproducibility outright)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_loader_identical_across_instances():
    from ffrnet_tpu.data.datasets import SyntheticPairs
    from ffrnet_tpu.data.pipeline import BatchLoader

    ds = SyntheticPairs(num_identities=8)
    a = [b["img_non"].sum() for b in BatchLoader(ds, 4, seed=3).epoch(2)]
    b = [b["img_non"].sum() for b in BatchLoader(ds, 4, seed=3,
                                                 num_threads=3).epoch(2)]
    np.testing.assert_allclose(a, b)


@pytest.mark.slow
def test_train_step_deterministic():
    import functools

    from ffrnet_tpu.models import irse
    from ffrnet_tpu.models.recnet import RecNetConfig
    from ffrnet_tpu.training.trainer import (
        TrainerConfig, create_train_state, train_step)

    cfg = TrainerConfig(optimizer="adam", lr=1e-3,
                        recnet=RecNetConfig(num_classes=16))
    enc_p, enc_s = irse.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "img_non": jnp.asarray(rng.uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32)),
        "img_ocl": jnp.asarray(rng.uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 16, 2)),
    }
    step = jax.jit(functools.partial(train_step, cfg=cfg))

    outs = []
    for _ in range(2):
        state = create_train_state(jax.random.PRNGKey(1), cfg)
        state, metrics = step(enc_p, enc_s, state, batch)
        outs.append((float(metrics["TotalLoss"]),
                     np.asarray(state.params["classifier"]["w"][:4, :4])))
    assert outs[0][0] == outs[1][0]
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
