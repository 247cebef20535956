"""Packed pair upload: both streams of a batch in ONE (N, 2, ...) buffer.

Through remote-attached devices each device_put buffer pays a fixed cost
that can dwarf its bytes (BASELINE.md: 3 buffers vs 1 at identical size
measured 3.5-6x slower); BatchLoader pack= halves the buffer count and
the step/eval unpack on device. These tests pin layout and numerics.
"""

import numpy as np
import pytest

from ffrnet_tpu.data.datasets import SyntheticPairs
from ffrnet_tpu.data.pipeline import BatchLoader


def test_loader_pack_stacks_axis1():
    ds = SyntheticPairs(num_identities=4, host_normalize=False)
    plain = next(iter(BatchLoader(ds, 4, shuffle=False).epoch(0)))
    packed = next(iter(BatchLoader(
        ds, 4, shuffle=False,
        pack={"imgs": ("img_non", "img_ocl")}).epoch(0)))
    assert set(packed) == {"imgs", "label"}
    assert packed["imgs"].shape == (4, 2, 112, 112, 3)
    assert packed["imgs"].dtype == np.uint8
    assert packed["imgs"].flags["C_CONTIGUOUS"]
    np.testing.assert_array_equal(packed["imgs"][:, 0], plain["img_non"])
    np.testing.assert_array_equal(packed["imgs"][:, 1], plain["img_ocl"])
    np.testing.assert_array_equal(packed["label"], plain["label"])


def test_train_step_packed_matches_unpacked():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from ffrnet_tpu.models import irse
    from ffrnet_tpu.models.recnet import RecNetConfig
    from ffrnet_tpu.training.trainer import (
        TrainerConfig, create_train_state, train_step)

    cfg = TrainerConfig(optimizer="adam", lr=1e-3,
                        recnet=RecNetConfig(num_classes=8))
    enc_p, enc_s = irse.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    non = rng.integers(0, 256, (4, 112, 112, 3), dtype=np.uint8)
    ocl = rng.integers(0, 256, (4, 112, 112, 3), dtype=np.uint8)
    lab = rng.integers(0, 8, (4,)).astype(np.int32)
    step = jax.jit(partial(train_step, cfg=cfg))

    s1 = create_train_state(jax.random.PRNGKey(1), cfg)
    s2 = create_train_state(jax.random.PRNGKey(1), cfg)
    s1, m1 = step(enc_p, enc_s, s1,
                  {"img_non": jnp.asarray(non), "img_ocl": jnp.asarray(ocl),
                   "label": jnp.asarray(lab)})
    s2, m2 = step(enc_p, enc_s, s2,
                  {"imgs": jnp.asarray(np.stack([non, ocl], axis=1)),
                   "label": jnp.asarray(lab)})
    for k in m1:
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        s1.params, s2.params)


def test_feature_step_packed_matches_unpacked():
    import jax
    from functools import partial

    from ffrnet_tpu.models.recnet import RecNetConfig
    from ffrnet_tpu.training.trainer import (
        TrainerConfig, create_train_state, train_step_from_features)

    cfg = TrainerConfig(optimizer="adam", lr=1e-3,
                        recnet=RecNetConfig(num_classes=8))
    rng = np.random.default_rng(3)
    fm_n = rng.standard_normal((4, 7, 7, 512)).astype(np.float32)
    fm_o = rng.standard_normal((4, 7, 7, 512)).astype(np.float32)
    e_n = rng.standard_normal((4, 512)).astype(np.float32)
    e_o = rng.standard_normal((4, 512)).astype(np.float32)
    lab = rng.integers(0, 8, (4,)).astype(np.int32)
    fstep = jax.jit(partial(train_step_from_features, cfg=cfg))

    s1 = create_train_state(jax.random.PRNGKey(1), cfg)
    s2 = create_train_state(jax.random.PRNGKey(1), cfg)
    s1, m1 = fstep(s1, {"featmap_non": fm_n, "featmap_ocl": fm_o,
                        "embed_non": e_n, "embed_ocl": e_o, "label": lab})
    s2, m2 = fstep(s2, {"featmaps": np.stack([fm_n, fm_o], axis=1),
                        "embeds": np.stack([e_n, e_o], axis=1),
                        "label": lab})
    for k in m1:
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_packed_step_dp_tp_mesh():
    """The packed (N, 2, ...) layout under a real ('data','model') mesh:
    make_distributed_step(packed=True) compiles, shards, and executes
    (complements __graft_entry__'s dry-run of the default unpacked path)."""
    import jax
    import numpy as np

    from ffrnet_tpu.models import irse
    from ffrnet_tpu.models.recnet import RecNetConfig
    from ffrnet_tpu.parallel.mesh import batch_sharding, make_mesh
    from ffrnet_tpu.training.trainer import (
        TrainerConfig, create_train_state, make_distributed_step)

    mesh = make_mesh(n_data=4, n_model=2)
    cfg = TrainerConfig(optimizer="adam", lr=1e-3,
                        recnet=RecNetConfig(num_classes=16))
    enc_p, enc_s = irse.init(jax.random.PRNGKey(0))
    state = create_train_state(jax.random.PRNGKey(1), cfg)
    step, (enc_p, enc_s, state) = make_distributed_step(
        mesh, cfg, enc_p, enc_s, state, packed=True)
    rng = np.random.default_rng(0)
    bs = batch_sharding(mesh)
    batch = jax.device_put(
        {"imgs": rng.integers(0, 256, (8, 2, 112, 112, 3)).astype(np.uint8),
         "label": rng.integers(0, 16, 8).astype(np.int32)},
        {"imgs": bs, "label": bs})
    state, metrics = step(enc_p, enc_s, state, batch)
    assert np.isfinite(float(metrics["TotalLoss"]))
    assert int(jax.device_get(state.step)) == 1


def test_eval_packed_scores_match(tmp_path):
    import jax

    from ffrnet_tpu.eval.runner import evaluate_pairs, make_pair_score_fn
    from ffrnet_tpu.models import irse, recnet
    from ffrnet_tpu.models.recnet import RecNetConfig

    cfg = RecNetConfig(num_classes=8)
    enc_p, enc_s = irse.init(jax.random.PRNGKey(0))
    rec_p, rec_s = recnet.init(jax.random.PRNGKey(1), cfg)
    score = make_pair_score_fn(cfg)
    rng = np.random.default_rng(5)
    i1 = rng.integers(0, 256, (12, 112, 112, 3), dtype=np.uint8)
    i2 = rng.integers(0, 256, (12, 112, 112, 3), dtype=np.uint8)
    lab = (rng.random(12) < 0.5).astype(np.int32)

    def batches(packed):
        for lo in (0, 6):
            sl = slice(lo, lo + 6)
            if packed:
                yield {"imgs": np.stack([i1[sl], i2[sl]], axis=1),
                       "label": lab[sl]}
            else:
                yield {"img1": i1[sl], "img2": i2[sl], "label": lab[sl]}

    rn_u, rr_u, sn_u, sr_u, _ = evaluate_pairs(
        enc_p, enc_s, rec_p, rec_s, batches(False), cfg=cfg,
        score_fn=score, return_scores=True)
    rn_p, rr_p, sn_p, sr_p, _ = evaluate_pairs(
        enc_p, enc_s, rec_p, rec_s, batches(True), cfg=cfg,
        score_fn=score, return_scores=True)
    np.testing.assert_allclose(sn_p, sn_u, atol=1e-5)
    np.testing.assert_allclose(sr_p, sr_u, atol=1e-5)
    # a custom score_fn WITHOUT a .packed attribute must still work
    def plain_score(ep, es, rp, rs, a, b):
        a = a.reshape(a.shape[0], -1).astype(np.float32)
        b = b.reshape(b.shape[0], -1).astype(np.float32)
        import jax.numpy as jnp

        s = jnp.sum(a * b, axis=1) / a.shape[1]
        return s, s + 0.1

    r1 = evaluate_pairs(None, None, None, None, batches(True),
                        score_fn=plain_score, return_scores=True)
    r2 = evaluate_pairs(None, None, None, None, batches(False),
                        score_fn=plain_score, return_scores=True)
    np.testing.assert_allclose(r1[2], r2[2], atol=1e-6)
