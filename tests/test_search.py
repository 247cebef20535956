"""1:N identification search (eval/search.py) — the deployment-side
complement to the reference's 1:1 verification (lfw/lfw_eval.py:226-259)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ffrnet_tpu.api import FFRNet
from ffrnet_tpu.eval.search import Gallery, top_k_identify


def test_top_k_matches_numpy():
    rng = np.random.default_rng(0)
    p = rng.standard_normal((7, 64)).astype(np.float32)
    g = rng.standard_normal((25, 64)).astype(np.float32)
    scores, idx = top_k_identify(jnp.asarray(p), jnp.asarray(g), k=5)

    pn = p / np.linalg.norm(p, axis=1, keepdims=True)
    gn = g / np.linalg.norm(g, axis=1, keepdims=True)
    sims = pn @ gn.T
    ref_idx = np.argsort(-sims, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(scores),
                               np.take_along_axis(sims, ref_idx, axis=1),
                               atol=1e-5)


def test_gallery_end_to_end_rank1():
    model = FFRNet.random(0)
    rng = np.random.default_rng(1)
    enroll = rng.uniform(-1, 1, (6, 112, 112, 3)).astype(np.float32)
    labels = [f"id{i}" for i in range(6)]
    gal = Gallery.build(model, enroll, labels, batch_size=4)
    assert gal.embeddings.shape == (6, 512)

    # probing with the enrolled images themselves must be rank-1 exact
    scores, found = gal.search(model, enroll, k=2)
    assert [row[0] for row in found] == labels
    np.testing.assert_allclose(np.asarray(scores)[:, 0], 1.0, atol=1e-4)

    # add() extends the gallery
    extra = rng.uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32)
    gal2 = gal.add(model, extra, ["id6", "id7"])
    assert len(gal2.labels) == 8 and gal2.embeddings.shape == (8, 512)
    _, found2 = gal2.search(model, extra, k=1)
    assert [row[0] for row in found2] == ["id6", "id7"]

    with pytest.raises(ValueError):
        gal.search(model, enroll, k=99)
    with pytest.raises(ValueError):
        Gallery.build(model, enroll, labels[:-1])


def test_gallery_save_load_roundtrip(tmp_path):
    model = FFRNet.random(0)
    rng = np.random.default_rng(2)
    faces = rng.uniform(-1, 1, (4, 112, 112, 3)).astype(np.float32)
    gal = Gallery.build(model, faces, ["a", "b", "c", "d"])
    p = str(tmp_path / "gallery.npz")
    gal.save(p)
    gal2 = Gallery.load(p)
    assert gal2.labels == ["a", "b", "c", "d"]
    np.testing.assert_allclose(np.asarray(gal2.embeddings),
                               np.asarray(gal.embeddings, np.float32),
                               atol=1e-6)
    _, found = gal2.search(model, faces[1:3], k=1)
    assert [r[0] for r in found] == ["b", "c"]


def test_cmc_from_embeddings_matches_numpy():
    from ffrnet_tpu.eval.search import cmc_from_embeddings

    rng = np.random.default_rng(5)
    g = rng.standard_normal((30, 64)).astype(np.float32)
    gal_ids = np.repeat(np.arange(10), 3).astype(np.int32)  # 3 imgs/identity
    p = rng.standard_normal((20, 64)).astype(np.float32)
    probe_ids = rng.integers(0, 10, 20).astype(np.int32)

    cmc = np.asarray(cmc_from_embeddings(jnp.asarray(p),
                                         jnp.asarray(probe_ids),
                                         jnp.asarray(g),
                                         jnp.asarray(gal_ids), max_rank=7))
    # brute force: rank of the first gallery entry with the right identity
    pn = p / np.linalg.norm(p, axis=1, keepdims=True)
    gn = g / np.linalg.norm(g, axis=1, keepdims=True)
    order = np.argsort(-(pn @ gn.T), axis=1)  # (P, G)
    first = np.array([
        int(np.nonzero(gal_ids[order[i]] == probe_ids[i])[0][0])
        for i in range(20)])
    exp = [(first <= r).mean() for r in range(7)]
    np.testing.assert_allclose(cmc, exp, atol=1e-6)
    assert np.all(np.diff(cmc) >= 0)  # CMC is nondecreasing in rank


def test_gallery_cmc_end_to_end():
    from ffrnet_tpu.eval.search import Gallery

    model = FFRNet.random(0)
    rng = np.random.default_rng(6)
    enroll = rng.uniform(-1, 1, (6, 112, 112, 3)).astype(np.float32)
    labels = [f"id{i}" for i in range(6)]
    gal = Gallery.build(model, enroll, labels, batch_size=4)
    # enrolled images probe themselves: rank-1 perfect, max_rank clamps
    cmc = gal.cmc(model, enroll, labels, max_rank=99)
    assert cmc.shape == (6,)
    np.testing.assert_allclose(cmc, 1.0, atol=1e-6)
    # an un-enrolled identity can never match (closed-set)
    cmc_miss = gal.cmc(model, enroll[:2], ["ghost", "ghost2"], max_rank=6)
    np.testing.assert_allclose(cmc_miss, 0.0, atol=1e-6)


def test_top_k_valid_mask_is_traced():
    # serving depends on `valid` being traced (capacity padding must not
    # trigger a recompile per enroll) and masked rows scoring below -1
    rng = np.random.default_rng(3)
    p = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((16, 32)).astype(np.float32))
    top_k_identify(p, g, k=2, valid=5)
    mid = top_k_identify._cache_size()
    top_k_identify(p, g, k=2, valid=11)
    assert top_k_identify._cache_size() == mid  # no growth across valid
    s, i = top_k_identify(p, g, k=16, valid=4)
    assert np.all(np.asarray(s)[:, 4:] == -2.0)
    assert np.all(np.asarray(i)[:, :4] < 4)
