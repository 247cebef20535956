"""Feature-cached training: on-disk frozen-encoder cache + RecNet-only
steps (training/feature_cache.py; capability beyond the reference, which
re-runs the frozen encoder every step, models/trainer.py:139-146)."""

import dataclasses

import numpy as np
import pytest


@dataclasses.dataclass
class DetPairs:
    """Deterministic paired dataset: image is a pure function of idx; the
    ONLY rng use is the paired flip (the CasiaPairs contract the cache
    relies on)."""

    n: int = 8
    flip_prob: float = 0.5

    def __len__(self):
        return self.n

    def get(self, idx, rng):
        base = np.random.default_rng(idx).uniform(
            -1, 1, (112, 112, 3)).astype(np.float32)
        ocl = base.copy()
        ocl[60:, :] = -1.0
        if self.flip_prob and rng.random() < self.flip_prob:
            base, ocl = base[:, ::-1].copy(), ocl[:, ::-1].copy()
        return {"img_non": base, "img_ocl": ocl,
                "label": np.int32(idx % 4)}


@pytest.fixture(scope="module")
def encoder():
    import jax

    from ffrnet_tpu.models import irse

    return irse.init(jax.random.PRNGKey(0))


def test_build_and_read_matches_encode_frozen(tmp_path, encoder):
    import jax

    from ffrnet_tpu.training.feature_cache import (
        CachedFeatureDataset, build_feature_cache)
    from ffrnet_tpu.training.trainer import encode_frozen

    enc_p, enc_s = encoder
    ds = DetPairs(n=5, flip_prob=0.0)
    build_feature_cache(ds, enc_p, enc_s, str(tmp_path / "fc"), batch_size=3)
    cached = CachedFeatureDataset(str(tmp_path / "fc"), flip_prob=0.5)
    assert len(cached) == 5

    enc = jax.jit(encode_frozen, static_argnames=("compute_dtype",))
    for idx, seed in ((0, 1), (3, 2), (4, 5)):
        rng = np.random.default_rng(seed)
        got = cached.get(idx, rng)
        # replicate the flip draw with an identical rng
        flip = np.random.default_rng(seed).random() < 0.5
        raw = DetPairs(n=5, flip_prob=1.0 if flip else 0.0).get(
            idx, np.random.default_rng(0))
        want = jax.device_get(enc(
            enc_p, enc_s,
            {k: np.asarray(v)[None] for k, v in raw.items()
             if k != "label"} | {"label": np.asarray([raw["label"]])}))
        for key in ("featmap_non", "featmap_ocl", "embed_non", "embed_ocl"):
            np.testing.assert_allclose(got[key], want[key][0], atol=2e-5,
                                       rtol=2e-5, err_msg=f"{key} idx={idx}")
        assert got["label"] == raw["label"]


def test_build_rejects_flipping_dataset(tmp_path, encoder):
    from ffrnet_tpu.training.feature_cache import build_feature_cache

    with pytest.raises(ValueError, match="flip-free"):
        build_feature_cache(DetPairs(flip_prob=0.5), *encoder,
                            str(tmp_path / "fc"))


def test_build_is_idempotent_but_invalidates_on_change(tmp_path, encoder):
    import os

    import jax

    from ffrnet_tpu.training.feature_cache import build_feature_cache

    enc_p, enc_s = encoder
    d = str(tmp_path / "fc")
    build_feature_cache(DetPairs(n=3, flip_prob=0.0), enc_p, enc_s, d,
                        batch_size=2)
    t0 = os.path.getmtime(os.path.join(d, "featmap_non_v0.npy"))
    build_feature_cache(DetPairs(n=3, flip_prob=0.0), enc_p, enc_s, d,
                        batch_size=2)  # complete cache: no rewrite
    assert os.path.getmtime(os.path.join(d, "featmap_non_v0.npy")) == t0
    # DIFFERENT encoder weights -> fingerprint mismatch -> rebuild (a
    # stale cache silently reused would train against wrong features)
    enc_p2 = jax.tree.map(lambda x: x * 1.001, enc_p)
    emb0 = np.array(np.load(os.path.join(d, "embed_non_v0.npy")))
    build_feature_cache(DetPairs(n=3, flip_prob=0.0), enc_p2, enc_s, d,
                        batch_size=2)
    emb1 = np.load(os.path.join(d, "embed_non_v0.npy"))
    assert not np.array_equal(emb0, emb1)


def test_crashed_rebuild_never_looks_complete(tmp_path, encoder):
    """A rebuild removes the stale meta BEFORE truncating the arrays: a
    build that dies mid-way must not leave a cache that passes the
    completeness check with zeroed features."""
    import os

    import jax

    from ffrnet_tpu.training.feature_cache import (
        build_feature_cache, lock_age_s)

    enc_p, enc_s = encoder
    d = str(tmp_path / "fc")
    build_feature_cache(DetPairs(n=3, flip_prob=0.0), enc_p, enc_s, d,
                        batch_size=2)
    assert lock_age_s(d) is None  # lock removed on completion

    class Dies(DetPairs):
        def get(self, idx, rng):
            if idx >= 2:
                raise RuntimeError("boom")
            return super().get(idx, rng)

    enc_p2 = jax.tree.map(lambda x: x * 1.001, enc_p)  # forces rebuild
    with pytest.raises(RuntimeError):
        build_feature_cache(Dies(n=3, flip_prob=0.0), enc_p2, enc_s, d,
                            batch_size=2)
    assert not os.path.exists(os.path.join(d, "meta.json"))
    assert lock_age_s(d) is not None  # crashed build leaves its lock
    # next build with the ORIGINAL encoder must rebuild, not reuse
    build_feature_cache(DetPairs(n=3, flip_prob=0.0), enc_p, enc_s, d,
                        batch_size=2)
    assert os.path.exists(os.path.join(d, "meta.json"))
    assert lock_age_s(d) is None


def test_cached_training_matches_raw(tmp_path, encoder):
    """Two optimizer steps through the cache == two raw train_step calls
    (same flips via the shared per-(epoch, sample) RNG discipline)."""
    import jax
    from functools import partial

    from ffrnet_tpu.data.pipeline import BatchLoader
    from ffrnet_tpu.models.recnet import RecNetConfig
    from ffrnet_tpu.training.feature_cache import (
        CachedFeatureDataset, build_feature_cache)
    from ffrnet_tpu.training.trainer import (
        TrainerConfig, create_train_state, train_step,
        train_step_from_features)

    enc_p, enc_s = encoder
    cfg = TrainerConfig(optimizer="adam", lr=1e-3,
                        recnet=RecNetConfig(num_classes=4))
    ds = DetPairs(n=8, flip_prob=0.5)
    build_feature_cache(DetPairs(n=8, flip_prob=0.0), enc_p, enc_s,
                        str(tmp_path / "fc"), batch_size=4)
    cached = CachedFeatureDataset(str(tmp_path / "fc"), flip_prob=0.5)

    raw_loader = BatchLoader(ds, 4, shuffle=True, seed=11,
                             process_index=0, process_count=1)
    fc_loader = BatchLoader(cached, 4, shuffle=True, seed=11,
                            process_index=0, process_count=1)
    s_raw = create_train_state(jax.random.PRNGKey(1), cfg)
    s_fc = create_train_state(jax.random.PRNGKey(1), cfg)
    rstep = jax.jit(partial(train_step, cfg=cfg))
    fstep = jax.jit(partial(train_step_from_features, cfg=cfg))
    for braw, bfc in zip(raw_loader.epoch(0), fc_loader.epoch(0)):
        np.testing.assert_array_equal(braw["label"], bfc["label"])
        s_raw, m_raw = rstep(enc_p, enc_s, s_raw, braw)
        s_fc, m_fc = fstep(s_fc, bfc)
        for k in m_raw:
            np.testing.assert_allclose(
                np.asarray(m_raw[k]), np.asarray(m_fc[k]), atol=2e-4,
                rtol=2e-4, err_msg=k)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4),
        s_raw.params, s_fc.params)


def test_bf16_cache_roundtrip(tmp_path, encoder):
    import ml_dtypes

    from ffrnet_tpu.training.feature_cache import (
        CachedFeatureDataset, build_feature_cache)

    enc_p, enc_s = encoder
    build_feature_cache(DetPairs(n=3, flip_prob=0.0), enc_p, enc_s,
                        str(tmp_path / "fc16"), batch_size=2,
                        compute_dtype="bf16")
    cached = CachedFeatureDataset(str(tmp_path / "fc16"))
    s = cached.get(1, np.random.default_rng(0))
    assert s["featmap_non"].dtype == ml_dtypes.bfloat16
    assert np.isfinite(np.asarray(s["embed_non"], np.float32)).all()


@pytest.mark.slow
def test_driver_cache_features_mode(tmp_path, encoder, monkeypatch):
    """End-to-end: the train driver in --cache_features 1 builds the cache
    and runs RecNet-only steps through the normal cadence."""
    import os

    from ffrnet_tpu import train as train_mod

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(train_mod, "make_train_dataset",
                        lambda opts: DetPairs(n=16, flip_prob=0.5))
    train_mod.main([
        "--phase", "train", "--batch_size", "8", "--total_epochs", "1",
        "--num_classes", "4", "--save_freq", "10", "--print_freq", "1",
        "--eval_freq", "0", "--encoder_weights", "", "--cache_features",
        "1", "--weight_root", str(tmp_path / "weight")])
    ckpt = tmp_path / "weight" / "model_FFR-Net-loss_sphere-"
    assert (ckpt / "feature_cache" / "meta.json").exists()
    assert any(f.endswith(".pth.gzip") for f in os.listdir(ckpt))


def test_encoder_factory_lazy_and_after_lock(tmp_path, encoder):
    """The encoder_factory (int8 calibration in the driver — minutes of
    eager work) runs ONLY when a build actually happens, and only AFTER
    the builder lock exists so multi-host waiters see a heartbeat
    throughout (round-5 review: calibrating before the lock let the
    waiters' grace expire mid-calibration and start a concurrent build
    into the shared dir)."""
    import os

    from ffrnet_tpu.training.feature_cache import build_feature_cache

    enc_p, enc_s = encoder
    d = str(tmp_path / "fc")
    calls = []

    def factory():
        assert os.path.exists(os.path.join(d, "building.lock")), \
            "factory must run under the builder lock"
        calls.append(1)
        return enc_p, enc_s

    ds = DetPairs(n=3, flip_prob=0.0)
    build_feature_cache(ds, enc_p, enc_s, d, batch_size=2,
                        encoder_factory=factory, fingerprint_extra="tag")
    assert calls == [1]
    # complete cache: the factory must NOT be invoked again
    build_feature_cache(ds, enc_p, enc_s, d, batch_size=2,
                        encoder_factory=factory, fingerprint_extra="tag")
    assert calls == [1]


def test_fingerprint_extra_and_root_awareness(tmp_path, encoder):
    """fingerprint_extra separates int8-built from float-built caches
    without calibrating first, and a dataset pointing at a different
    image root (same list, same encoder) must not reuse the cache
    (round-5 review: re-aligned images under a new --train_data were
    silently served stale features)."""
    import dataclasses as dc
    import os

    from ffrnet_tpu.training.feature_cache import cache_fingerprint

    enc_p, enc_s = encoder
    ds = DetPairs(n=3, flip_prob=0.0)
    base = cache_fingerprint(ds, enc_p, enc_s)
    assert cache_fingerprint(ds, enc_p, enc_s) == base  # deterministic
    assert cache_fingerprint(ds, enc_p, enc_s, extra="int8-static-v1") != base

    @dc.dataclass
    class RootedPairs(DetPairs):
        data_root: str = ""
        items: tuple = (("a.jpg", 0), ("b.jpg", 1), ("c.jpg", 2))

    r1, r2 = tmp_path / "rootA", tmp_path / "rootB"
    for r in (r1, r2):
        r.mkdir()
        for name, content in (("a.jpg", b"x"), ("b.jpg", b"yy"),
                              ("c.jpg", b"zzz")):
            (r / name).write_bytes(content)
    dsA = RootedPairs(n=3, flip_prob=0.0, data_root=str(r1))
    dsB = RootedPairs(n=3, flip_prob=0.0, data_root=str(r2))
    fA = cache_fingerprint(dsA, enc_p, enc_s)
    assert fA != cache_fingerprint(dsB, enc_p, enc_s)  # root differs
    # same root, a sampled file regenerated with a different size
    (r1 / "a.jpg").write_bytes(b"xxxx")
    assert cache_fingerprint(dsA, enc_p, enc_s) != fA
