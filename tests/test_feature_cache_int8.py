"""--cache_features + --int8_encoder: the cache BUILD runs the int8-static
frozen encoder (train.py build_encoder), so the one-pass build gets the
int8 throughput win and the cached features carry the quantization error
into every RecNet-only epoch. LFW eval stays float by construction (the
cache branch never touches enc_params). Beyond-reference: the reference
re-runs the fp32 frozen encoder every step (models/trainer.py:139-146)."""

import json
import os

import numpy as np
import pytest

from tests.test_feature_cache import DetPairs


@pytest.fixture(scope="module")
def encoder():
    import jax

    from ffrnet_tpu.models import irse

    return irse.init(jax.random.PRNGKey(0))


def _meta_fingerprint(cache_dir):
    with open(os.path.join(cache_dir, "meta.json")) as f:
        return json.load(f)["fingerprint"]


def test_int8_built_cache_diverges_from_float_built(tmp_path, encoder):
    """(a) building with a quantized tree succeeds; (b) its fingerprint
    differs from the float build's, so switching --int8_encoder on or off
    against an existing cache dir triggers a rebuild instead of silently
    reusing features with the wrong quantization provenance."""
    from ffrnet_tpu.train import prepare_int8_encoder
    from ffrnet_tpu.training.feature_cache import build_feature_cache

    enc_p, enc_s = encoder
    ds = DetPairs(n=4, flip_prob=0.0)
    d = str(tmp_path / "fc")

    build_feature_cache(ds, enc_p, enc_s, d, batch_size=2)
    float_fp = _meta_fingerprint(d)
    float_emb = np.array(np.load(os.path.join(d, "embed_non_v0.npy")))

    qp, qs = prepare_int8_encoder(enc_p, enc_s, ds, "fp32")
    build_feature_cache(ds, qp, qs, d, batch_size=2)
    int8_fp = _meta_fingerprint(d)
    assert int8_fp != float_fp  # int8 leaves are hashed -> distinct cache
    int8_emb = np.load(os.path.join(d, "embed_non_v0.npy"))
    # the rebuild actually ran and features carry the int8 error
    assert not np.array_equal(float_emb, int8_emb)
    assert np.all(np.isfinite(int8_emb))
    # int8 features stay close to float (frozen encoder, PTQ error only)
    cos = np.sum(float_emb * int8_emb, -1) / (
        np.linalg.norm(float_emb, axis=-1) * np.linalg.norm(int8_emb, axis=-1))
    assert np.all(cos > 0.98), cos

    # building again with the SAME int8 tree is a no-op (fingerprint is
    # deterministic: calibration rng is fixed inside prepare_int8_encoder)
    t0 = os.path.getmtime(os.path.join(d, "embed_non_v0.npy"))
    qp2, qs2 = prepare_int8_encoder(enc_p, enc_s, ds, "fp32")
    build_feature_cache(ds, qp2, qs2, d, batch_size=2)
    assert os.path.getmtime(os.path.join(d, "embed_non_v0.npy")) == t0


@pytest.mark.slow
def test_driver_int8_cache_features_mode(tmp_path, monkeypatch, capfd):
    """End-to-end driver: --cache_features 1 --int8_encoder 1 builds the
    cache with the int8-static encoder, trains RecNet-only steps to
    completion, and reports the actual behavior (int8-built cache, float
    eval) instead of the pre-round-4 'no effect' warning."""
    from ffrnet_tpu import train as train_mod

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(train_mod, "make_train_dataset",
                        lambda opts: DetPairs(n=16, flip_prob=0.5))
    train_mod.main([
        "--phase", "train", "--batch_size", "8", "--total_epochs", "1",
        "--num_classes", "4", "--save_freq", "10", "--print_freq", "1",
        "--eval_freq", "0", "--encoder_weights", "", "--cache_features",
        "1", "--int8_encoder", "1",
        "--weight_root", str(tmp_path / "weight")])
    ckpt = tmp_path / "weight" / "model_FFR-Net-loss_sphere-"
    cache_dir = ckpt / "feature_cache"
    assert (cache_dir / "meta.json").exists()
    assert any(f.endswith(".pth.gzip") for f in os.listdir(ckpt))
    err = capfd.readouterr().err
    assert "[int8_encoder] calibrated static scales" in err
    assert "feature cache built with the int8-static" in err
    assert "LFW eval stays float" in err
    assert "no effect" not in err

    # the int8-built fingerprint differs from a float build of the same
    # dataset + encoder (drives rebuild when the flag flips)
    int8_fp = _meta_fingerprint(str(cache_dir))
    import jax

    from ffrnet_tpu.models import irse
    from ffrnet_tpu.training.feature_cache import build_feature_cache

    enc_p, enc_s = irse.init(jax.random.PRNGKey(0))
    d2 = str(tmp_path / "fc_float")
    build_feature_cache(DetPairs(n=16, flip_prob=0.0), enc_p, enc_s, d2,
                        batch_size=8)
    assert int8_fp != _meta_fingerprint(d2)
