"""FFRNet facade API tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ffrnet_tpu.api import FFRNet


@pytest.fixture(scope="module")
def model():
    return FFRNet.random(seed=0)


def test_embed_and_verify(model):
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(-1, 1, (4, 112, 112, 3)).astype(np.float32))
    raw, rect = model.embed(imgs)
    assert raw.shape == rect.shape == (4, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(raw), axis=1), 1.0,
                               atol=1e-5)
    scores = model.verify(imgs[:2], imgs[2:])
    assert scores.shape == (2,)
    # identical pairs -> cosine 1
    same = model.verify(imgs[:2], imgs[:2])
    np.testing.assert_allclose(np.asarray(same), 1.0, atol=1e-4)


def test_align(model):
    from ffrnet_tpu.ops.align import ARCFACE_REF_PTS

    rng = np.random.default_rng(1)
    raw = rng.uniform(0, 255, (2, 160, 160, 3)).astype(np.float32)
    lmk = (ARCFACE_REF_PTS[None].repeat(2, 0) + 20).astype(np.float32)
    out = model.align(raw, lmk, out_hw=(112, 96))
    assert out.shape == (2, 112, 96, 3)


def test_from_pretrained_roundtrip(tmp_path, model):
    """Save our params as released-style .pth files, reload via the facade,
    embeddings identical."""
    from ffrnet_tpu.checkpoint.pth_io import save_pth
    from ffrnet_tpu.checkpoint.torch_convert import (
        backbone_to_torch, recnet_to_torch)

    enc_path = tmp_path / "se50.pth"
    rec_path = tmp_path / "FFRNet.pth.gzip"
    save_pth(backbone_to_torch(model.enc_params, model.enc_state),
             str(enc_path), use_torch=False)
    save_pth({"RecNet": recnet_to_torch(model.rec_params, model.rec_state)},
             str(rec_path), use_torch=False)

    loaded = FFRNet.from_pretrained(str(enc_path), str(rec_path),
                                    fold_bn=False)
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32))
    r1, n1 = model.embed(imgs)
    r2, n2 = loaded.embed(imgs)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=1e-6)

    folded = FFRNet.from_pretrained(str(enc_path), str(rec_path), fold_bn=True)
    r3, n3 = folded.embed(imgs)
    np.testing.assert_allclose(np.asarray(r3), np.asarray(r1), atol=5e-4)


def test_evaluate_protocol(model):
    rng = np.random.default_rng(3)

    def batches():
        for _ in range(2):
            yield {
                "img1": jnp.asarray(rng.uniform(-1, 1, (10, 112, 112, 3))
                                    .astype(np.float32)),
                "img2": jnp.asarray(rng.uniform(-1, 1, (10, 112, 112, 3))
                                    .astype(np.float32)),
                "label": jnp.asarray(rng.integers(0, 2, 10)),
            }

    acc_new, acc = model.evaluate(batches())
    assert 0.0 <= acc_new <= 1.0 and 0.0 <= acc <= 1.0


def test_embed_files_full_ingest(tmp_path):
    """FFRNet.embed_files: files -> decode -> auto-warp align -> embeddings,
    on the pinned golden JPEG."""
    import os
    import shutil

    from ffrnet_tpu.api import FFRNet

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "golden")
    p1 = str(tmp_path / "a.jpg")
    p2 = str(tmp_path / "b.jpg")
    shutil.copy(os.path.join(fixture, "face_0.jpg"), p1)
    shutil.copy(os.path.join(fixture, "face_0.jpg"), p2)
    lmk = np.load(os.path.join(fixture, "expected.npz"))["landmarks"]
    lmk = np.stack([lmk, lmk]).astype(np.float32)

    model = FFRNet.random(0)
    raw, rect = model.embed_files([p1, p2], lmk)
    assert raw.shape == rect.shape == (2, 512)
    # identical files + landmarks -> identical embeddings; raw is L2-normed
    np.testing.assert_allclose(np.asarray(raw[0]), np.asarray(raw[1]),
                               atol=1e-6)
    np.testing.assert_allclose(float(jnp.linalg.norm(raw[0])), 1.0, atol=1e-4)


def test_prepare_quantize_int8(model):
    """Opt-in int8 encoder (models/quantize.py) through the facade: folded
    + quantized model tracks the float model's embeddings closely."""
    from ffrnet_tpu.ops import quant

    qmodel = model.prepare(fold_bn=True, quantize_int8=True)
    assert quant.is_quantized(qmodel.enc_params["body"][0]["res"]["conv1"]["w"])
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32))
    raw_f, rect_f = model.embed(imgs)
    raw_q, rect_q = qmodel.embed(imgs)
    cos = np.sum(np.asarray(raw_f) * np.asarray(raw_q), axis=1)
    assert (cos > 0.99).all(), cos
    # rectified path (RecNet stays float) also tracks
    cos_r = np.sum(np.asarray(rect_f) * np.asarray(rect_q), axis=1) / (
        np.linalg.norm(np.asarray(rect_f), axis=1)
        * np.linalg.norm(np.asarray(rect_q), axis=1))
    assert (cos_r > 0.98).all(), cos_r


def test_prepare_on_quantized_model_guards(model):
    """Re-calling prepare() on an already-quantized model: fold_bn raises a
    clear error (BN folding cannot rewrite int8 leaves), and a dtype cast
    keeps the f32 dequant scales intact (ADVICE r2 #1)."""
    qmodel = model.prepare(fold_bn=True, quantize_int8=True)
    with pytest.raises(ValueError, match="already-int8-quantized"):
        qmodel.prepare(fold_bn=True)
    recast = qmodel.prepare(dtype=jnp.bfloat16)
    wq = recast.enc_params["body"][0]["res"]["conv1"]["w"]
    assert wq["q"].dtype == jnp.int8
    assert wq["scale"].dtype == jnp.float32  # NOT silently bf16
    # float leaves outside quantized dicts did cast
    assert recast.enc_params["input"]["conv"]["w"].dtype == jnp.bfloat16
    # idempotent re-quantization keeps working
    again = recast.prepare(quantize_int8=True)
    w2 = again.enc_params["body"][0]["res"]["conv1"]["w"]
    assert (np.asarray(w2["q"]) == np.asarray(wq["q"])).all()


def test_calibrate_int8_normalizes_uint8_batches(monkeypatch):
    """uint8 calibration batches (the loader's default upload format,
    which embed() normalizes transparently) must get the same [-1,1]
    normalization before calibration — raw 0..255 activations would bake
    scales ~127x too large with no error (round-5 review)."""
    from ffrnet_tpu.data.datasets import _to_unit
    from ffrnet_tpu.models import quantize as qmod

    captured = {}

    def fake_cal(qp, st, xb, *, margin, capture_featmaps=None):
        captured["xb"] = [np.asarray(x, np.float32) for x in xb]
        return qp

    monkeypatch.setattr(qmod, "calibrate_activation_scales", fake_cal)
    m = FFRNet.random(0).prepare(quantize_int8=True)
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 112, 112, 3), dtype=np.uint8)
    m.calibrate_int8([u8])
    got = captured["xb"][0]
    np.testing.assert_allclose(got, _to_unit(u8), atol=1e-6)
    # float batches pass through unchanged
    f32 = rng.uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32)
    m.calibrate_int8([f32])
    np.testing.assert_allclose(captured["xb"][0], f32, atol=1e-6)


def test_verify_mixed_uint8_device_side_normalize():
    """verify() with a DEVICE uint8 side normalizes on device (no host
    fetch + re-upload; round-5 review) and matches the all-float result."""
    model = FFRNet.random(0)
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, (2, 112, 112, 3), dtype=np.uint8)
    f2 = rng.uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32)
    from ffrnet_tpu.data.datasets import _to_unit

    want = np.asarray(model.verify(_to_unit(u8), f2), np.float32)
    got = np.asarray(model.verify(jnp.asarray(u8), f2), np.float32)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
