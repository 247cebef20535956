"""Pinned end-to-end golden: file -> decode -> align -> encode -> rectify.

The fixture (tests/fixtures/golden/, built by generate.py there) pins every
stage of the real ingest pipeline with fp32/HIGHEST numerics, so the whole
path has a regression anchor that needs no torch, no released weights, and
no dataset at test time (VERDICT r1 "What's missing" item 1)."""

import os
import shutil

import numpy as np

import jax
import jax.numpy as jnp

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden")


def test_pinned_jpeg_end_to_end(tmp_path):
    from PIL import Image

    from ffrnet_tpu.models import irse, recnet
    from ffrnet_tpu.ops.align import align_faces
    from ffrnet_tpu.tools.align_dataset import align_tree

    exp = np.load(os.path.join(FIXTURE, "expected.npz"))
    lmk = exp["landmarks"].astype(np.float32)

    # 1. decode: byte-for-byte stable JPEG decoding
    decoded = np.asarray(
        Image.open(os.path.join(FIXTURE, "face_0.jpg")).convert("RGB"))
    assert np.array_equal(decoded, exp["decoded"]), \
        "JPEG decode drifted — regenerate fixture and investigate decoder"

    # 2. align: exact gather path matches pinned crop; the production
    # column-band paths agree within matmul tolerance
    aligned = np.asarray(align_faces(
        jnp.asarray(decoded[None], jnp.float32), jnp.asarray(lmk[None]),
        out_hw=(112, 112), impl="gather"))[0]
    np.testing.assert_allclose(aligned, exp["aligned"], atol=1e-3)
    for impl in ("tiled", "pallas_band", "mxu"):
        got = np.asarray(align_faces(
            jnp.asarray(decoded[None], jnp.float32), jnp.asarray(lmk[None]),
            out_hw=(112, 112), impl=impl))[0]
        np.testing.assert_allclose(got, exp["aligned"], atol=2e-2,
                                   err_msg=impl)

    # 3. the offline tool writes the same crop from the same file tree
    src = tmp_path / "lfw"
    (src / "A_Person").mkdir(parents=True)
    shutil.copy(os.path.join(FIXTURE, "face_0.jpg"),
                src / "A_Person" / "face_0.jpg")
    out = tmp_path / "aligned"
    n = align_tree(str(src), os.path.join(FIXTURE, "landmarks.txt"),
                   str(out), out_hw=(112, 112), impl="gather")
    assert n == 1
    crop = np.asarray(Image.open(out / "A_Person" / "face_0.jpg").convert("RGB"))
    # tool output is uint8 + JPEG-recompressed; bound the drift
    assert np.abs(crop.astype(np.float32) - exp["aligned"]).mean() < 3.0

    # 4. embeddings: seed-pinned random-init encoder + recnet
    x = jnp.asarray((exp["aligned"][None] / 127.5 - 1.0)[..., ::-1])
    enc_p, enc_s = irse.init(jax.random.PRNGKey(0))
    rec_p, rec_s = recnet.init(jax.random.PRNGKey(1))
    fm, raw_embed, _ = irse.apply(enc_p, enc_s, x, training=False)
    (rect_embed, _), _ = recnet.apply(rec_p, rec_s, fm, training=False)
    np.testing.assert_allclose(np.asarray(raw_embed)[0], exp["raw_embed"],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(rect_embed)[0], exp["rect_embed"],
                               atol=1e-5)
