"""Generate the pinned end-to-end golden fixture (run once, committed).

Creates a real JPEG + landmarks and pins every stage of the
file -> decode -> align -> encode -> rectify pipeline with fp32/HIGHEST
numerics on CPU, so the full ingest path has a golden regression anchor
without needing torch, the released weights, or any dataset at test time
(VERDICT r1 "What's missing" item 1).

    python tests/fixtures/golden/generate.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
from PIL import Image  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def synth_face(seed: int) -> np.ndarray:
    """Smooth, JPEG-friendly 250x250 synthetic portrait."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:250, 0:250].astype(np.float32)
    img = np.stack([
        120 + 60 * np.sin(yy / 40 + c) + 50 * np.cos(xx / 31 - c)
        for c in range(3)], axis=-1)
    # face-ish blobs (eyes / nose / mouth) at the landmark scale
    for (cy, cx, r, amp) in [(120, 95, 18, 70), (120, 155, 18, 70),
                             (165, 125, 12, -50), (205, 125, 25, 40)]:
        img += amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2)
                            / (2 * r * r))[..., None]
    img += rng.normal(0, 2.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def main() -> None:
    from ffrnet_tpu.models import irse, recnet
    from ffrnet_tpu.ops.align import ARCFACE_REF_PTS, align_faces

    img_u8 = synth_face(7)
    jpg_path = os.path.join(HERE, "face_0.jpg")
    Image.fromarray(img_u8).save(jpg_path, quality=95)

    # landmarks: ArcFace points at the synthetic face's scale, integer
    # (matching the reference lfw_landmark.txt format)
    lmk = np.round(ARCFACE_REF_PTS * 2.1 + 15).astype(np.int64)
    with open(os.path.join(HERE, "landmarks.txt"), "w") as f:
        f.write("A_Person/face_0.jpg\t" +
                "\t".join(str(v) for v in lmk.ravel()) + "\n")

    decoded = np.asarray(Image.open(jpg_path).convert("RGB"), np.uint8)
    aligned = np.asarray(align_faces(
        jnp.asarray(decoded[None], jnp.float32),
        jnp.asarray(lmk[None], jnp.float32),
        out_hw=(112, 112), impl="gather"))[0]

    x = jnp.asarray((aligned[None] / 127.5 - 1.0)[..., ::-1])  # BGR, [-1,1]
    enc_p, enc_s = irse.init(jax.random.PRNGKey(0))
    rec_p, rec_s = recnet.init(jax.random.PRNGKey(1))
    fm, raw_embed, _ = irse.apply(enc_p, enc_s, x, training=False)
    (rect_embed, _), _ = recnet.apply(rec_p, rec_s, fm, training=False)

    np.savez_compressed(
        os.path.join(HERE, "expected.npz"),
        decoded=decoded, landmarks=lmk, aligned=aligned.astype(np.float32),
        raw_embed=np.asarray(raw_embed)[0], rect_embed=np.asarray(rect_embed)[0])
    print("fixture written:", jpg_path)


if __name__ == "__main__":
    main()
