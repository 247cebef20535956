"""Minimal user journey: load (or random-init) the models, embed aligned
faces, score verification pairs.

    python examples/embed_and_verify.py [se50.pth [FFRNet.pth]]

Replaces the reference's in-process pattern of building Backbone + RecNet
by hand and looping batches (lfw/lfw_eval.py:226-252).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from ffrnet_tpu.api import FFRNet

    if len(sys.argv) > 1:
        model = FFRNet.from_pretrained(
            sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "")
    else:
        print("(no weights given: random init — scores are meaningless)")
        model = FFRNet.random(0)

    # aligned 112x112 BGR faces in [-1, 1] — see FFRNet.align / embed_files
    # for the raw-image ingest path
    rng = np.random.default_rng(0)
    faces = rng.uniform(-1, 1, (8, 112, 112, 3)).astype(np.float32)

    raw, rect = model.embed(faces)
    print(f"raw embeddings {raw.shape}, rectified {rect.shape}")

    scores = model.verify(faces[:4], faces[4:])  # rectified cosine per pair
    print("pair scores:", np.asarray(scores).round(4))


if __name__ == "__main__":
    main()
