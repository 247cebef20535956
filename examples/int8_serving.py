"""Int8 serving quickstart: the measured-fastest inference configuration.

Prepares the model for the int8 MXU path (fold BN -> int8 weights over
the encoder AND the RecNet conv chains -> calibrated static activation
scales), then embeds through the micro-batching EmbeddingService.

    python examples/int8_serving.py [se50.pth [FFRNet.pth]]

Measured on one v5e chip (BASELINE.md numbers-of-record): the full
align->encode->rectify pipeline runs 11.3k aligned faces/s at batch 256
— 1.34x the bf16 path — with held-out embedding cosine >=0.9993 vs
bf16. Calibrate on a few batches of REAL production images (the static
scales clip activations beyond the calibrated range; BASELINE.md's
margin sweep pins the safe band). The reference serves the frozen fp32
encoder with no quantized or serving path at all
(pretrain/model_ir_se50.py:108-154).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from ffrnet_tpu.api import FFRNet
    from ffrnet_tpu.serving import EmbeddingService

    if len(sys.argv) > 1:
        model = FFRNet.from_pretrained(
            sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "")
    else:
        print("(no weights given: random init — embeddings are meaningless)")
        model = FFRNet.random(0)

    # bf16 serve dtype + BN fold + int8 weights, then static scales from
    # calibration images. Use real aligned production faces here — these
    # two synthetic batches only make the example self-contained.
    model = model.prepare(fold_bn=True, dtype=jnp.bfloat16,
                          quantize_int8="all")
    rng = np.random.default_rng(0)
    cal = [rng.uniform(-1, 1, (8, 112, 112, 3)).astype(np.float32)
           for _ in range(2)]
    model = model.calibrate_int8(cal)

    svc = EmbeddingService(model, max_batch=256)
    svc.warmup()
    faces = rng.uniform(-1, 1, (16, 112, 112, 3)).astype(np.float32)
    raw, rectified = svc.submit(faces).result(timeout=600)
    print(f"int8 embeddings: raw {raw.shape} rectified {rectified.shape}")
    svc.close()


if __name__ == "__main__":
    main()
