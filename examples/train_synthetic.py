"""Train the full FFR-Net objective on synthetic paired data (no CASIA
needed) — the smallest complete training loop.

    python examples/train_synthetic.py [steps]

For the real thing use the driver (same engine underneath):
    python -m ffrnet_tpu.train --phase train --train_data <casia_root> ...
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from ffrnet_tpu.models import irse
    from ffrnet_tpu.models.recnet import RecNetConfig
    from ffrnet_tpu.training.trainer import (TrainerConfig,
                                             create_train_state, train_step)

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_ids, batch = 32, 16
    cfg = TrainerConfig(optimizer="adam", lr=1e-3, compute_dtype="bf16",
                        recnet=RecNetConfig(num_classes=n_ids))

    enc_params, enc_state = irse.init(jax.random.PRNGKey(0))  # frozen
    state = create_train_state(jax.random.PRNGKey(1), cfg)
    step = jax.jit(lambda s, b: train_step(enc_params, enc_state, s, b,
                                           cfg=cfg), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    # synthetic identities: a fixed clean face per id; the "masked" twin
    # zeroes the lower half (the occlusion the objective must rectify)
    bank = rng.uniform(-1, 1, (n_ids, 112, 112, 3)).astype(np.float32)
    for i in range(steps):
        labels = rng.integers(0, n_ids, batch)
        clean = bank[labels] + rng.normal(0, 0.05, (batch, 112, 112, 3)).astype(np.float32)
        masked = clean.copy()
        masked[:, 56:] = 0.0
        state, m = step(state, {"img_non": clean, "img_ocl": masked,
                                "label": labels.astype(np.int32)})
        if i % 5 == 0 or i == steps - 1:
            print(f"step {i:4d}  total={float(m['TotalLoss']):.4f}  "
                  f"acc={float(m['TrainAcc']):.3f}")


if __name__ == "__main__":
    main()
