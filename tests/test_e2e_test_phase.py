"""End-to-end `--phase test` driver run: real LfwPairs tree -> full
IR-SE50+RecNet -> vectorized verification -> logged accuracies."""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_full_test_phase(tmp_path):
    from PIL import Image

    from ffrnet_tpu.checkpoint.store import save_checkpoint
    from ffrnet_tpu.data.datasets import _listdir_cached
    from ffrnet_tpu.models import recnet
    import jax

    _listdir_cached.cache_clear()
    rng = np.random.default_rng(0)

    # tiny LFW tree: 4 identities x 2 imgs + masked twins, 20 pairs
    root = tmp_path / "lfw"
    for pid in range(4):
        d = root / f"P_{pid}"
        d.mkdir(parents=True)
        base = rng.integers(0, 255, (112, 112, 3), dtype=np.uint8)
        for i in (1, 2):
            img = np.clip(base + rng.integers(-8, 8, base.shape), 0, 255)
            Image.fromarray(img.astype(np.uint8)).save(d / f"P_{pid}_{i:04}.jpg")
            img2 = img.copy()
            img2[60:] = 0
            Image.fromarray(img2.astype(np.uint8)).save(
                d / f"P_{pid}_{i:04}_mask.jpg")
    lines = ["20\n"]
    for k in range(10):
        lines.append(f"P_{k % 4}\t1\t2\n")
        lines.append(f"P_{k % 4}\t1\tP_{(k + 1) % 4}\t2\n")
    (root / "pairs.txt").write_text("".join(lines))

    # checkpoint to load
    weight_root = tmp_path / "weight"
    ckpt_dir = weight_root / "model_FFR-Net-loss_sphere-e2e"
    ckpt_dir.mkdir(parents=True)
    params, model_state = recnet.init(jax.random.PRNGKey(0))
    save_checkpoint(str(ckpt_dir), "latest", params=params,
                    model_state=model_state, epoch=0, iteration=1)

    from ffrnet_tpu.train import main

    main([
        "--phase", "test",
        "--test_data", str(root),
        "--test_pair_list", str(root / "pairs.txt"),
        "--weight_root", str(weight_root),
        "--other", "e2e",
        "--batch_size", "10",
        "--which_file", "latest",
        "--encoder_weights", "/nonexistent",
        "--nThread", "2",
        "--save_wrong", "1",
        "--report_roc", "1",
    ])

    # save_wrong wiring: random weights misclassify SOME pairs -> dumps
    import glob as _glob
    wrong_files = _glob.glob(str(ckpt_dir / "wrong_images*" / "*.png"))
    assert wrong_files, "save_wrong produced no misclassified-pair dumps"

    # accuracies landed in the JSON scalar export
    import glob
    import json

    scalar_files = glob.glob(str(weight_root / "log_dir" / "**" /
                                 "all_scalars.json"), recursive=True)
    assert scalar_files
    data = json.load(open(scalar_files[0]))
    keys = [k for k in data if k.startswith("test_acc")]
    assert any("ocl0" in k for k in keys)
    assert any("ocl2" in k for k in keys)
    for k in keys:
        for v in data[k]["values"]:
            assert 0.0 <= v <= 1.0

    # --report_roc 1: exact-ROC operating points per ocl for both kinds
    roc_keys = [k for k in data if k.startswith("test_roc_")]
    for kind in ("new", "raw"):
        for ocl in range(3):
            prefix = f"test_roc_{kind}/ocl{ocl}"
            have = [k for k in roc_keys if k.startswith(prefix)]
            assert any("eer" in k for k in have), (prefix, roc_keys)
            assert any("auc" in k for k in have)
            assert any("tar@far" in k for k in have)
    for k in roc_keys:
        for v in data[k]["values"]:
            assert 0.0 <= v <= 1.0
