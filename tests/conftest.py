"""Test harness config: force CPU with 8 virtual devices for mesh tests."""

import os
import sys
import types

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The image preimports jax with a TPU (axon) backend via sitecustomize; the
# config update reliably forces the CPU backend even then.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def reference():
    """Import the upstream PyTorch reference for golden-value comparison.

    Used ONLY to generate expected outputs in parity tests; skipped when the
    reference checkout or torch is unavailable.
    """
    torch = pytest.importorskip("torch")
    from ffrnet_tpu.utils.reference_compat import install_reference_stubs

    if not install_reference_stubs(REFERENCE_ROOT):
        pytest.skip("reference checkout not available")
    import models.recnet as ref_recnet  # noqa: F401
    import pretrain.model_ir_se50 as ref_irse  # noqa: F401

    return types.SimpleNamespace(torch=torch, irse=ref_irse, recnet=ref_recnet)


@pytest.fixture
def lfw_tree(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    root = tmp_path / "lfw"
    pairs_lines = ["600\n"]
    # 6 identities x 2 images, 30 pairs cycled to n=60 for a 10-fold run
    names = [f"Person_{i}" for i in range(6)]
    for name in names:
        d = root / name
        d.mkdir(parents=True)
        base = rng.integers(0, 255, (112, 112, 3), dtype=np.uint8)
        for i in (1, 2):
            img = np.clip(base + rng.integers(-10, 10, base.shape), 0,
                          255).astype(np.uint8)
            Image.fromarray(img).save(d / f"{name}_{i:04}.jpg")
            Image.fromarray(img // 3).save(d / f"{name}_{i:04}_m.jpg")
    for k in range(30):
        i = k % 6
        pairs_lines.append(f"Person_{i}\t1\t2\n")  # same
        j, l = k % 6, (k + 1) % 6
        pairs_lines.append(f"Person_{j}\t1\tPerson_{l}\t2\n")  # diff
    pairs = root / "pairs.txt"
    pairs.write_text("".join(pairs_lines))
    return root, pairs
