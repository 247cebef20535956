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
