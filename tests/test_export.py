"""StableHLO export of the inference graph (tools/export_model.py).

The reference's only model-distribution format is a pickled state_dict
(utils/utils.py:110-123); the export artifact is the deployment-side
equivalent for StableHLO-bearing runtimes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ffrnet_tpu.api import FFRNet


@pytest.mark.slow
def test_export_symbolic_batch_roundtrip(tmp_path):
    from jax import export as jex

    from ffrnet_tpu.tools.export_model import export_embed

    model = FFRNet.random(0)
    exp = export_embed(model, symbolic_batch=True)
    assert str(exp.in_avals[0].shape[0]) == "b"

    blob = exp.serialize()
    rt = jex.deserialize(blob)

    # one artifact serves multiple batch sizes
    for n in (3, 8):
        x = np.random.default_rng(n).uniform(
            -1, 1, (n, 112, 112, 3)).astype(np.float32)
        raw_rt, rect_rt = rt.call(jnp.asarray(x))
        raw, rect = model.embed(x)
        np.testing.assert_allclose(np.asarray(raw_rt), np.asarray(raw),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(rect_rt), np.asarray(rect),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_export_int8_all_model():
    """The calibrated int8 tree (encoder + RecNet conv chains) must lower
    through jax.export too: quant/dequant are pure jnp ops, so the int8
    deployment artifact needs no custom calls. Trace-only (no execution —
    int8 emulation on CPU is too slow to run here)."""
    from ffrnet_tpu.tools.export_model import export_embed

    m = FFRNet.random(0).prepare(fold_bn=True, quantize_int8="all")
    cal = np.random.default_rng(2).uniform(
        -1, 1, (2, 112, 112, 3)).astype(np.float32)
    m = m.calibrate_int8([cal])
    exp = export_embed(m, symbolic_batch=True)
    txt = exp.mlir_module()
    # int8 weights must actually be in the module (not dequantized away
    # at trace time) for the MXU int8 path to survive deployment
    assert "i8" in txt
    assert exp.in_avals[0].shape[1:] == (112, 112, 3)
