"""Channel-padded stem: exact-math drop-in (models/optimize.py
pad_stem_input_channels + shape-driven x-pad in irse.apply).

Rebuilds nothing from the reference — this is a TPU-layout optimization
of the stem conv (pretrain/model_ir_se50.py:86 of /root/reference); the
contract is bit-identical embeddings in f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffrnet_tpu.models import irse
from ffrnet_tpu.models.optimize import fold_backbone_bn, \
    pad_stem_input_channels


@pytest.fixture(scope="module")
def tree():
    p, s = irse.init(jax.random.PRNGKey(0))
    return p, s


def test_padded_stem_exact_f32(tree):
    p, s = tree
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 112, 112, 3)), jnp.float32)
    ref = irse.apply(p, s, x, training=False)
    pp = pad_stem_input_channels(p)
    assert pp["input"]["conv"]["w"].shape == (3, 3, 8, 64)
    got = irse.apply(pp, s, x, training=False)
    # zero input channels contribute exactly 0 to the contraction
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))


def test_padded_stem_on_folded_tree(tree):
    p, s = tree
    fp, fs = fold_backbone_bn(p, s)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 112, 112, 3)), jnp.float32)
    ref = irse.apply(fp, fs, x, training=False)[1]
    got = irse.apply(pad_stem_input_channels(fp), fs, x,
                     training=False)[1]
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_pad_idempotent_and_preserves_bias(tree):
    p, _ = tree
    fp = pad_stem_input_channels(pad_stem_input_channels(p))
    assert fp["input"]["conv"]["w"].shape == (3, 3, 8, 64)
    # non-stem leaves untouched
    assert fp["body"][0]["res"]["conv1"]["w"].shape \
        == p["body"][0]["res"]["conv1"]["w"].shape
