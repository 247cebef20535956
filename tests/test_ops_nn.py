"""Primitive-op parity tests against PyTorch semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ffrnet_tpu.ops import nn as ops

torch = pytest.importorskip("torch")


def _t(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2))


def _j(t_nchw):
    return t_nchw.detach().numpy().transpose(0, 2, 3, 1)


def test_conv2d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 5), dtype=np.float32)
    w = rng.standard_normal((3, 3, 5, 7), dtype=np.float32)
    b = rng.standard_normal(7, dtype=np.float32)
    ours = ops.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=2, padding=1)
    theirs = torch.nn.functional.conv2d(
        _t(x), torch.from_numpy(w.transpose(3, 2, 0, 1)), torch.from_numpy(b),
        stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(ours), _j(theirs), atol=2e-5, rtol=1e-5)


def test_reflect_pad_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 5, 5, 3), dtype=np.float32)
    ours = ops.reflect_pad(jnp.asarray(x), 1)
    theirs = torch.nn.functional.pad(_t(x), (1, 1, 1, 1), mode="reflect")
    np.testing.assert_allclose(np.asarray(ours), _j(theirs), atol=0)


@pytest.mark.parametrize("training", [False, True])
def test_batch_norm_matches_torch(training):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 6, 6, 3), dtype=np.float32)
    scale = rng.standard_normal(3, dtype=np.float32)
    bias = rng.standard_normal(3, dtype=np.float32)
    mean = rng.standard_normal(3, dtype=np.float32)
    var = rng.random(3, dtype=np.float32) + 0.5

    bn = torch.nn.BatchNorm2d(3)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
    bn.train(training)
    expected = bn(_t(x))

    y, new_mean, new_var = ops.batch_norm(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
        jnp.asarray(mean), jnp.asarray(var), training=training)
    np.testing.assert_allclose(np.asarray(y), _j(expected), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_mean), bn.running_mean.numpy(),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_var), bn.running_var.numpy(),
                               atol=1e-6, rtol=1e-6)


def test_prelu_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 4, 4, 6), dtype=np.float32)
    slope = rng.random(6, dtype=np.float32)
    prelu = torch.nn.PReLU(6)
    with torch.no_grad():
        prelu.weight.copy_(torch.from_numpy(slope))
    expected = prelu(_t(x))
    ours = ops.prelu(jnp.asarray(x), jnp.asarray(slope), axis=-1)
    np.testing.assert_allclose(np.asarray(ours), _j(expected), atol=0)


def test_prelu_dim1_on_3d():
    # torch PReLU(512) on (N, 512, K) broadcasts the slope over dim 1 —
    # the Conv4Channel pattern (reference models/recnet.py:372-386).
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 5, 3), dtype=np.float32)
    slope = rng.random(5, dtype=np.float32)
    prelu = torch.nn.PReLU(5)
    with torch.no_grad():
        prelu.weight.copy_(torch.from_numpy(slope))
    with torch.no_grad():
        expected = prelu(torch.from_numpy(x)).numpy()
    ours = ops.prelu(jnp.asarray(x), jnp.asarray(slope), axis=1)
    np.testing.assert_allclose(np.asarray(ours), expected, atol=0)


def test_stride_pool_matches_maxpool1():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 14, 14, 3), dtype=np.float32)
    expected = torch.nn.MaxPool2d(1, 2)(_t(x))
    ours = ops.stride_pool(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(ours), _j(expected), atol=0)


def test_avg_pool_7x7():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 7, 7, 4), dtype=np.float32)
    expected = torch.nn.AvgPool2d((7, 7), (1, 1))(_t(x)).flatten(1).numpy()
    ours = np.asarray(ops.avg_pool(jnp.asarray(x), 7)).reshape(2, 4)
    np.testing.assert_allclose(ours, expected, atol=1e-6, rtol=1e-6)


def test_l2_normalize_matches_f_normalize():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((3, 5), dtype=np.float32)
    expected = torch.nn.functional.normalize(torch.from_numpy(x), dim=1).numpy()
    ours = np.asarray(ops.l2_normalize(jnp.asarray(x), axis=1))
    np.testing.assert_allclose(ours, expected, atol=1e-6, rtol=1e-6)


def test_upsample_nearest_2x():
    rng = np.random.default_rng(8)
    x = rng.standard_normal((1, 3, 3, 2), dtype=np.float32)
    expected = torch.nn.functional.interpolate(_t(x), scale_factor=2, mode="nearest")
    ours = ops.upsample_nearest_2x(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), _j(expected), atol=0)


def test_irse_apply_rejects_mismatched_mode_and_depth():
    """An ir_se params tree under mode='ir' would silently skip every SE
    gate; a deeper tree under the default num_layers would zip-truncate
    to 24 units — both must fail fast (round-5 review)."""
    import pytest

    from ffrnet_tpu.models import irse

    params, state = irse.init(jax.random.PRNGKey(0))  # ir_se, 50
    x = jnp.zeros((1, 112, 112, 3), jnp.float32)
    with pytest.raises(ValueError, match="SE blocks"):
        irse.apply(params, state, x, mode="ir")
    with pytest.raises(ValueError, match="residual units"):
        irse.apply(params, state, x, num_layers=100)
    with pytest.raises(ValueError, match="rng"):
        irse.apply(params, state, x, training=True)


def test_gen_occlusion_mask_reaches_every_placement():
    """The mask must be able to sit flush to the bottom/right edge
    (integers() is high-exclusive; round-5 review off-by-one)."""
    from ffrnet_tpu.data.datasets import gen_occlusion_mask

    rng = np.random.default_rng(0)
    hit_edge = False
    for _ in range(200):
        m = gen_occlusion_mask(rng, (8, 8), (4, 4))
        if m[7, 7, 0] == 0.0:
            hit_edge = True
            break
    assert hit_edge, "flush bottom-right placement never sampled"
