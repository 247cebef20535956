"""Golden-value parity: our NHWC JAX models vs the PyTorch reference modules.

The reference modules are imported (read-only) solely to produce expected
outputs from randomly initialized weights; weights flow through the
checkpoint converters, so these tests cover converter + model numerics at
once.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ffrnet_tpu.checkpoint.torch_convert import backbone_from_torch, recnet_from_torch
from ffrnet_tpu.models import irse, recnet
from ffrnet_tpu.models.recnet import RecNetConfig
from ffrnet_tpu.ops.similarity import self_similarity


def _sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def ref_backbone(reference):
    torch = reference.torch
    torch.manual_seed(0)
    model = reference.irse.Backbone(num_layers=50, drop_ratio=0.6, mode="ir_se")
    # Random running stats so BN eval behavior is actually exercised.
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    model.eval()
    return model


@pytest.fixture(scope="module")
def ref_recnet(reference):
    torch = reference.torch
    torch.manual_seed(1)
    model = reference.recnet.RecNet(norm_type="bn", relu_type="prelu")
    reference.recnet.init_weights(model, "kaiming")
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    model.eval()
    return model


def test_backbone_parity(reference, ref_backbone):
    torch = reference.torch
    rng = np.random.default_rng(10)
    x = rng.uniform(-1, 1, size=(2, 3, 112, 112)).astype(np.float32)

    with torch.no_grad():
        featmap_t, embed_t = ref_backbone(torch.from_numpy(x))

    params, state = backbone_from_torch(_sd_numpy(ref_backbone))
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    featmap, embed, _ = jax.jit(
        lambda p, s, v: irse.apply(p, s, v, training=False)
    )(params, state, x_nhwc)

    np.testing.assert_allclose(
        np.asarray(featmap).transpose(0, 3, 1, 2), featmap_t.numpy(),
        atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(embed), embed_t.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_c4c_factored_matches_materialized():
    """The default 'factored' channel attention (Gram never materialized,
    recnet._conv4channel_factored) must match the literal reference
    dataflow to float-reassociation tolerance, in both modes."""
    import dataclasses

    from ffrnet_tpu.models import recnet as rn

    cfg_f = rn.RecNetConfig(num_classes=16)
    cfg_m = dataclasses.replace(cfg_f, c4c_impl="materialized")
    params, state = rn.init(jax.random.PRNGKey(3), cfg_f)
    rng = np.random.default_rng(0)
    fm = jnp.asarray(rng.standard_normal((3, 7, 7, 512)).astype(np.float32))
    (fv_f, fn_f), _ = rn.apply(params, state, fm, cfg=cfg_f, training=False)
    (fv_m, fn_m), _ = rn.apply(params, state, fm, cfg=cfg_m, training=False)
    np.testing.assert_allclose(np.asarray(fv_f), np.asarray(fv_m), atol=5e-5)
    np.testing.assert_allclose(np.asarray(fn_f), np.asarray(fn_m), atol=5e-4)

    lab = jnp.asarray([0, 1, 2])
    out_f, _ = rn.apply(params, state, fm, lab, cfg=cfg_f, training=True)
    out_m, _ = rn.apply(params, state, fm, lab, cfg=cfg_m, training=True)
    for name in ("feat_new_v", "logits", "m_channel", "feat_channel"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_f, name)),
            np.asarray(getattr(out_m, name)), atol=5e-5,
            err_msg=name)


def test_self_similarity_parity(reference, ref_recnet):
    torch = reference.torch
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 512, 7, 7)).astype(np.float32)
    ss_space_t, ss_channel_t = reference.recnet.selfSimilarity(torch.from_numpy(x))

    ss_space, ss_channel = self_similarity(jnp.asarray(x.transpose(0, 2, 3, 1)))
    # reference views ss_space as (N, HW, H, W)
    np.testing.assert_allclose(
        np.asarray(ss_space).transpose(0, 2, 1).reshape(2, 49, 7, 7),
        ss_space_t.numpy(), atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ss_channel), ss_channel_t.numpy(),
                               atol=2e-5, rtol=1e-5)


def test_recnet_inference_parity(reference, ref_recnet):
    torch = reference.torch
    rng = np.random.default_rng(12)
    x = rng.standard_normal((2, 512, 7, 7)).astype(np.float32) * 2.0

    with torch.no_grad():
        feat_v_t, feat_new_t = ref_recnet(torch.from_numpy(x))

    cfg = RecNetConfig()
    params, state = recnet_from_torch(_sd_numpy(ref_recnet), cfg)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    (feat_v, feat_new), _ = jax.jit(
        lambda p, s, v: recnet.apply(p, s, v, cfg=cfg, training=False)
    )(params, state, x_nhwc)

    np.testing.assert_allclose(np.asarray(feat_v), feat_v_t.numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(feat_new).transpose(0, 3, 1, 2),
                               feat_new_t.numpy(), atol=5e-4, rtol=1e-3)


def test_cosface_margin_math(reference):
    """AddMarginProduct math (models/recnet.py:257-270) — torch formula
    recomputed here on CPU (the reference module hardcodes device='cuda')."""
    torch = reference.torch
    rng = np.random.default_rng(13)
    feat = rng.standard_normal((4, 512)).astype(np.float32)
    w = rng.standard_normal((10575, 512)).astype(np.float32)
    label = np.array([5, 0, 10574, 123])

    ft, wt = torch.from_numpy(feat), torch.from_numpy(w)
    cos_t = torch.nn.functional.linear(
        torch.nn.functional.normalize(ft), torch.nn.functional.normalize(wt))
    one_hot = torch.zeros_like(cos_t)
    one_hot.scatter_(1, torch.from_numpy(label).view(-1, 1), 1)
    expected = ((one_hot * (cos_t - 0.40)) + (1.0 - one_hot) * cos_t) * 30.0

    logits, cosine = recnet.add_margin_logits(
        jnp.asarray(w), jnp.asarray(feat), jnp.asarray(label),
        s=30.0, m=0.40, num_classes=10575)
    np.testing.assert_allclose(np.asarray(logits), expected.numpy(),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cosine), cos_t.numpy(),
                               atol=2e-5, rtol=1e-5)


def test_recnet_roundtrip_to_torch(reference, ref_recnet):
    """Converter round-trip preserves every tensor bit-exactly."""
    from ffrnet_tpu.checkpoint.torch_convert import recnet_to_torch

    sd = _sd_numpy(ref_recnet)
    params, state = recnet_from_torch(sd)
    back = recnet_to_torch(params, state)
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(back[k], v, err_msg=k)


def test_backbone_roundtrip_to_torch(reference, ref_backbone):
    from ffrnet_tpu.checkpoint.torch_convert import backbone_to_torch

    sd = _sd_numpy(ref_backbone)
    params, state = backbone_from_torch(sd)
    back = backbone_to_torch(params, state)
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(back[k], v, err_msg=k)
