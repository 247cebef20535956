"""Parity tests for the secondary model-zoo components (MobileFaceNet,
Arcface / Am_softmax heads, SELayer, HGBlock, MXU warp equivalence)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def test_mobilefacenet_parity(reference):
    from ffrnet_tpu.models import mobilefacenet

    t = reference.torch
    t.manual_seed(3)
    ref = reference.irse.MobileFaceNet(512).eval()
    with t.no_grad():
        for m in ref.modules():
            if isinstance(m, (t.nn.BatchNorm1d, t.nn.BatchNorm2d)):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    params, state = mobilefacenet.init(jax.random.PRNGKey(0))
    # wire weights across by name
    from ffrnet_tpu.models.mobilefacenet import _ARCH

    def conv_block_from(prefix, has_prelu):
        p = {"conv": {"w": sd[f"{prefix}.conv.weight"].transpose(2, 3, 1, 0)},
             "bn": {"scale": sd[f"{prefix}.bn.weight"],
                    "bias": sd[f"{prefix}.bn.bias"]}}
        s = {"bn": {"mean": sd[f"{prefix}.bn.running_mean"],
                    "var": sd[f"{prefix}.bn.running_var"]}}
        if has_prelu:
            p["prelu"] = {"slope": sd[f"{prefix}.prelu.weight"]}
        return p, s

    def dw_from(prefix):
        p1, s1 = conv_block_from(f"{prefix}.conv", True)
        p2, s2 = conv_block_from(f"{prefix}.conv_dw", True)
        p3, s3 = conv_block_from(f"{prefix}.project", False)
        return ({"conv": p1, "conv_dw": p2, "project": p3},
                {"conv": s1, "conv_dw": s2, "project": s3})

    params, state = {}, {}
    for name, kind, *_rest, nblocks in _ARCH:
        if kind in ("conv", "linear"):
            params[name], state[name] = conv_block_from(name, kind == "conv")
        elif kind == "dw":
            params[name], state[name] = dw_from(name)
        else:
            ps, ss = [], []
            for i in range(nblocks):
                p, s = dw_from(f"{name}.model.{i}")
                ps.append(p)
                ss.append(s)
            params[name], state[name] = ps, ss
    params["linear"] = {"w": sd["linear.weight"]}
    params["bn"] = {"scale": sd["bn.weight"], "bias": sd["bn.bias"]}
    state["bn"] = {"mean": sd["bn.running_mean"], "var": sd["bn.running_var"]}

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 3, 112, 112)).astype(np.float32)
    with t.no_grad():
        expected = ref(t.from_numpy(x)).numpy()
    ours, _ = mobilefacenet.apply(params, state,
                                  jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), expected, atol=3e-4, rtol=1e-3)


def test_am_softmax_head_matches_reference(reference):
    from ffrnet_tpu.models.heads import am_softmax_logits

    t = reference.torch
    t.manual_seed(4)
    ref = reference.irse.Am_softmax(embedding_size=64, classnum=100)
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((6, 64)).astype(np.float32)
    label = rng.integers(0, 100, 6)
    with t.no_grad():
        expected = ref(t.from_numpy(emb), t.from_numpy(label)).numpy()
    ours = am_softmax_logits(jnp.asarray(ref.kernel.detach().numpy()),
                             jnp.asarray(emb), jnp.asarray(label))
    np.testing.assert_allclose(np.asarray(ours), expected, atol=2e-5, rtol=1e-4)


def test_arcface_head_matches_reference(reference):
    from ffrnet_tpu.models.heads import arcface_logits

    t = reference.torch
    t.manual_seed(5)
    ref = reference.irse.Arcface(embedding_size=64, classnum=100)
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((6, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    label = rng.integers(0, 100, 6)
    with t.no_grad():
        expected = ref(t.from_numpy(emb), t.from_numpy(label)).numpy()
    ours = arcface_logits(jnp.asarray(ref.kernel.detach().numpy()),
                          jnp.asarray(emb), jnp.asarray(label))
    np.testing.assert_allclose(np.asarray(ours), expected, atol=5e-5, rtol=1e-4)


def test_se_layer_matches_reference(reference):
    from ffrnet_tpu.models.hourglass import apply_se_layer

    t = reference.torch
    t.manual_seed(6)
    ref = reference.recnet.SELayer(64, reduction=16)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 64, 7, 7)).astype(np.float32)
    with t.no_grad():
        expected, _ = ref(t.from_numpy(x))
    params = {
        "fc1": {"w": ref.fc[0].weight.detach().numpy()},
        "fc2": {"w": ref.fc[2].weight.detach().numpy()},
    }
    ours = apply_se_layer(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               expected.numpy(), atol=1e-5, rtol=1e-5)


def test_hgblock_runs():
    from ffrnet_tpu.models.hourglass import apply_hgblock, init_hgblock

    params, state = init_hgblock(jax.random.PRNGKey(0), depth=2, c_in=16,
                                 c_out=8, c_mid=12)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 16, 16, 16)).astype(np.float32))
    y, _ = apply_hgblock(params, state, x, depth=2)
    assert y.shape == (2, 16, 16, 8)
    assert np.isfinite(np.asarray(y)).all()


def test_warp_mxu_matches_gather():
    from ffrnet_tpu.ops.align import (
        ARCFACE_REF_PTS, cv2_transform, warp_affine, warp_affine_mxu)

    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.uniform(0, 255, (3, 140, 130, 3)).astype(np.float32))
    base = ARCFACE_REF_PTS[None].repeat(3, 0)
    pts = jnp.asarray((base * rng.uniform(0.8, 1.4, (3, 1, 1)) +
                       rng.uniform(5, 30, (3, 1, 2)) +
                       rng.normal(0, 2, (3, 5, 2))).astype(np.float32))
    ref = jnp.broadcast_to(jnp.asarray(ARCFACE_REF_PTS), pts.shape)
    mats = cv2_transform(pts, ref)
    a = np.asarray(warp_affine(imgs, mats, out_hw=(112, 96)))
    b = np.asarray(warp_affine_mxu(imgs, mats, out_hw=(112, 96)))
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-4)


def test_arc_margin_matches_reference(reference, monkeypatch):
    """Golden for arc_margin_logits vs the reference's OWN ArcMarginProduct
    (models/recnet.py:279-321), both easy_margin settings. The reference
    forward hardcodes device='cuda' for its one-hot (models/recnet.py:314);
    torch.zeros is patched to drop the device kwarg so the reference's own
    code runs on CPU — the math is untouched."""
    import sys

    sys.path.insert(0, "/root/reference")
    from models.recnet import ArcMarginProduct

    from ffrnet_tpu.models.recnet import arc_margin_logits

    orig_zeros = torch.zeros

    def cpu_zeros(*a, **k):
        k.pop("device", None)
        return orig_zeros(*a, **k)

    monkeypatch.setattr(torch, "zeros", cpu_zeros)

    rng = np.random.default_rng(0)
    feat = rng.standard_normal((6, 512)).astype(np.float32)
    label = rng.integers(0, 16, 6)
    for easy in (False, True):
        torch.manual_seed(3)
        ref = ArcMarginProduct(512, 16, s=30.0, m=0.50, easy_margin=easy)
        with torch.no_grad():
            exp_logits, exp_cos = ref(torch.from_numpy(feat),
                                      torch.from_numpy(label))
        w = jnp.asarray(ref.weight.detach().numpy())
        logits, cosine = arc_margin_logits(
            w, jnp.asarray(feat), jnp.asarray(label), s=30.0, m=0.50,
            easy_margin=easy, num_classes=16)
        np.testing.assert_allclose(np.asarray(logits), exp_logits.numpy(),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(cosine), exp_cos.numpy(),
                                   atol=1e-6)
        # class-axis padding contract (tensor-parallel sharding of odd
        # class counts): identical valid logits, masked padding
        w_pad = jnp.concatenate([w, jnp.zeros((4, 512))], axis=0)
        logits_p, cosine_p = arc_margin_logits(
            w_pad, jnp.asarray(feat), jnp.asarray(label), s=30.0, m=0.50,
            easy_margin=easy, num_classes=16)
        np.testing.assert_allclose(np.asarray(logits_p[:, :16]),
                                   np.asarray(logits), atol=5e-6)
        assert float(jnp.max(logits_p[:, 16:])) == -1e5
        assert (np.asarray(jnp.argmax(cosine_p, 1))
                == np.asarray(jnp.argmax(cosine, 1))).all()
