"""RecNet: spatial + channel feature-rectification network (the FFR-Net head).

Functional NHWC rebuild of the reference RecNet (models/recnet.py:347-429):

  1. self-similarity of the frozen 7x7x512 feature map -> ss_space (N,49,49),
     ss_channel (N,512,512)
  2. Conv4Space  on concat(featmap, ss_space)   -> spatial attention
     M_space (N,49,49) in (0,1)                 (models/recnet.py:362-371)
  3. Conv4Channel (3 stacked Linear->PReLU->Linear bottlenecks + sigmoid) on
     concat(flat featmap, ss_channel)           -> channel attention
     M_channel (N,512,512)                      (models/recnet.py:372-386)
  4. rectify: feat_space = X @ M_space, feat_channel = M_channel @ X
     where X is the (N,512,49) flattened map    (models/recnet.py:408-410)
     -> these two batched matmuls are the Pallas fusion target
  5. width-flip feat_channel, concat, ChannelFlipMerge conv
     (models/recnet.py:387-390,416-418)
  6. Conv4Merge on concat(feat_space, feat_channel, featmap) -> feat_new
  7. 7x7 avg-pool -> feat_new_v (N,512); CosFace AddMarginProduct classifier
     (s=30, m=0.40, 10575 classes)              (models/recnet.py:238-277)

All feature maps here are NHWC; the (N, C, HW) "flat" views used for the
rectification matmuls match the reference's row/column conventions exactly so
imported weights are numerically equivalent.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ffrnet_tpu.models import layers as L
from ffrnet_tpu.ops import nn as ops
from ffrnet_tpu.ops.similarity import self_similarity


@dataclass(frozen=True)
class RecNetConfig:
    channel: int = 512
    shape: int = 7  # spatial side of the feature map
    norm_type: str = "bn"
    relu_type: str = "prelu"
    num_classes: int = 10575
    s: float = 30.0  # CosFace scale
    m: float = 0.40  # CosFace additive margin
    ss_impl: str = "xla"  # 'xla' | 'pallas' self-similarity implementation
    c4c_impl: str = "factored"  # 'factored' | 'materialized' channel
    # attention: 'factored' never builds the (N,C,C) Gram (exact algebraic
    # rewrite, 2.7x faster — see _conv4channel_factored); 'materialized'
    # is the literal reference dataflow (and the path used when
    # ss_impl='pallas' supplies a fused Gram anyway)
    channel_impl: str = "xla"  # 'xla' | 'pallas_fused': inference-mode
    # channel branch. 'pallas_fused' runs the WHOLE branch (factored Gram
    # feed -> collapsed linears -> sigmoid -> rectification matmul) as one
    # VMEM-resident Pallas kernel per batch element, so the (N, C, C)
    # M_channel attention matrix never touches HBM
    # (ops/pallas/channel_branch.py — the SURVEY §7 8a fusion experiment).
    # Training and the materialized/pallas-ss paths always use XLA: the
    # train output tuple includes M_channel itself.
    remat_channel: bool = False  # jax.checkpoint ONLY the channel-attention
    # branch in training: recomputes the (N,512,512) M_channel + its
    # Linear/PReLU intermediates in the backward pass instead of storing
    # them — the dominant activation memory at large batch (BASELINE.md);
    # unlike full-branch remat (TrainerConfig.remat) the recompute here is
    # cheap (~27 GFLOP at N=256) relative to the bytes saved

    @property
    def hw(self) -> int:
        return self.shape * self.shape


class RecNetTrainOut(NamedTuple):
    """Training-mode outputs (mirrors reference return tuple,
    models/recnet.py:428-429)."""
    feat_new_v: jnp.ndarray  # (N, 512) rectified embedding (not normalized)
    logits: jnp.ndarray      # (N, num_classes) margin logits ("pred_loss")
    cosine: jnp.ndarray      # (N, num_classes) raw cosines ("pred_label")
    m_space: jnp.ndarray     # (N, 49, 49)
    m_channel: jnp.ndarray   # (N, 512, 512)
    feat_space: jnp.ndarray  # (N, 7, 7, 512) NHWC raw spatial-rectified map
    feat_channel: jnp.ndarray  # (N, 7, 7, 512) NHWC post-ChannelFlipMerge map
    # (the reference returns feat_channel AFTER ChannelFlipMerge,
    #  models/recnet.py:418,429)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init(key, cfg: RecNetConfig = RecNetConfig(), dtype=jnp.float32):
    """Kaiming-initialized params/state (reference applies
    init_weights(recnet, 'kaiming'), models/trainer.py:65-66)."""
    c, hw = cfg.channel, cfg.hw
    kw = {"norm_type": cfg.norm_type, "relu_type": cfg.relu_type, "dtype": dtype}
    ks = iter(jax.random.split(key, 24))

    def conv(cin, cout):
        return L.init_conv_layer(next(ks), cin, cout, 3, **kw)

    def res(ch):
        return L.init_residual_block(next(ks), ch, ch, 3, **kw)

    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}

    space_p, space_s = {}, {}
    for name, (p, s) in zip(
        ["c0", "r0", "c1", "r1", "c2", "r2"],
        [conv(c + hw, 256), res(256), conv(256, 128), res(128), conv(128, hw), res(hw)],
    ):
        space_p[name], space_s[name] = p, s
    params["conv4space"], state["conv4space"] = space_p, space_s

    chan_p: Dict[str, Any] = {}
    dims = [(c + hw, 32), (32, c), (c, 32), (32, c), (c, 32), (32, c)]
    for i, (din, dout) in enumerate(dims):
        chan_p[f"lin{i}"] = L.init_linear(next(ks), din, dout, dtype=dtype)
    for i in range(3):
        chan_p[f"prelu{i}"] = {"slope": jnp.full((c,), 0.25, dtype)}
    params["conv4channel"] = chan_p

    fm_c, fm_cs = conv(2 * c, c)
    fm_r, fm_rs = res(c)
    params["flipmerge"] = {"c": fm_c, "r": fm_r}
    state["flipmerge"] = {"c": fm_cs, "r": fm_rs}

    mg_c, mg_cs = conv(3 * c, c)
    mg_r, mg_rs = res(c)
    params["merge"] = {"c": mg_c, "r": mg_r}
    state["merge"] = {"c": mg_cs, "r": mg_rs}

    # CosFace head keeps xavier-uniform init (models/recnet.py:255; the
    # kaiming init pass skips it — classname has neither 'Conv' nor 'Linear').
    params["classifier"] = {
        "w": ops.xavier_uniform(next(ks), (cfg.num_classes, c), c, cfg.num_classes, dtype)
    }
    return params, state


# ---------------------------------------------------------------------------
# margin heads
# ---------------------------------------------------------------------------


def add_margin_logits(w, feat, label, *, s: float, m: float, num_classes: int):
    """CosFace / AddMarginProduct (models/recnet.py:238-270).

    w: (num_classes, feat_dim) — or (padded_classes, feat_dim) with
    padded_classes > num_classes when the class axis is zero-padded so it
    shards evenly over a 'model' mesh axis (the reference head is 10575
    classes, models/recnet.py:248 — odd, so any even tensor-parallel degree
    needs padding). Padded columns are masked to a large negative in the
    logits (-> zero softmax mass, zero gradient to the padded rows) and to
    -2 in the cosines (below any real cosine -> never argmax). Returns
    (logits, cosine), both (N, w.shape[0]). The margin is subtracted only
    at the target class; logits are scaled by s.
    """
    total = w.shape[0]
    if total > num_classes:
        valid = jnp.arange(total) < num_classes
        # Padded rows are all-zero: normalizing them would put a 0/0 NaN in
        # the backward pass (d||x||/dx at 0) that 0-cotangents do NOT kill,
        # poisoning feat grads via 0*NaN. Substitute a harmless constant row
        # — its cosine output is masked below, and jnp.where routes its
        # gradient away from w, so padded rows stay exactly zero.
        w = jnp.where(valid[:, None], w, jnp.ones((), w.dtype))
    cosine = jnp.matmul(
        ops.l2_normalize(feat, axis=1),
        ops.l2_normalize(w, axis=1).T,
        preferred_element_type=feat.dtype,
    )
    one_hot = jax.nn.one_hot(label, total, dtype=cosine.dtype)
    logits = s * (cosine - m * one_hot)
    if total > num_classes:
        logits = jnp.where(valid, logits, jnp.asarray(-1e5, logits.dtype))
        cosine = jnp.where(valid, cosine, jnp.asarray(-2.0, cosine.dtype))
    return logits, cosine


def arc_margin_logits(w, feat, label, *, s: float = 30.0, m: float = 0.50,
                      easy_margin: bool = False, num_classes: int = 10575):
    """ArcFace / ArcMarginProduct parity head (models/recnet.py:279-321).

    Accepts a class-axis-padded weight like add_margin_logits (same
    pad+mask contract for tensor-parallel sharding of odd class counts).
    """
    import math

    total = w.shape[0]
    if total > num_classes:
        valid = jnp.arange(total) < num_classes
        w = jnp.where(valid[:, None], w, jnp.ones((), w.dtype))
    cosine = jnp.matmul(
        ops.l2_normalize(feat, axis=1),
        ops.l2_normalize(w, axis=1).T,
        preferred_element_type=feat.dtype,
    )
    sine = jnp.sqrt(jnp.clip(1.0 - jnp.square(cosine), 0.0, 1.0))
    phi = cosine * math.cos(m) - sine * math.sin(m)
    if easy_margin:
        phi = jnp.where(cosine > 0, phi, cosine)
    else:
        phi = jnp.where(cosine > math.cos(math.pi - m), phi,
                        cosine - math.sin(math.pi - m) * m)
    one_hot = jax.nn.one_hot(label, total, dtype=cosine.dtype)
    logits = s * (one_hot * phi + (1.0 - one_hot) * cosine)
    if total > num_classes:
        logits = jnp.where(valid, logits, jnp.asarray(-1e5, logits.dtype))
        cosine = jnp.where(valid, cosine, jnp.asarray(-2.0, cosine.dtype))
    return logits, cosine


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _seq_conv_res(params, state, x, names, cfg, training):
    """Alternating ConvLayer / ResidualBlock chain."""
    new_state = {}
    kw = {"norm_type": cfg.norm_type, "relu_type": cfg.relu_type, "training": training}
    for name in names:
        if name.startswith("c"):
            x, s = L.apply_conv_layer(params[name], state[name], x, **kw)
        else:
            x, s = L.apply_residual_block(params[name], state[name], x, **kw)
        new_state[name] = s
    return x, new_state


def _conv4channel(params, x):
    """Three Linear(->32)->PReLU(512 rows)->Linear(->512) blocks + sigmoid.

    x: (N, 512, 561). PReLU slopes broadcast over dim 1 (the 512 rows),
    matching torch PReLU(512) applied to a (N, 512, 32) tensor
    (models/recnet.py:372-386).
    """
    for i in range(3):
        x = L.apply_linear(params[f"lin{2 * i}"], x)
        x = ops.prelu(x, params[f"prelu{i}"]["slope"], axis=1)
        x = L.apply_linear(params[f"lin{2 * i + 1}"], x)
    return jax.nn.sigmoid(x)


def _lin_2d(p, x):
    """Linear over the last axis via one flat 2-D matmul: measured ~1.6x the
    (N, R, K) batched form on TPU (BASELINE.md round 3)."""
    n, r, k = x.shape
    y = x.reshape(n * r, k) @ p["w"].T
    b = p.get("b")
    if b is not None:
        y = y + b
    return y.reshape(n, r, -1)


def _conv4channel_factored(params, flat, *, eps: float = 1e-12):
    """_conv4channel without ever materializing the (N, C, C) Gram.

    The reference feeds cat(flat, ss_channel) to the first Linear
    (models/recnet.py:380,406). Splitting that Linear's weight into the
    columns that hit `flat` (w1f, K=49) and the columns that hit the Gram
    (w1s, K=512), associativity gives an algebraically exact rewrite:

        ss_channel @ w1s.T = (ghat @ ghat.T) @ w1s.T = ghat @ (ghat.T @ w1s.T)

    with ghat = L2-normalized rows of `flat` — two rank-49 matmuls
    (~0.8 GFLOP at batch 256) instead of building and consuming a 134 MB
    (N,512,512) tensor (~4.3 GFLOP + the concat materialization). Measured
    2.7x on the whole channel branch (BASELINE.md round 3). The same
    associativity collapses the two inter-block Linear pairs (see inline
    comment), so the ONLY (N, C, C) tensor the branch ever builds is the
    final sigmoid attention matrix itself. Numerics differ from the
    materialized path only by float reassociation.

    flat: (N, C, HW) channel-major view of the feature map.
    """
    w1 = params["lin0"]["w"]           # (32, HW + C)
    b1 = params["lin0"].get("b")
    q = flat.shape[2]
    w1f, w1s = w1[:, :q], w1[:, q:]
    ghat = ops.l2_normalize(flat, axis=2, eps=eps)
    h = jnp.einsum("ncq,oq->nco", flat, w1f,
                   preferred_element_type=jnp.float32)
    t = jnp.einsum("od,ndq->noq", w1s, ghat,
                   preferred_element_type=jnp.float32).astype(flat.dtype)
    h = (h + jnp.einsum("ncq,noq->nco", ghat, t,
                        preferred_element_type=jnp.float32)
         ).astype(flat.dtype)
    if b1 is not None:
        h = h + b1
    h = ops.prelu(h, params["prelu0"]["slope"], axis=1)
    # The blocks chain as ... -> Linear(32->C) -> Linear(C->32) -> PReLU ...
    # with NO nonlinearity at the block boundary (models/recnet.py:372-386:
    # each block ends in its second Linear and the next block opens with its
    # first), so each (lin1,lin2) / (lin3,lin4) pair collapses to a single
    # (32,32) linear:
    #   (h @ Wa^T + ba) @ Wb^T + bb  =  h @ (Wb Wa)^T + (Wb ba + bb)
    # and the two (N, C, C) inter-block tensors are never materialized —
    # in training this also deletes their tape residuals. Exact up to float
    # reassociation; weight products accumulate in fp32.
    for i in (1, 2):
        pa, pb = params[f"lin{2 * i - 1}"], params[f"lin{2 * i}"]
        wc = jnp.matmul(pb["w"], pa["w"],
                        preferred_element_type=jnp.float32).astype(h.dtype)
        ba, bb = pa.get("b"), pb.get("b")
        bc = bb
        if ba is not None:
            bab = jnp.matmul(pb["w"], ba,
                             preferred_element_type=jnp.float32).astype(h.dtype)
            bc = bab if bb is None else bab + bb
        h = _lin_2d({"w": wc, "b": bc}, h)
        h = ops.prelu(h, params[f"prelu{i}"]["slope"], axis=1)
    x = _lin_2d(params["lin5"], h)
    return jax.nn.sigmoid(x)


def apply(params, state, featmap, label=None, *, cfg: RecNetConfig = RecNetConfig(),
          training: bool = False):
    """RecNet forward.

    featmap: (N, 7, 7, 512) NHWC frozen-encoder feature map.
    Returns:
      label is None  -> ((feat_new_v, feat_new), new_state)   [inference]
      label provided -> (RecNetTrainOut, new_state)           [training]
    """
    n, h, w, c = featmap.shape
    hw = h * w
    pos = featmap.reshape(n, hw, c)  # (N, 49, 512): rows = positions

    ss_space, ss_channel = self_similarity(featmap, impl=cfg.ss_impl)

    # --- spatial attention -------------------------------------------------
    # ss_space (N, p, q) -> NHWC (N, qh, qw, p): spatial = query position q,
    # channels = position p (torch views (N, HW, H, W), models/recnet.py:234).
    ss_space_map = ss_space.transpose(0, 2, 1).reshape(n, h, w, hw)
    space_cat = jnp.concatenate([featmap, ss_space_map], axis=-1)  # (N,7,7,561)
    m_space_map, space_state = _seq_conv_res(
        params["conv4space"], state["conv4space"], space_cat,
        ["c0", "r0", "c1", "r1", "c2", "r2"], cfg, training)
    m_space_map = jax.nn.sigmoid(m_space_map)  # (N, 7, 7, 49); channels = p
    # -> (N, p, q) matching torch M_space.view(N, HW, HW)
    m_space = m_space_map.reshape(n, hw, hw).transpose(0, 2, 1)

    # --- channel attention ---------------------------------------------------
    flat = pos.transpose(0, 2, 1)  # (N, 512, 49): rows = channels
    # 'factored' skips the Gram/concat entirely; when ss_impl='pallas' the
    # fused kernel already produced ss_channel, so consuming it is free
    factored = cfg.c4c_impl == "factored" and cfg.ss_impl != "pallas"
    if factored:
        first_arg = flat  # (the unused ss_channel einsum above is DCE'd)
    else:
        first_arg = jnp.concatenate([flat, ss_channel], axis=2)  # (N,512,561)

    def channel_branch(p_c4c, x_in, pos):
        if factored:
            m_channel = _conv4channel_factored(p_c4c, x_in)  # (N, 512, 512)
        else:
            m_channel = _conv4channel(p_c4c, x_in)
        # feat_channel[c, q] = sum_d M_channel[c, d] X[d, q]
        # (rectification matmul, models/recnet.py:409)
        fc_pos = jnp.einsum("nqd,ncd->nqc", pos, m_channel,
                            preferred_element_type=pos.dtype)
        return m_channel, fc_pos

    if cfg.remat_channel and training:
        channel_branch = jax.checkpoint(channel_branch)
    fused_channel = (cfg.channel_impl == "pallas_fused" and factored
                     and label is None and not training)
    if fused_channel:
        from ffrnet_tpu.ops.pallas.channel_branch import channel_branch_pallas

        # (N, HW, C) straight from the kernel; M_channel stays in VMEM
        # (inference never returns it — the train tuple does, so training
        # and label-bearing calls take the XLA branch above)
        m_channel = None
        feat_channel_pos = channel_branch_pallas(flat, params["conv4channel"])
    else:
        m_channel, feat_channel_pos = channel_branch(
            params["conv4channel"], first_arg, pos)

    # --- spatial rectification matmul (models/recnet.py:408) -----------------
    # feat_space[c, q'] = sum_q X[c, q] M_space[q, q']
    feat_space_pos = jnp.einsum(
        "nqp,nqc->npc", m_space, pos, preferred_element_type=pos.dtype)
    feat_space = feat_space_pos.reshape(n, h, w, c)
    feat_channel = feat_channel_pos.reshape(n, h, w, c)

    # --- flip + merge of the channel branch ----------------------------------
    fc_flip = jnp.flip(feat_channel, axis=2)  # width flip
    fc_cat = jnp.concatenate([fc_flip, feat_channel], axis=-1)  # (N,7,7,1024)
    feat_channel_m, fm_state = _seq_conv_res(
        params["flipmerge"], state["flipmerge"], fc_cat, ["c", "r"], cfg, training)

    # --- final merge ----------------------------------------------------------
    merged_in = jnp.concatenate([feat_space, feat_channel_m, featmap], axis=-1)
    feat_new, mg_state = _seq_conv_res(
        params["merge"], state["merge"], merged_in, ["c", "r"], cfg, training)

    feat_new_v = jnp.mean(feat_new, axis=(1, 2))  # AvgPool2d(7)

    new_state = {
        "conv4space": space_state,
        "flipmerge": fm_state,
        "merge": mg_state,
    }

    if label is None:
        return (feat_new_v, feat_new), new_state

    logits, cosine = add_margin_logits(
        params["classifier"]["w"], feat_new_v, label,
        s=cfg.s, m=cfg.m, num_classes=cfg.num_classes)
    out = RecNetTrainOut(
        feat_new_v=feat_new_v, logits=logits, cosine=cosine,
        m_space=m_space, m_channel=m_channel,
        feat_space=feat_space, feat_channel=feat_channel_m,
    )
    return out, new_state
