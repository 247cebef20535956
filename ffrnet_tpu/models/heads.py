"""Margin-head zoo (parity components).

The reference ships four margin heads; RecNet uses AddMarginProduct only
(models/recnet.py:396). For full API parity we provide all of them:

  * add_margin_logits / arc_margin_logits — in models/recnet.py (live path)
  * arcface_logits   — `Arcface` head, kernel (embed, classes) layout,
    cos(theta+m) with the [0, pi] guard (pretrain/model_ir_se50.py:256-293)
  * am_softmax_logits — `Am_softmax` head, cos(theta)-0.35 scaled by 30
    (pretrain/model_ir_se50.py:297-319)

Kernels here use the reference's column layout (embedding_size, classnum),
L2-normalized over the embedding axis.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ffrnet_tpu.ops.nn import l2_norm_div

from ffrnet_tpu.models.recnet import add_margin_logits, arc_margin_logits  # noqa: F401 (re-export)


def init_kernel(key, embedding_size: int = 512, classnum: int = 51332,
                dtype=jnp.float32):
    """uniform(-1, 1) renormalized to unit columns x 1e5... the reference's
    init (pretrain/model_ir_se50.py:263) renorms columns to norm 1e-5 then
    scales by 1e5 -> unit-norm columns."""
    k = jax.random.uniform(key, (embedding_size, classnum), dtype, -1.0, 1.0)
    norms = jnp.sqrt(jnp.sum(k * k, axis=0, keepdims=True))
    return k / jnp.maximum(norms, 1e-12)


def arcface_logits(kernel, embeddings, label, *, s: float = 64.0, m: float = 0.5):
    """`Arcface` head (pretrain/model_ir_se50.py:270-293)."""
    kn = l2_norm_div(kernel, axis=0)
    cos = jnp.clip(embeddings @ kn, -1.0, 1.0)
    sin = jnp.sqrt(1.0 - jnp.square(cos))
    cos_m, sin_m = math.cos(m), math.sin(m)
    cos_theta_m = cos * cos_m - sin * sin_m
    # theta + m outside [0, pi] -> cosface fallback (cos - sin(m)*m)
    keep = cos - (sin_m * m)
    cos_theta_m = jnp.where(cos - math.cos(math.pi - m) <= 0, keep, cos_theta_m)
    one_hot = jax.nn.one_hot(label, kernel.shape[1], dtype=cos.dtype)
    return s * jnp.where(one_hot > 0, cos_theta_m, cos)


def am_softmax_logits(kernel, embeddings, label, *, s: float = 30.0, m: float = 0.35):
    """`Am_softmax` head (pretrain/model_ir_se50.py:297-319)."""
    kn = l2_norm_div(kernel, axis=0)
    cos = jnp.clip(embeddings @ kn, -1.0, 1.0)
    one_hot = jax.nn.one_hot(label, kernel.shape[1], dtype=cos.dtype)
    return s * jnp.where(one_hot > 0, cos - m, cos)
