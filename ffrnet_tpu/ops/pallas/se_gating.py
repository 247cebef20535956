"""Fused squeeze-excitation gating kernel (BASELINE.json north-star (b)).

The SE block (pretrain/model_ir_se50.py:18-36) is GAP -> 1x1 conv down ->
ReLU -> 1x1 conv up -> sigmoid -> scale, executed 24 times per encoder
forward. Unfused, the gate chain round-trips the (N, 7, 7, C) map through
HBM twice; this kernel keeps pool + both tiny matmuls + sigmoid + rescale
in one VMEM-resident pass per batch element:

    pooled = mean_{hw}(x)            (1, C)
    g      = sigmoid(relu(pooled W1^T) W2^T)
    out    = x * g

Grid (N,); the whole 7x7xC tile (~100 KB fp32 at C=512) plus both weight
matrices fit VMEM trivially. Off-TPU runs in interpreter mode (tests);
wrapped in a custom VJP whose backward uses the XLA reference path so the
kernel is usable in (hypothetical) encoder fine-tuning too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w1_ref, w2_ref, out_ref):
    n, h, w, c = x_ref.shape  # block: (1, H, W, C)
    x = x_ref[0].reshape(h * w, c)
    pooled = jnp.mean(x.astype(jnp.float32), axis=0, keepdims=True)  # (1, C)
    hdn = jax.nn.relu(
        jnp.dot(pooled, w1_ref[:].T.astype(jnp.float32),
                preferred_element_type=jnp.float32))  # (1, r)
    gate = jax.nn.sigmoid(
        jnp.dot(hdn, w2_ref[:].T.astype(jnp.float32),
                preferred_element_type=jnp.float32))  # (1, C)
    out_ref[0] = (x * gate.astype(x.dtype)).reshape(h, w, c)


def _reference(x, w1, w2):
    from ffrnet_tpu.ops import nn as ops

    pooled = ops.global_avg_pool(x)
    g = ops.relu(ops.linear(pooled, w1))
    g = jax.nn.sigmoid(ops.linear(g, w2))
    return x * g[:, None, None, :]


def _forward(x, w1, w2):
    n, h, w, c = x.shape
    r = w1.shape[0]
    interpret = jax.devices()[0].platform != "tpu"
    return pl.pallas_call(
        _kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, r), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, w1, w2)


@jax.custom_vjp
def se_gating_pallas(x, w1, w2):
    """x (N, H, W, C); w1 (C/r, C); w2 (C, C/r) -> gated x (SEModule)."""
    return _forward(x, w1, w2)


def _fwd(x, w1, w2):
    return _forward(x, w1, w2), (x, w1, w2)


def _bwd(res, g):
    _, vjp = jax.vjp(_reference, *res)
    return vjp(g)


se_gating_pallas.defvjp(_fwd, _bwd)
