"""Fused self-similarity Pallas kernel (normalize -> both Grams, one pass).

The reference computes the two cosine-similarity Gram matrices with four
separate normalize passes and two bmms (models/recnet.py:220-236). On TPU
the whole thing is one VMEM-resident kernel per batch element:

    X   : (HW, C) feature map (positions x channels), ~100 KB at 49x512
    Gp  = X  X^T  (HW, HW)   - MXU
    Gc  = X^T X   (C, C)     - MXU
    ss_space[i,j]   = Gp[i,j] / (max(r_i, eps) max(r_j, eps)),
                      r_i = ||X[i,:]||   (row norms come free from X*X sums)
    ss_channel[c,d] = Gc[c,d] / (max(s_c, eps) max(s_d, eps)),
                      s_c = ||X[:,c]||

This reformulation (normalize AFTER the Gram via outer inverse-norm
scaling) is algebraically identical to normalizing rows first and avoids
materializing normalized copies. eps matches F.normalize (1e-12).

The op is wrapped in a custom VJP whose backward runs the (cheap, fusable)
XLA reference path, so the kernel is usable inside the training objective.
Off-TPU the kernel runs in interpreter mode (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12


def _kernel(x_ref, ss_space_ref, ss_channel_ref):
    x = x_ref[0]  # (HW, C) fp32
    gp = jnp.dot(x, x.T, preferred_element_type=jnp.float32)
    gc = jnp.dot(x.T, x, preferred_element_type=jnp.float32)
    inv_r = 1.0 / jnp.maximum(jnp.sqrt(jnp.sum(x * x, axis=1)), _EPS)  # (HW,)
    inv_s = 1.0 / jnp.maximum(jnp.sqrt(jnp.sum(x * x, axis=0)), _EPS)  # (C,)
    ss_space_ref[0] = gp * inv_r[:, None] * inv_r[None, :]
    ss_channel_ref[0] = gc * inv_s[:, None] * inv_s[None, :]


def _reference(x_nhwc):
    from ffrnet_tpu.ops.similarity import cosine_sim

    n, h, w, c = x_nhwc.shape
    pos = x_nhwc.reshape(n, h * w, c)
    return cosine_sim(pos, pos), cosine_sim(pos.transpose(0, 2, 1),
                                            pos.transpose(0, 2, 1))


def _forward(x_nhwc):
    n, h, w, c = x_nhwc.shape
    hw = h * w
    pos = x_nhwc.reshape(n, hw, c).astype(jnp.float32)
    interpret = jax.devices()[0].platform != "tpu"
    out = _call(pos, n=n, hw=hw, c=c, interpret=interpret)
    # match the XLA path's dtype contract (outputs in input dtype) so
    # downstream concat-with-featmap keeps the compute dtype (bf16 runs)
    return tuple(o.astype(x_nhwc.dtype) for o in out)


def _call(pos, *, n, hw, c, interpret):
    return pl.pallas_call(
        _kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, hw, hw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, hw, hw), jnp.float32),
            jax.ShapeDtypeStruct((n, c, c), jnp.float32),
        ),
        interpret=interpret,
    )(pos)


@jax.custom_vjp
def self_similarity_pallas(x_nhwc):
    """(ss_space (N,HW,HW), ss_channel (N,C,C)) of an NHWC feature map."""
    return _forward(x_nhwc)


def _fwd(x_nhwc):
    return _forward(x_nhwc), x_nhwc


def _bwd(x_nhwc, grads):
    # Backward via the XLA reference path (fully fusable, tiny shapes).
    _, vjp = jax.vjp(_reference, x_nhwc)
    (dx,) = vjp(grads)
    return (dx,)


self_similarity_pallas.defvjp(_fwd, _bwd)
