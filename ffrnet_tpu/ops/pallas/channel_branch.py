"""Fully-fused channel-attention branch as ONE Pallas kernel (SURVEY §7 8a).

The RecNet channel branch (reference models/recnet.py:372-386,406,409)
computes, per batch element, from the (C, HW) channel-major feature map X:

    ghat = L2-normalize rows of X                     (cosine prep)
    h    = X @ W1f^T + ghat @ (W1s @ ghat)^T + b1     (factored Gram-feed:
           ss_channel @ W1s^T == ghat (ghat^T W1s^T), the Gram never built)
    h    = prelu(h); h = h @ Wc1^T + bc1; prelu; h = h @ Wc2^T + bc2; prelu
           (the two collapsed inter-block (32,32) linears — see
           models/recnet._conv4channel_factored for the algebra)
    M    = sigmoid(h @ W5^T + b5)                     (C, C) channel attention
    out  = (M @ X)^T                                  (HW, C) rectified feats

The XLA factored path (models/recnet.py) is already exact and fast, but it
must materialize M — an (N, C, C) tensor, 512 KB/sample fp32 — to HBM
between the sigmoid producer and the rectification matmul. This kernel
keeps the entire branch VMEM-resident per batch element: M lives and dies
in VMEM, deleting both the HBM write and the read-back (the dominant
non-encoder HBM traffic in RecNet inference, BASELINE.md).

Numerics: everything accumulates in fp32 inside the kernel (the XLA bf16
path rounds each intermediate to bf16, so agreement there is bf16-bounded;
at fp32 the paths agree to reassociation, tested). eps matches
F.normalize (1e-12).

Training uses the XLA path (M_channel itself is a training output and the
backward wants XLA's fused tape); the kernel carries a custom VJP whose
backward differentiates the XLA reference path, so autodiff through an
inference-mode call still works.

Adopt-or-reject status and duel numbers: BASELINE.md "Fused channel-branch
kernel" (tools/bench_fused_channel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12


def _kernel(x_ref, w1f_ref, w1s_ref, b1_ref, s0_ref, wc1_ref, bc1_ref,
            s1_ref, wc2_ref, bc2_ref, s2_ref, w5_ref, b5_ref, out_ref):
    x = x_ref[0].astype(jnp.float32)  # (C, HW)
    inv_r = 1.0 / jnp.maximum(
        jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True)), _EPS)
    ghat = x * inv_r  # (C, HW)

    # factored Gram feed: X @ W1f^T + ghat @ (W1s ghat)^T
    h = jnp.dot(x, w1f_ref[...].T, preferred_element_type=jnp.float32)
    t = jnp.dot(w1s_ref[...], ghat, preferred_element_type=jnp.float32)
    h = h + jnp.dot(ghat, t.T, preferred_element_type=jnp.float32)
    h = h + b1_ref[...][None, :]
    h = jnp.where(h >= 0, h, s0_ref[...][:, None] * h)  # prelu over rows=C

    h = jnp.dot(h, wc1_ref[...].T, preferred_element_type=jnp.float32)
    h = h + bc1_ref[...][None, :]
    h = jnp.where(h >= 0, h, s1_ref[...][:, None] * h)

    h = jnp.dot(h, wc2_ref[...].T, preferred_element_type=jnp.float32)
    h = h + bc2_ref[...][None, :]
    h = jnp.where(h >= 0, h, s2_ref[...][:, None] * h)

    logits = jnp.dot(h, w5_ref[...].T, preferred_element_type=jnp.float32)
    logits = logits + b5_ref[...][None, :]
    m = jax.nn.sigmoid(logits)  # (C, C) — never leaves VMEM

    out = jnp.dot(m, x, preferred_element_type=jnp.float32)  # (C, HW)
    out_ref[0] = out.T.astype(out_ref.dtype)  # (HW, C)


def _collapse(params):
    """Host/XLA-side prep: split lin0 by input block and collapse the two
    inter-block Linear pairs to (32,32) affines (exact; fp32 products).

    Returns the 12 small weight operands the kernel consumes.
    """
    w1 = params["lin0"]["w"].astype(jnp.float32)  # (32, HW + C)
    b1 = params["lin0"].get("b")
    c = params["lin5"]["w"].shape[0]
    q = w1.shape[1] - c
    w1f, w1s = w1[:, :q], w1[:, q:]
    k = w1.shape[0]
    b1 = (jnp.zeros((k,), jnp.float32) if b1 is None
          else b1.astype(jnp.float32))

    def pair(i):
        pa, pb = params[f"lin{2 * i - 1}"], params[f"lin{2 * i}"]
        wc = jnp.matmul(pb["w"].astype(jnp.float32),
                        pa["w"].astype(jnp.float32))
        ba, bb = pa.get("b"), pb.get("b")
        bc = jnp.zeros((wc.shape[0],), jnp.float32)
        if ba is not None:
            bc = jnp.matmul(pb["w"].astype(jnp.float32),
                            ba.astype(jnp.float32))
        if bb is not None:
            bc = bc + bb.astype(jnp.float32)
        return wc, bc

    wc1, bc1 = pair(1)
    wc2, bc2 = pair(2)
    w5 = params["lin5"]["w"].astype(jnp.float32)
    b5 = params["lin5"].get("b")
    b5 = (jnp.zeros((c,), jnp.float32) if b5 is None
          else b5.astype(jnp.float32))
    slopes = [params[f"prelu{i}"]["slope"].astype(jnp.float32)
              for i in range(3)]
    return (w1f, w1s, b1, slopes[0], wc1, bc1, slopes[1], wc2, bc2,
            slopes[2], w5, b5)


def _reference(flat, params):
    """XLA factored path (models/recnet.py) — golden twin + VJP backward."""
    from ffrnet_tpu.models.recnet import _conv4channel_factored

    m = _conv4channel_factored(params, flat)
    # fc_pos[q, c] = sum_d M[c, d] X[d, q]  (models/recnet.py:409)
    return jnp.einsum("ndq,ncd->nqc", flat, m,
                      preferred_element_type=flat.dtype)


def _forward(flat, params):
    n, c, hw = flat.shape
    ops = _collapse(params)
    interpret = jax.devices()[0].platform != "tpu"

    def wspec(a):
        shape = a.shape
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, c, hw), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [wspec(a) for a in ops],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), flat.dtype),
        interpret=interpret,
    )(flat, *ops)
    return out


@jax.custom_vjp
def channel_branch_pallas(flat, params):
    """Fused channel branch: (N, C, HW) channel-major map + the
    recnet params['conv4channel'] subtree -> (N, HW, C) rectified features
    (the `fc_pos` of models/recnet.apply). M_channel never touches HBM."""
    return _forward(flat, params)


def _fwd(flat, params):
    return _forward(flat, params), (flat, params)


def _bwd(res, g):
    flat, params = res
    _, vjp = jax.vjp(_reference, flat, params)
    return vjp(g)


channel_branch_pallas.defvjp(_fwd, _bwd)
