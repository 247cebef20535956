"""Self-similarity (Gram-matrix cosine attention) — the FFR-Net core primitive.

Reference behavior (models/recnet.py:220-236): for a feature map
x of shape (N, C, H, W) flattened to (N, C, HW),

  ss_space   = cos-sim between spatial positions -> (N, HW, HW)
               (rows L2-normalized over the C axis)
  ss_channel = cos-sim between channels          -> (N, C, C)
               (rows L2-normalized over the HW axis)

Both are batched Gram matrices of L2-normalized rows. On TPU these map
straight onto the MXU; the fused Pallas path (ops/pallas/self_similarity.py)
keeps the normalize + both Grams in one VMEM-resident kernel.

We take NHWC input natively (TPU layout) and return
(ss_space (N, HW, HW), ss_channel (N, C, C)); the caller reshapes ss_space
to (N, HW, H, W) when concatenating along channels.
"""

from __future__ import annotations

import jax.numpy as jnp

from ffrnet_tpu.ops.nn import l2_normalize

_EPS = 1e-12  # F.normalize default


def cosine_sim(x1, x2, *, eps: float = _EPS):
    """Batched cosine-similarity Gram: rows of x1 vs rows of x2.

    x1, x2: (N, R, D) -> (N, R, R). Mirrors reference cosine_sim
    (models/recnet.py:220-224) which normalizes over dim 2 then bmm.
    """
    x1 = l2_normalize(x1, axis=2, eps=eps)
    x2 = l2_normalize(x2, axis=2, eps=eps)
    return jnp.einsum("nrd,nsd->nrs", x1, x2, preferred_element_type=x1.dtype)


def self_similarity(x_nhwc, *, impl: str = "xla"):
    """Spatial + channel self-similarity of an NHWC feature map.

    Returns (ss_space (N, HW, HW), ss_channel (N, C, C)).
    """
    if impl == "pallas":
        from ffrnet_tpu.ops.pallas.self_similarity import self_similarity_pallas

        return self_similarity_pallas(x_nhwc)
    n, h, w, c = x_nhwc.shape
    pos = x_nhwc.reshape(n, h * w, c)  # rows = spatial positions
    chan = pos.transpose(0, 2, 1)  # rows = channels
    ss_space = cosine_sim(pos, pos)
    ss_channel = cosine_sim(chan, chan)
    return ss_space, ss_channel
