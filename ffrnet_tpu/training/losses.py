"""The four-part FFR-Net training objective (models/trainer.py:31-43,154-180).

  0. self-similarity: MSE between the frozen clean feature map's ss_space /
     ss_channel Grams and those of the rectified spatial / channel features
     from BOTH branches, averaged
  1. triplet (cosine, margin 0.1): anchor = rectified masked embedding,
     pos = frozen clean embedding, neg = frozen masked embedding
  2. identity: MSE of both rectified embeddings against the frozen clean
     embedding
  3. classifier: CE on CosFace logits for both branches; the clean-branch
     term is divided by (1e-8 + loss_weight[3]) so its weight cancels when
     the weighted sum multiplies by loss_weight[3] (a reference quirk,
     models/trainer.py:173-176 — replicated by default, fixable via
     `faithful_ce_weight=False`).

All reductions are means, matching nn.MSELoss / nn.CrossEntropyLoss
defaults.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ffrnet_tpu.ops.nn import l2_normalize
from ffrnet_tpu.ops.similarity import self_similarity


def mse(a, b):
    # loss terms always reduce in fp32 (mixed-precision forward safe)
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


def cross_entropy(logits, labels):
    """nn.CrossEntropyLoss: mean softmax CE over the batch (fp32)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - true_logit)


def gram_mse_factored(a, b, *, eps: float = 1e-12):
    """MSE between the cosine Grams of a and b WITHOUT materializing them.

    a, b: (N, R, D) row sets. With row-normalized A_hat, B_hat, trace
    cyclicity gives the exact identity

        ||A_hat A_hatT - B_hat B_hatT||^2_F
          = ||A_hatT A_hat||^2_F - 2 ||A_hatT B_hat||^2_F
            + ||B_hatT B_hat||^2_F

    i.e. three (D, D) inner products instead of (N, R, R) Grams. For the
    channel self-similarity loss (R=512 channels, D=49 positions,
    models/trainer.py:157-161) this is O(N*D^2*R) vs O(N*R^2*D) and — the
    real win — removes the (N, 512, 512) tensors from the autograd tape.
    Equal to mse(gram(a), gram(b)) up to float reassociation. Computed in
    fp32 (loss-reduction convention).
    """
    a = l2_normalize(a.astype(jnp.float32), axis=2, eps=eps)
    b = l2_normalize(b.astype(jnp.float32), axis=2, eps=eps)
    n, r, _ = a.shape
    aa = jnp.einsum("nrd,nre->nde", a, a)
    ab = jnp.einsum("nrd,nre->nde", a, b)
    bb = jnp.einsum("nrd,nre->nde", b, b)

    def sq(x):
        return jnp.sum(jnp.square(x))

    return (sq(aa) - 2.0 * sq(ab) + sq(bb)) / (n * r * r)


def triplet_cosine(anchor, pos, neg, *, margin: float = 0.1):
    """Reference TripletLoss (models/trainer.py:31-43).

    Returns (loss, pos_dist_mean, neg_dist_mean); distances are
    1 - cosine similarity of L2-normalized embeddings. Computed in fp32.
    """
    a = l2_normalize(anchor.astype(jnp.float32), axis=1)
    pos_cos = 1.0 - jnp.sum(a * l2_normalize(pos.astype(jnp.float32), axis=1),
                            axis=1)
    neg_cos = 1.0 - jnp.sum(a * l2_normalize(neg.astype(jnp.float32), axis=1),
                            axis=1)
    loss = jnp.mean(jax.nn.relu(pos_cos - neg_cos + margin))
    return loss, pos_cos.mean(), neg_cos.mean()


class LossBreakdown(NamedTuple):
    total: jnp.ndarray
    self_similarity: jnp.ndarray  # weighted items, as logged by the reference
    triplet: jnp.ndarray
    identity: jnp.ndarray
    classifier: jnp.ndarray
    pos_dist: jnp.ndarray
    neg_dist: jnp.ndarray
    accuracy: jnp.ndarray


def ffrnet_objective(
    *,
    featmap_non,       # (N, 7, 7, 512) frozen clean feature map
    embed_non,         # (N, 512) frozen clean embedding
    embed_ocl,         # (N, 512) frozen masked embedding
    out_non,           # RecNetTrainOut for the clean branch
    out_ocl,           # RecNetTrainOut for the masked branch
    labels,            # (N,) int ids
    loss_weight: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
    faithful_ce_weight: bool = True,
    ss_impl: str = "xla",
    ss_loss_impl: str = "factored",
) -> LossBreakdown:
    """Assemble the weighted objective from the two-branch forward outputs.

    ss_loss_impl: 'factored' computes the CHANNEL self-similarity MSEs via
    the Gram-free trace identity (gram_mse_factored) — exact up to float
    reassociation, and it deletes the three (N, 512, 512) Grams from the
    training tape (the dominant non-encoder activation memory,
    BASELINE.md). 'materialized' is the literal reference dataflow
    (models/trainer.py:157-161); it is also used when ss_impl='pallas'
    supplies fused Grams anyway. The spatial Grams are (N, 49, 49) — tiny —
    and stay materialized in both modes (the identity would cost (512,512)
    inner products there, a pessimization).
    """
    w = [jnp.asarray(x, jnp.float32) for x in loss_weight]

    # (0) self-similarity rectification loss
    factored = ss_loss_impl == "factored" and ss_impl != "pallas"
    ss_space, ss_channel = self_similarity(featmap_non, impl=ss_impl)
    ss_space_non, _ = self_similarity(out_non.feat_space, impl=ss_impl)
    ss_space_ocl, _ = self_similarity(out_ocl.feat_space, impl=ss_impl)
    ss_space_loss = (mse(ss_space, ss_space_non) + mse(ss_space, ss_space_ocl)) / 2
    if factored:
        # (the unused ss_channel Gram above is dead code XLA eliminates)
        def chan(x):  # NHWC -> (N, C, HW) channel rows
            n, hh, ww, c = x.shape
            return x.reshape(n, hh * ww, c).transpose(0, 2, 1)

        cf = chan(featmap_non)
        ss_channel_loss = (
            gram_mse_factored(cf, chan(out_non.feat_channel))
            + gram_mse_factored(cf, chan(out_ocl.feat_channel))) / 2
    else:
        _, ss_channel_non = self_similarity(out_non.feat_channel, impl=ss_impl)
        _, ss_channel_ocl = self_similarity(out_ocl.feat_channel, impl=ss_impl)
        ss_channel_loss = (mse(ss_channel, ss_channel_non)
                           + mse(ss_channel, ss_channel_ocl)) / 2
    item0 = (ss_space_loss + ss_channel_loss) / 2

    # (1) triplet
    item1, pos_d, neg_d = triplet_cosine(out_ocl.feat_new_v, embed_non, embed_ocl)

    # (2) identity
    item2 = (mse(out_non.feat_new_v, embed_non) + mse(out_ocl.feat_new_v, embed_non)) / 2

    # (3) classifier
    ce_non = cross_entropy(out_non.logits, labels)
    ce_ocl = cross_entropy(out_ocl.logits, labels)
    if faithful_ce_weight:
        item3 = ce_non / (1e-8 + w[3]) + ce_ocl
    else:
        item3 = ce_non + ce_ocl

    items = [item0 * w[0], item1 * w[1], item2 * w[2], item3 * w[3]]
    total = sum(items)

    # masked-branch train accuracy from raw cosines (models/trainer.py:147-151)
    pred = jnp.argmax(out_ocl.cosine, axis=1)
    accuracy = jnp.mean((pred == labels).astype(jnp.float32))

    return LossBreakdown(
        total=total,
        self_similarity=items[0], triplet=items[1],
        identity=items[2], classifier=items[3],
        pos_dist=pos_d, neg_dist=neg_d, accuracy=accuracy,
    )
