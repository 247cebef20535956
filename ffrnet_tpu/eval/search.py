"""1:N identification: cosine gallery search on device.

The reference only implements 1:1 verification (pair cosine + threshold,
lfw/lfw_eval.py:226-259); identification against an enrolled gallery is the
other half of a production face-recognition deployment. On TPU it is one
(P, 512) @ (512, G) matmul + `lax.top_k` — MXU-shaped at any gallery size
that fits HBM (a 1M-identity gallery in bf16 is ~1 GB).

    gal = Gallery.build(model, enroll_images, labels)
    scores, labels = gal.search(model, probe_images, k=5)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ffrnet_tpu.ops import nn as ops


@partial(jax.jit, static_argnames=("k",))
def top_k_identify(probe_emb, gallery_emb, *, k: int = 1,
                   valid: Optional[Any] = None):
    """Cosine top-k search. probe_emb (P, D), gallery_emb (G, D) ->
    (scores (P, k) desc, indices (P, k) into the gallery).

    Embeddings are L2-normalized here, so raw (already-normalized) encoder
    embeddings and unnormalized rectified embeddings both work.

    valid: optional traced scalar — rows >= valid are capacity padding and
    score -2 (below any cosine). Serving keeps the gallery at power-of-two
    capacity so enrolls don't recompile this program; only capacity
    doublings and new (P, k) shapes compile.
    """
    p = ops.l2_normalize(probe_emb.astype(jnp.float32), axis=1)
    g = ops.l2_normalize(gallery_emb.astype(jnp.float32), axis=1)
    sims = jnp.matmul(p, g.T, preferred_element_type=jnp.float32)  # (P, G)
    if valid is not None:
        sims = jnp.where(jnp.arange(g.shape[0])[None] < valid, sims, -2.0)
    return jax.lax.top_k(sims, k)


@partial(jax.jit, static_argnames=("max_rank",))
def cmc_from_embeddings(probe_emb, probe_ids, gallery_emb, gallery_ids, *,
                        max_rank: int = 10):
    """Cumulative match characteristic over integer identity ids.

    -> (max_rank,) float32: CMC[r] = fraction of probes whose true identity
    appears among the top r+1 cosine matches. The standard 1:N closed-set
    identification metric — a framework extra (the reference has no
    identification eval at all; 1:1 verification only,
    lfw/lfw_eval.py:226-259). One (P, G) matmul + top_k, same MXU shape as
    top_k_identify.
    """
    p = ops.l2_normalize(probe_emb.astype(jnp.float32), axis=1)
    g = ops.l2_normalize(gallery_emb.astype(jnp.float32), axis=1)
    sims = jnp.matmul(p, g.T, preferred_element_type=jnp.float32)
    _, idx = jax.lax.top_k(sims, max_rank)            # (P, R)
    match = gallery_ids[idx] == probe_ids[:, None]    # (P, R) bool
    hit = jnp.cumsum(match.astype(jnp.int32), axis=1) > 0
    return hit.astype(jnp.float32).mean(axis=0)


@dataclass
class Gallery:
    """Enrolled identities: embeddings (G, D) on device + parallel labels."""

    embeddings: Any               # (G, D) jnp array
    labels: Sequence              # length G (ints or strings)

    @classmethod
    def build(cls, model, images, labels, *, rectified: bool = True,
              batch_size: int = 256) -> "Gallery":
        """Enroll aligned faces through `model` (an api.FFRNet)."""
        if len(images) != len(labels):
            raise ValueError("images and labels must be parallel")
        chunks = []
        for i in range(0, len(images), batch_size):
            raw, rect = model.embed(images[i:i + batch_size])
            chunks.append(rect if rectified else raw)
        return cls(jnp.concatenate(chunks, axis=0), list(labels))

    def add(self, model, images, labels, *, rectified: bool = True) -> "Gallery":
        other = Gallery.build(model, images, labels, rectified=rectified)
        return Gallery(jnp.concatenate([self.embeddings, other.embeddings]),
                       list(self.labels) + list(other.labels))

    def save(self, path: str) -> None:
        """Persist embeddings + labels (npz) — serving restarts re-enroll
        from this instead of re-embedding the enrollment set."""
        import numpy as np

        np.savez_compressed(path,
                            embeddings=np.asarray(self.embeddings,
                                                  np.float32),
                            labels=np.asarray(self.labels, dtype=object))

    @classmethod
    def load(cls, path: str) -> "Gallery":
        import numpy as np

        with np.load(path, allow_pickle=True) as z:
            return cls(jnp.asarray(z["embeddings"]),
                       [x.item() if hasattr(x, "item") else x
                        for x in z["labels"]])

    def cmc(self, model, probe_images, probe_labels, *, max_rank: int = 10,
            rectified: bool = True):
        """Closed-set identification CMC of `probe_images` (with true
        labels) against this gallery -> (max_rank,) numpy array.
        Labels may be any hashables; they are interned to ids against the
        gallery's label set (probes whose identity is not enrolled can
        never match — standard closed-set protocol assumes they are)."""
        import numpy as np

        max_rank = min(max_rank, len(self.labels))
        intern = {lab: i for i, lab in enumerate(dict.fromkeys(self.labels))}
        gal_ids = jnp.asarray([intern[lab] for lab in self.labels],
                              jnp.int32)
        probe_ids = jnp.asarray([intern.get(lab, -1) for lab in probe_labels],
                                jnp.int32)
        raw, rect = model.embed(probe_images)
        return np.asarray(cmc_from_embeddings(
            rect if rectified else raw, probe_ids, self.embeddings, gal_ids,
            max_rank=max_rank))

    def search(self, model, probe_images, *, k: int = 1,
               rectified: bool = True) -> Tuple[Any, list]:
        """-> (scores (P, k), labels: P lists of k gallery labels)."""
        if k > len(self.labels):
            raise ValueError(f"k={k} exceeds gallery size {len(self.labels)}")
        raw, rect = model.embed(probe_images)
        scores, idx = top_k_identify(rect if rectified else raw,
                                     self.embeddings, k=k)
        import numpy as np

        idx = np.asarray(idx)
        return scores, [[self.labels[j] for j in row] for row in idx]
