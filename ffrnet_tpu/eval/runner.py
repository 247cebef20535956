"""Evaluation runner: batched pair embedding + on-device verification.

The reference loops pair batches with per-batch H2D/D2H round-trips and
fans fold scoring over a process pool (lfw/lfw_eval.py:226-287). Here one
jitted function embeds a pair batch (both images through the frozen encoder
and RecNet in inference mode) and returns the raw + rectified cosine scores;
the 10-fold sweep then runs as a single device reduction
(ffrnet_tpu/eval/lfw.py).
"""

from __future__ import annotations

from functools import partial
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ffrnet_tpu.eval.lfw import FoldResult, kfold_verification, pair_cosine
from ffrnet_tpu.models import irse, recnet
from ffrnet_tpu.models.recnet import RecNetConfig


def make_pair_score_fn(cfg: RecNetConfig, *, num_layers: int = 50,
                       mode: str = "ir_se", donate: bool = False):
    """Jitted (params..., img1, img2) -> (scores_raw, scores_new) per pair."""

    @partial(jax.jit, static_argnames=())
    def score(enc_params, enc_state, rec_params, rec_state, img1, img2):
        # single 2N pass through encoder+recnet (both in inference mode —
        # identical numerics, half the dispatches). uint8 batches
        # (host_normalize=0 loaders) normalize on device.
        from ffrnet_tpu.ops.nn import images_to_unit_range

        img1 = images_to_unit_range(img1)
        img2 = images_to_unit_range(img2)
        n = img1.shape[0]
        both = jnp.concatenate([img1, img2], axis=0)
        fm, f, _ = irse.apply(enc_params, enc_state, both,
                              num_layers=num_layers, mode=mode, training=False)
        (f_new, _), _ = recnet.apply(rec_params, rec_state, fm, cfg=cfg,
                                     training=False)
        return (pair_cosine(f[:n], f[n:]),
                pair_cosine(f_new[:n], f_new[n:]))

    @partial(jax.jit, static_argnames=())
    def score_packed(enc_params, enc_state, rec_params, rec_state, imgs):
        # packed pair batches: ONE (N, 2, H, W, C) buffer (half the
        # per-buffer upload cost through remote-attached devices);
        # unpacked inside the program
        return score(enc_params, enc_state, rec_params, rec_state,
                     imgs[:, 0], imgs[:, 1])

    score.packed = score_packed
    return score


_SCORE_FN_CACHE: dict = {}


def _cached_score_fn(cfg: RecNetConfig):
    """Default score fn, cached by config: a fresh closure per call would
    miss jax's jit cache (keyed on function identity) and repay the full
    encoder+RecNet compile — 30-90s on the TPU — on EVERY evaluate call
    (round-5 review). Callers with custom num_layers/mode pass score_fn."""
    import dataclasses

    key = (type(cfg).__name__,) + dataclasses.astuple(cfg)
    fn = _SCORE_FN_CACHE.get(key)
    if fn is None:
        fn = _SCORE_FN_CACHE[key] = make_pair_score_fn(cfg)
    return fn


def _concat_labels(chunks):
    """One device array from per-batch labels. Host chunks concatenate on
    the host first (ONE upload, not one tiny device_put per batch — fixed
    per-buffer relay costs dwarf the bytes); device-resident chunks (loaders
    that device_put in their producer thread) concatenate on device so the
    loop never pays a per-batch host round-trip."""
    if all(isinstance(c, np.ndarray) for c in chunks):
        return jnp.asarray(np.concatenate(chunks))
    return jnp.concatenate([jnp.asarray(c) for c in chunks])


def _score_batch(score, enc_params, enc_state, rec_params, rec_state, batch):
    """Dispatch one pair batch through `score`, handling both the packed
    ('imgs') and two-buffer ('img1'/'img2') layouts; custom score_fns
    without a .packed variant get host-side unpacking."""
    if "imgs" in batch:
        packed = getattr(score, "packed", None)
        if packed is not None:
            return packed(enc_params, enc_state, rec_params, rec_state,
                          batch["imgs"])
        return score(enc_params, enc_state, rec_params, rec_state,
                     batch["imgs"][:, 0], batch["imgs"][:, 1])
    return score(enc_params, enc_state, rec_params, rec_state,
                 batch["img1"], batch["img2"])


def evaluate_pairs(enc_params, enc_state, rec_params, rec_state,
                   batches: Iterable, cfg: RecNetConfig = RecNetConfig(),
                   score_fn=None, return_scores: bool = False):
    """Run the full verification protocol over an iterable of pair batches
    ({'img1','img2','label'} NHWC float32). Returns (result_new, result_raw)
    — rectified first, mirroring get_avg_accuracy (lfw/lfw_eval.py:285-287).
    With return_scores=True also returns (scores_new, scores_raw, labels)
    as host arrays (feeds misclassified-pair dumps).

    Per-batch scores STAY ON DEVICE through the loop — batch dispatches run
    ahead asynchronously and the fold sweep consumes the concatenated
    device arrays, so the whole eval pays exactly ONE host synchronization
    at the end (through a relayed TPU each sync costs an RTT; the reference
    round-trips every batch, lfw/lfw_eval.py:226-252).
    """
    score = score_fn or _cached_score_fn(cfg)
    raw_chunks, new_chunks, labels = [], [], []
    for batch in batches:
        s_raw, s_new = _score_batch(score, enc_params, enc_state,
                                    rec_params, rec_state, batch)
        raw_chunks.append(s_raw)
        new_chunks.append(s_new)
        # do NOT np.asarray here: a device-resident label (loaders that
        # device_put in their producer thread) would pay a host round-trip
        # per batch — labels join the single device_get below instead
        labels.append(batch["label"])
    if not raw_chunks:
        raise ValueError("evaluate_pairs got no batches — empty pair list "
                         "or exhausted iterator?")
    scores_raw_d = jnp.concatenate(raw_chunks)
    scores_new_d = jnp.concatenate(new_chunks)
    lab_d = _concat_labels(labels)
    res_new, res_raw, scores_new, scores_raw, lab = jax.device_get((
        kfold_verification(scores_new_d, lab_d),
        kfold_verification(scores_raw_d, lab_d),
        scores_new_d, scores_raw_d, lab_d))  # <- the single host sync
    results = (res_new, res_raw)
    if return_scores:
        return results + (scores_new, scores_raw, lab)
    return results


def process_pair_slice(n_pairs: int, process_index=None, process_count=None):
    """Contiguous block of the pair list owned by this process.

    CONTIGUOUS (not strided like the training loader): the verification
    folds are contiguous index ranges (lfw/lfw_eval.py:110-118), so a
    process-ordered all-gather of contiguous blocks reconstructs the
    protocol's exact pair order. Remainder pairs go one-each to the lowest
    process ids — nothing is dropped.
    """
    if process_index is None:
        process_index, process_count = jax.process_index(), jax.process_count()
    base, rem = divmod(n_pairs, process_count)
    start = process_index * base + min(process_index, rem)
    return slice(start, start + base + (1 if process_index < rem else 0))


def evaluate_pairs_multiprocess(enc_params, enc_state, rec_params, rec_state,
                                local_batches: Iterable, *, n_pairs: int,
                                cfg: RecNetConfig = RecNetConfig(),
                                score_fn=None, return_scores: bool = False,
                                process_index=None, process_count=None):
    """Multi-host verification: each process embeds its own
    process_pair_slice(n_pairs) batches, scores are all-gathered in process
    order, and the fold sweep runs identically on every host — all hosts
    return bit-identical FoldResults.

    Capability surpassed: the reference evaluates single-process with a
    fork pool over folds (lfw/lfw_eval.py:276-283); here the embedding
    FLOPs (the actual cost) shard across hosts/chips.
    """
    from jax.experimental import multihost_utils

    if process_index is None:
        process_index, process_count = jax.process_index(), jax.process_count()
    score = score_fn or _cached_score_fn(cfg)
    raw_chunks, new_chunks, lab_chunks = [], [], []
    for batch in local_batches:
        s_raw, s_new = _score_batch(score, enc_params, enc_state,
                                    rec_params, rec_state, batch)
        # keep everything on device through the loop (dispatches run ahead
        # asynchronously); ONE fetch below feeds the host all-gather
        raw_chunks.append(s_raw)
        new_chunks.append(s_new)
        lab_chunks.append(batch["label"])
    # a process can legitimately own ZERO pairs (n_pairs < process_count):
    # it must still reach the collective below or every other host hangs
    if raw_chunks:
        raw_h, new_h, lab_h = jax.device_get((
            jnp.concatenate(raw_chunks), jnp.concatenate(new_chunks),
            _concat_labels(lab_chunks)))
    local = {
        "raw": (np.asarray(raw_h, np.float32) if raw_chunks
                else np.zeros((0,), np.float32)),
        "new": (np.asarray(new_h, np.float32) if raw_chunks
                else np.zeros((0,), np.float32)),
        "label": (np.asarray(lab_h).astype(np.int32) if raw_chunks
                  else np.zeros((0,), np.int32)),
    }
    sizes = [process_pair_slice(n_pairs, p, process_count).stop
             - process_pair_slice(n_pairs, p, process_count).start
             for p in range(process_count)]
    cap = max(sizes)

    def fit(x):
        # truncate-then-pad so every process enters the collective with
        # the agreed (cap,) shape even when its batches were mis-sliced
        x = x[:cap]
        return np.pad(x, (0, cap - x.shape[0]))

    payload = {k: fit(v) for k, v in local.items()}
    # actual per-process counts ride along so the mismatch check can run
    # AFTER the collective on every host: raising before it would leave
    # the other processes hanging forever in process_allgather with no
    # diagnostic (round-5 review)
    payload["count"] = np.asarray([local["raw"].shape[0]], np.int64)
    gathered = multihost_utils.process_allgather(payload)  # (P, cap)/leaf
    counts = np.asarray(gathered["count"]).reshape(process_count)
    if not np.array_equal(counts, np.asarray(sizes)):
        raise ValueError(
            f"per-process pair counts {counts.tolist()} do not match the "
            f"owned process_pair_slice sizes {sizes} of {n_pairs} (feed "
            "batches over process_pair_slice)")  # symmetric: every host

    def unpad(leaf):
        return np.concatenate(
            [np.asarray(leaf)[p, : sizes[p]] for p in range(process_count)])

    scores_raw = unpad(gathered["raw"])
    scores_new = unpad(gathered["new"])
    lab = unpad(gathered["label"])
    lab_d = jnp.asarray(lab)
    res_new, res_raw = jax.device_get((
        kfold_verification(jnp.asarray(scores_new), lab_d),
        kfold_verification(jnp.asarray(scores_raw), lab_d)))
    results = (res_new, res_raw)
    if return_scores:
        return results + (scores_new, scores_raw, lab)
    return results


def save_wrong_images(dataset, wrong_idx, out_dir: str) -> int:
    """Dump misclassified verification pairs as PNG files.

    Rebuild of the reference's save_wrong_imgs (lfw/lfw_eval.py:120-135):
    re-load each wrong pair from its dataset (MaskVerificationPairs /
    LfwPairs — anything with .get(idx, rng) -> {'img1','img2'} in [-1, 1]
    BGR), denormalize, and write {idx:04d}_1.png / _2.png under out_dir.
    The raw-vs-rectified split the reference encodes in two hardcoded dirs
    ('./wrong_images' vs './wrong_images_new') is the caller's out_dir
    choice here. Pass a dataset with flip_prob=0 for reproducible dumps.
    Returns the number of files written.
    """
    import os

    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    written = 0
    for i in np.asarray(wrong_idx).ravel():
        sample = dataset.get(int(i), rng)
        for key, suffix in (("img1", "_1"), ("img2", "_2")):
            if sample[key].dtype == np.uint8:  # host_normalize=0 dataset
                rgb = sample[key][:, :, ::-1]
            else:
                bgr = np.clip(sample[key] * 0.5 + 0.5, 0.0, 1.0)
                rgb = (bgr[:, :, ::-1] * 255.0).round().astype(np.uint8)
            Image.fromarray(rgb).save(
                os.path.join(out_dir, f"{int(i):04d}{suffix}.png"))
            written += 1
    return written
