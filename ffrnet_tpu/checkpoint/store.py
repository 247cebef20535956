"""Checkpoint store with reference-compatible cadence and format.

Checkpoints are `.pth.gzip` files holding
  {'RecNet': <torch-layout state_dict>, 'optimizer_tpu': <optax pytree>,
   'epoch': int, 'iter': int}
— the 'RecNet' entry loads directly into the PyTorch reference
(models/trainer.py:212), and reference checkpoints (which store torch
optimizer state under 'optimizer') import here; like the reference, torch
optimizer state is not restored (models/trainer.py:213 is commented out,
so resume resets moments — we restore ours when present, theirs never).

Cadence (train.py:65-72): 'latest' every save_freq//10 iterations, a
numbered '{iter:07d}' file every save_freq. `latest` resolution = max of
*.pth.gzip names sorted lexicographically (models/trainer.py:202-204).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ffrnet_tpu.checkpoint.pth_io import load_pth, save_pth
from ffrnet_tpu.checkpoint.torch_convert import recnet_from_torch, recnet_to_torch


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(ckpt_dir: str, file_name: str, *, params, model_state,
                    opt_state=None, epoch: int = 0, iteration: int = 0,
                    extra: Optional[Dict[str, Any]] = None) -> str:
    payload: Dict[str, Any] = {
        "RecNet": recnet_to_torch(_to_numpy_tree(params), _to_numpy_tree(model_state)),
        "epoch": int(epoch),
        "iter": int(iteration),
    }
    if opt_state is not None:
        # Flat leaves: optax states are NamedTuple trees whose classes we
        # don't want baked into the pickle; the loader re-attaches them to a
        # freshly initialized opt_state's structure.
        payload["optimizer_tpu"] = [np.asarray(x)
                                    for x in jax.tree.leaves(opt_state)]
    if extra:
        payload.update(extra)
    path = os.path.join(ckpt_dir, file_name + ".pth.gzip")
    # atomic write; tmp keeps the .gzip suffix so save_pth compresses, and
    # carries the pid so concurrent writers (e.g. multiple hosts sharing a
    # checkpoint dir) never interleave bytes on one tmp inode or race the
    # os.replace (round-5 review) — the final replace is last-writer-wins
    # on identical content
    tmp = os.path.join(ckpt_dir, f".{file_name}.tmp.{os.getpid()}.pth.gzip")
    save_pth(payload, tmp)
    os.replace(tmp, path)
    return path


def resolve_latest(ckpt_dir: str, file_name: str = "latest") -> str:
    """'latest' -> lexicographic max *.pth.gzip (models/trainer.py:202-204);
    plain names get '.pth.gzip' appended; paths with '/' pass through."""
    if file_name == "latest":
        # skip dot-files: a crash between save_pth(tmp) and os.replace
        # leaves '.{name}.tmp.pth.gzip' behind, which must never resolve
        # as the latest checkpoint (it may be truncated)
        cands = sorted(x for x in os.listdir(ckpt_dir)
                       if x.endswith("pth.gzip") and not x.startswith("."))
        if not cands:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
        return os.path.join(ckpt_dir, cands[-1])
    if "/" in file_name:
        return file_name
    if file_name.endswith(".pth.gzip"):
        # user passed the on-disk filename (e.g. --which_file
        # 0005000.pth.gzip): don't double the suffix (round-5 review)
        return os.path.join(ckpt_dir, file_name)
    return os.path.join(ckpt_dir, file_name + ".pth.gzip")


def load_checkpoint(ckpt_dir: str, file_name: str = "latest"):
    """Returns (params, model_state, opt_leaves_or_None, {'epoch','iter'}).

    opt_leaves is the FLAT leaf list from the checkpoint — pass it through
    `restore_opt_state(tx.init(params), opt_leaves)` to rebuild a usable
    optimizer state; it is not an optax state itself."""
    path = resolve_latest(ckpt_dir, file_name)
    payload = load_pth(path)
    params, model_state = recnet_from_torch(payload["RecNet"])
    opt_leaves = payload.get("optimizer_tpu")
    meta = {"epoch": int(payload.get("epoch", 0)),
            "iter": int(payload.get("iter", 0))}
    return params, model_state, opt_leaves, meta


def restore_opt_state(template_opt_state, opt_leaves):
    """Re-attach flat checkpointed leaves to a freshly-initialized optimizer
    state's tree structure (dtypes follow the template)."""
    template_leaves, treedef = jax.tree.flatten(template_opt_state)
    if len(template_leaves) != len(opt_leaves):
        raise ValueError(
            f"optimizer state mismatch: {len(template_leaves)} leaves expected,"
            f" checkpoint has {len(opt_leaves)} (different optimizer?)")
    for i, (t, x) in enumerate(zip(template_leaves, opt_leaves)):
        ts = getattr(t, "shape", None)
        xs = np.shape(x)
        if ts is not None and tuple(ts) != tuple(xs):
            # same leaf COUNT does not mean same model config (e.g. a
            # changed num_classes keeps the structure but not the
            # classifier-moment shape); failing here names the leaf
            # instead of surfacing as an opaque XLA shape error deep in
            # the jitted step (round-5 review)
            raise ValueError(
                f"optimizer state mismatch at leaf {i}: checkpoint shape "
                f"{tuple(xs)} vs expected {tuple(ts)} (different model "
                "configuration?)")
    leaves = [np.asarray(x, dtype=getattr(t, "dtype", None))
              for t, x in zip(template_leaves, opt_leaves)]
    return jax.tree.unflatten(treedef, leaves)
