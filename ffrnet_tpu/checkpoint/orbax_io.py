"""Orbax-backed checkpointing (optional, for large-scale/sharded training).

The default store (checkpoint/store.py) writes torch-compatible .pth.gzip
files — right for interop and single-host runs. For production multi-host
training, Orbax adds async, atomic, per-shard checkpointing of the full
TrainState without gathering to host. Same `latest` cadence semantics.

Optional dependency: falls back with a clear error when orbax is absent.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def _ocp():
    try:
        import orbax.checkpoint as ocp
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("orbax-checkpoint is not installed") from e
    return ocp


def save_orbax(ckpt_dir: str, step: int, state: Any) -> str:
    """Save a TrainState pytree at `step` (async-capable, atomic)."""
    ocp = _ocp()
    path = os.path.abspath(os.path.join(ckpt_dir, f"orbax_{step:09d}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def latest_orbax_step(ckpt_dir: str) -> Optional[int]:
    """Newest completed orbax step in ckpt_dir, or None."""
    import re

    cands = sorted(d for d in os.listdir(ckpt_dir)
                   if re.fullmatch(r"orbax_\d{9}", d))
    return int(cands[-1].split("_")[1]) if cands else None


def prune_orbax(ckpt_dir: str, *, keep_every: int, keep_last: int = 2) -> int:
    """Remove orbax step dirs that are neither multiples of `keep_every`
    (the reference's numbered-checkpoint cadence) nor among the newest
    `keep_last` (the 'latest' role). Returns the number removed."""
    import re
    import shutil

    cands = sorted(d for d in os.listdir(ckpt_dir)
                   if re.fullmatch(r"orbax_\d{9}", d))
    removed = 0
    for d in cands[:-keep_last] if keep_last else cands:
        step = int(d.split("_")[1])
        if keep_every and step % keep_every == 0:
            continue
        shutil.rmtree(os.path.join(ckpt_dir, d), ignore_errors=True)
        removed += 1
    return removed


def load_orbax(ckpt_dir: str, step: Optional[int] = None) -> Any:
    """Restore a TrainState pytree; step=None -> latest orbax_* dir."""
    ocp = _ocp()
    if step is None:
        import re

        # exact-name filter: Orbax writes atomic saves to sibling temp dirs
        # ('..orbax-checkpoint-tmp-<ts>' suffixes) that would sort AFTER
        # the finished name — a crashed save must not shadow the last good
        # checkpoint
        cands = sorted(d for d in os.listdir(ckpt_dir)
                       if re.fullmatch(r"orbax_\d{9}", d))
        if not cands:
            raise FileNotFoundError(f"no orbax checkpoints in {ckpt_dir}")
        path = os.path.join(ckpt_dir, cands[-1])
    else:
        path = os.path.join(ckpt_dir, f"orbax_{step:09d}")
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))
