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
