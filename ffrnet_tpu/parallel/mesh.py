"""Device mesh construction and sharding rules.

The reference's only parallelism is single-host DataParallel over GPUs
(models/trainer.py:70-72). The TPU-native story is a 2-D
('data', 'model') `jax.sharding.Mesh`:

  * batches shard over 'data' (pure DP; gradient psum inserted by XLA)
  * the one genuinely large weight — the CosFace classifier
    (num_classes=10575 x 512, models/recnet.py:248) — shards its class axis
    over 'model' (tensor parallelism for the widest matmul + its logits);
    10575 is odd, so the class axis is zero-padded to the next multiple of
    the 'model' size at placement (trainer.pad_train_state_classes) and the
    padded columns are softmax-masked (models/recnet.py::add_margin_logits)
  * everything else (a few MB of conv weights on 7x7 maps) replicates.

With model=1 this degrades to plain DP; the same jitted step runs on any
mesh shape, collectives ride ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """('data', 'model') mesh over the given (default: all) devices.

    Fails fast with actionable messages (round-5 review): an oversized
    'model' axis used to produce a zero-size 'data' axis (surfacing later
    as ZeroDivisionError in batch validation) and an oversized explicit
    shape died in an opaque numpy reshape. Devices left over by a
    non-divisible count are dropped with a warning, never silently.
    """
    if devices is None:
        devices = jax.devices()
    if n_model < 1:
        raise ValueError(f"--mesh_model must be >= 1, got {n_model}")
    if n_model > len(devices):
        raise ValueError(
            f"--mesh_model {n_model} exceeds the {len(devices)} visible "
            "devices")
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data < 1 or n_data * n_model > len(devices):
        raise ValueError(
            f"mesh ({n_data} data x {n_model} model) needs "
            f"{max(n_data, 1) * n_model} devices but only {len(devices)} "
            "are visible — lower --mesh_data/--mesh_model")
    used = n_data * n_model
    if used < len(devices):
        import sys

        print(f"[warn] mesh ({n_data}x{n_model}) uses {used} of "
              f"{len(devices)} devices — {len(devices) - used} idle",
              file=sys.stderr)
    try:
        # topology-aware assignment: the flat jax.devices() order can put
        # a >1-wide 'model' axis across non-adjacent chips, sending the
        # classifier TP collectives over the wrong links (round-5 review)
        from jax.experimental import mesh_utils

        devs = mesh_utils.create_device_mesh((n_data, n_model),
                                             devices=devices[:used])
    except Exception:  # fallback: enumeration-order reshape
        devs = np.asarray(devices[:used]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def validate_batch_for_mesh(mesh: Mesh, batch_size: int,
                            flag: str = "--batch_size") -> None:
    """Fail fast with an actionable message instead of an XLA sharding
    traceback when the global batch does not divide the 'data' mesh axis."""
    n_data = mesh.shape["data"]
    if batch_size % n_data != 0:
        raise ValueError(
            f"{flag} {batch_size} is not divisible by the data-parallel mesh "
            f"size {n_data}; pick a multiple of {n_data} or change --mesh_data"
        )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def recnet_param_shardings(mesh: Mesh, params):
    """Sharding tree for RecNet params: classifier W (classes, 512) sharded
    over 'model' on the class axis; everything else replicated."""
    rep = replicated(mesh)
    shardings = jax.tree.map(lambda _: rep, params)
    if "classifier" in params:
        shardings["classifier"] = {"w": NamedSharding(mesh, P("model", None))}
    return shardings
