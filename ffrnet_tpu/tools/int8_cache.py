"""In-repo cache for bench-config int8 static activation scales.

The eager calibration pass costs minutes on this image's 1-core host CPU,
and the scales are a pure function of (params seed, BN fold, dtype,
calibration data) — so bench.py and the duel tools cache them in
`.int8_scales.json` at the repo root and rehydrate by POSITION into
`models.quantize._quantized_leaves` order (that walk order is documented
as load-bearing there).

Not a user-facing mechanism: real deployments calibrate once at load time
via `FFRNet.calibrate_int8` and keep the model object.
"""

from __future__ import annotations

import copy
import json
import os


def default_cache_file() -> str:
    """Repo-root .int8_scales.json (two levels up from this module)."""
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".int8_scales.json")


def encoder_cache_key(*, fold_bn: str, dtype_name: str,
                      cal_batch: int = 8, seed: int = 2) -> str:
    return (f"prng0-fold{fold_bn}-{dtype_name}-cal{cal_batch}xseed{seed}"
            "-ql1-v1")


def recnet_cache_key(*, fold_bn: str, dtype_name: str,
                     cal_batch: int = 8, seed: int = 2) -> str:
    """Scales for the bench-config int8 RecNet. They depend on the
    ENCODER tree too (calibration featmaps come from its forward), so the
    encoder's fold/dtype config is part of the key."""
    return (f"recnet-prng1-encprng0-fold{fold_bn}-{dtype_name}"
            f"-cal{cal_batch}xseed{seed}-v1")


def load_scales(cache_file: str, key: str):
    """Cached x_scale list for `key`, or None. Tolerates older single-entry
    payloads ({"key": ..., "x_scales": [...]}) and the multi-entry format
    ({"entries": {key: [...]}})."""
    if not os.path.exists(cache_file):
        return None
    with open(cache_file) as f:
        payload = json.load(f)
    if payload.get("key") == key:
        return payload.get("x_scales")
    return payload.get("entries", {}).get(key)


def save_scales(cache_file: str, key: str, scales) -> None:
    """Merge-save under the multi-entry format, preserving other keys
    (including a legacy single-entry payload, folded into entries)."""
    entries = {}
    if os.path.exists(cache_file):
        try:
            with open(cache_file) as f:
                payload = json.load(f)
            entries = dict(payload.get("entries", {}))
            if payload.get("key") and payload.get("x_scales") is not None:
                entries.setdefault(payload["key"], payload["x_scales"])
        except (json.JSONDecodeError, OSError):
            entries = {}
    entries[key] = [float(s) for s in scales]
    with open(cache_file, "w") as f:
        json.dump({"entries": entries}, f)


def static_encoder_tree(qparams, enc_state, dtype, *, cache_file: str,
                        cache_key: str, cal_batch: int = 8, seed: int = 2):
    """Device-put static-scale encoder tree, via the cache when possible.

    qparams: device int8-quantized encoder tree (no x_scale yet).
    Returns (sparams, cache_status). On a miss, runs the eager host-CPU
    calibration (minutes) and saves the scales under `cache_key`.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ffrnet_tpu.models.quantize import (_quantized_leaves,
                                            calibrate_activation_scales)

    scales = load_scales(cache_file, cache_key)
    if scales is not None:
        status = "hit"
    else:
        cpu = jax.devices("cpu")[0]
        host_q, host_s = jax.device_get((qparams, enc_state))
        xcal = np.random.default_rng(seed).uniform(
            -1.0, 1.0, (cal_batch, 112, 112, 3)).astype(np.float32)
        with jax.default_device(cpu):
            cal = calibrate_activation_scales(
                jax.tree.map(jnp.asarray, host_q),
                jax.tree.map(jnp.asarray, host_s),
                [jnp.asarray(xcal, dtype)])  # serve-dtype batch: the eager
            # stem conv needs input dtype == weight dtype, and calibrating
            # at the serving dtype matches what inference will see
        scales = [float(l["x_scale"]) for l in _quantized_leaves(cal)]
        save_scales(cache_file, cache_key, scales)
        status = "miss (calibrated + saved)"

    sp = copy.deepcopy(jax.device_get(qparams))
    leaves = _quantized_leaves(sp)
    assert len(leaves) == len(scales), "scale cache/site count mismatch"
    for leaf, s in zip(leaves, scales):
        leaf["x_scale"] = jnp.float32(s)
    return jax.device_put(jax.tree.map(jnp.asarray, sp)), status


def static_recnet_tree(qrec, rec_state, enc_fwd, dtype, *, cache_file: str,
                       cache_key: str, cfg=None, cal_batch: int = 8,
                       seed: int = 2):
    """Device-put static-scale RecNet tree, via the cache when possible.

    qrec: device int8-quantized recnet tree (models.quantize.
    quantize_recnet_params output, no x_scale yet). `enc_fwd(x)` must be
    the JITTED float/int8 encoder forward returning the (N,7,7,512)
    featmap — calibration feature maps come from it ON DEVICE (cheap);
    only the tiny recnet-tree eager pass runs on the host CPU. Scales
    rehydrate by POSITION into `tree_quantized_leaves` order (a
    deterministic sorted-key walk, models/quantize.py:96-114).
    Returns (srec, cache_status).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ffrnet_tpu.models.quantize import (
        calibrate_recnet_activation_scales, tree_quantized_leaves)

    scales = load_scales(cache_file, cache_key)
    if scales is not None:
        status = "hit"
    else:
        xcal = jnp.asarray(np.random.default_rng(seed).uniform(
            -1.0, 1.0, (cal_batch, 112, 112, 3)), dtype)
        fm_cal = jax.device_get(enc_fwd(xcal))
        cpu = jax.devices("cpu")[0]
        host_q, host_s = jax.device_get((qrec, rec_state))
        with jax.default_device(cpu):
            cal = calibrate_recnet_activation_scales(
                jax.tree.map(jnp.asarray, host_q),
                jax.tree.map(jnp.asarray, host_s),
                [jnp.asarray(fm_cal, dtype)], cfg=cfg)
        scales = [float(l["x_scale"]) for l in tree_quantized_leaves(cal)]
        save_scales(cache_file, cache_key, scales)
        status = "miss (calibrated + saved)"

    sp = copy.deepcopy(jax.device_get(qrec))
    leaves = tree_quantized_leaves(sp)
    assert len(leaves) == len(scales), "scale cache/site count mismatch"
    for leaf, s in zip(leaves, scales):
        leaf["x_scale"] = jnp.float32(s)
    return jax.device_put(jax.tree.map(jnp.asarray, sp)), status
