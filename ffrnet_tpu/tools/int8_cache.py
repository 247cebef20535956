"""In-repo cache for bench-config int8 static activation scales.

The eager calibration pass costs minutes on this image's 1-core host CPU,
and the scales are a pure function of (params seed, BN fold, dtype,
calibration data) — so bench.py and the duel tools cache them in
`.int8_scales.json` at the repo root, keyed BY LEAF PATH (the
'/'-joined trail from models.quantize.quantized_leaf_items, e.g.
"body/3/res/conv1/w"). Path keys make rehydration refactor-proof: a
reordered walk cannot mis-assign scales across sites, and a renamed /
added / removed site shows up as a path-set mismatch → the cache entry
is treated as stale and recalibrated, never silently shifted.

Legacy entries (plain lists, paired to sites by position in the
pre-round-4 walk order) are still readable: they're re-keyed by path on
load using the ordering they were saved under, then migrated to the
path-keyed format on the next save.

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
    """Cached scales for `key`, or None.

    Returns a {leaf_path: scale} dict for current-format entries, or a
    plain list for legacy positional entries (including the oldest
    single-entry payloads {"key": ..., "x_scales": [...]})."""
    if not os.path.exists(cache_file):
        return None
    with open(cache_file) as f:
        payload = json.load(f)
    if payload.get("key") == key:
        return payload.get("x_scales")
    return payload.get("entries", {}).get(key)


def save_scales(cache_file: str, key: str, scales_by_path) -> None:
    """Merge-save a {leaf_path: scale} dict under the multi-entry format,
    preserving other keys (including legacy single-entry payloads, folded
    into entries)."""
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
    entries[key] = {str(p): float(s) for p, s in scales_by_path.items()}
    with open(cache_file, "w") as f:
        json.dump({"entries": entries}, f)


def _legacy_irse_order_paths(tree):
    """Leaf paths in the pre-round-4 irse walk order (shortcut conv first
    within each body unit, then res conv1/conv2, then the output linear) —
    the order legacy list-format encoder cache entries were saved in."""
    from ffrnet_tpu.ops import quant

    paths = []
    for i, unit in enumerate(tree["body"]):
        if "shortcut" in unit and quant.is_quantized(unit["shortcut"]["conv"]["w"]):
            paths.append(f"body/{i}/shortcut/conv/w")
        for name in ("conv1", "conv2"):
            if quant.is_quantized(unit["res"][name]["w"]):
                paths.append(f"body/{i}/res/{name}/w")
    if quant.is_quantized(tree["output"]["linear"]["w"]):
        paths.append("output/linear/w")
    return paths


def _resolve_cached(cached, tree_items, legacy_paths):
    """Match a cache payload to the tree's quantized sites.

    cached: dict (path-keyed) or list (legacy positional) from load_scales.
    tree_items: quantized_leaf_items(tree) of the tree being rehydrated.
    legacy_paths: paths, in the order legacy lists were saved in.
    Returns {path: scale} covering exactly the tree's sites, or None if
    the entry is stale (site set / count changed since it was saved).
    """
    tree_paths = [p for p, _ in tree_items]
    if isinstance(cached, list):
        if len(cached) != len(legacy_paths) or set(legacy_paths) != set(tree_paths):
            return None
        return dict(zip(legacy_paths, cached))
    if set(cached) != set(tree_paths):
        return None
    return cached


def _rehydrate(qtree, by_path):
    """New host tree with x_scale baked into each quantized leaf by path."""
    import jax
    import jax.numpy as jnp

    from ffrnet_tpu.models.quantize import quantized_leaf_items

    sp = copy.deepcopy(jax.device_get(qtree))
    items = quantized_leaf_items(sp)
    assert len(items) == len(by_path), "scale cache/site count mismatch"
    for path, leaf in items:
        leaf["x_scale"] = jnp.float32(by_path[path])
    return sp


def static_encoder_tree(qparams, enc_state, dtype, *, cache_file: str,
                        cache_key: str, cal_batch: int = 8, seed: int = 2):
    """Device-put static-scale encoder tree, via the cache when possible.

    qparams: device int8-quantized encoder tree (no x_scale yet).
    Returns (sparams, cache_status). On a miss or a stale entry (site-set
    mismatch), runs the eager host-CPU calibration (minutes) and saves the
    path-keyed scales under `cache_key`.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ffrnet_tpu.models.quantize import (calibrate_activation_scales,
                                            quantized_leaf_items)

    tree_items = quantized_leaf_items(qparams)
    cached = load_scales(cache_file, cache_key)
    by_path = None if cached is None else _resolve_cached(
        cached, tree_items, _legacy_irse_order_paths(qparams))
    if by_path is not None:
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
        by_path = {p: float(l["x_scale"]) for p, l in quantized_leaf_items(cal)}
        save_scales(cache_file, cache_key, by_path)
        status = ("stale (recalibrated + saved)" if cached is not None
                  else "miss (calibrated + saved)")

    sp = _rehydrate(qparams, by_path)
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
    rehydrate by leaf path (legacy recnet lists were saved in the generic
    sorted walk order, which quantized_leaf_items still uses).
    Returns (srec, cache_status).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ffrnet_tpu.models.quantize import (
        calibrate_recnet_activation_scales, quantized_leaf_items)

    tree_items = quantized_leaf_items(qrec)
    cached = load_scales(cache_file, cache_key)
    by_path = None if cached is None else _resolve_cached(
        cached, tree_items, [p for p, _ in tree_items])
    if by_path is not None:
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
        by_path = {p: float(l["x_scale"]) for p, l in quantized_leaf_items(cal)}
        save_scales(cache_file, cache_key, by_path)
        status = ("stale (recalibrated + saved)" if cached is not None
                  else "miss (calibrated + saved)")

    sp = _rehydrate(qrec, by_path)
    return jax.device_put(jax.tree.map(jnp.asarray, sp)), status
