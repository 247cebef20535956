"""tools/int8_cache.py — the in-repo static-scale cache.

Pure-python plus tiny-tree tests: the path-keyed load/save round-trip,
legacy positional-list reads, stale-entry detection (site set changed
since the entry was saved → recalibrate, never mis-assign), and
path-keyed rehydration on a real quantized tree. Full-tree rehydration
is exercised on the bench config by every bench run.
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from ffrnet_tpu.models.quantize import quantized_leaf_items
from ffrnet_tpu.ops import quant
from ffrnet_tpu.tools.int8_cache import (_rehydrate, _resolve_cached,
                                         encoder_cache_key, load_scales,
                                         recnet_cache_key, save_scales)


def test_load_missing_file(tmp_path):
    assert load_scales(str(tmp_path / "nope.json"), "k") is None


def test_save_load_roundtrip(tmp_path):
    f = str(tmp_path / "c.json")
    save_scales(f, "k1", {"a/w": 1.5, "b/w": 2.5})
    save_scales(f, "k2", {"c/w": 3.0})
    assert load_scales(f, "k1") == {"a/w": 1.5, "b/w": 2.5}
    assert load_scales(f, "k2") == {"c/w": 3.0}
    assert load_scales(f, "k3") is None


def test_legacy_single_entry_read_and_migrate(tmp_path):
    f = str(tmp_path / "c.json")
    with open(f, "w") as fh:
        json.dump({"key": "old", "x_scales": [0.25]}, fh)
    # legacy positional payloads come back as plain lists
    assert load_scales(f, "old") == [0.25]
    # a save folds the legacy payload into the multi-entry format
    save_scales(f, "new", {"a/w": 0.5})
    assert load_scales(f, "old") == [0.25]
    assert load_scales(f, "new") == {"a/w": 0.5}
    with open(f) as fh:
        assert set(json.load(fh)["entries"]) == {"old", "new"}


def test_save_overwrites_same_key(tmp_path):
    f = str(tmp_path / "c.json")
    save_scales(f, "k", {"a/w": 1.0})
    save_scales(f, "k", {"a/w": 2.0})
    assert load_scales(f, "k") == {"a/w": 2.0}


def test_corrupt_file_tolerated_on_save(tmp_path):
    f = str(tmp_path / "c.json")
    with open(f, "w") as fh:
        fh.write("{not json")
    save_scales(f, "k", {"a/w": 1.0})
    assert load_scales(f, "k") == {"a/w": 1.0}


def test_keys_are_distinct_and_config_sensitive():
    e = encoder_cache_key(fold_bn="1", dtype_name="bf16")
    r = recnet_cache_key(fold_bn="1", dtype_name="bf16")
    assert e != r
    assert encoder_cache_key(fold_bn="0", dtype_name="bf16") != e
    assert recnet_cache_key(fold_bn="1", dtype_name="fp32") != r
    assert recnet_cache_key(fold_bn="1", dtype_name="bf16", cal_batch=16) != r


def _tiny_quantized_tree():
    """Two quantized conv sites + one float leaf, distinct weights."""
    rng = np.random.default_rng(0)
    return {
        "a": {"conv": {"w": quant.quantize_weight(
            jnp.asarray(rng.normal(size=(3, 3, 4, 4)), jnp.float32),
            channel_axis=-1)}},
        "b": {"conv": {"w": quant.quantize_weight(
            jnp.asarray(rng.normal(size=(1, 1, 4, 4)), jnp.float32),
            channel_axis=-1)}},
        "bn": {"scale": jnp.ones((4,))},
    }


def test_resolve_cached_path_keyed_exact_match():
    tree = _tiny_quantized_tree()
    items = quantized_leaf_items(tree)
    assert [p for p, _ in items] == ["a/conv/w", "b/conv/w"]
    cached = {"a/conv/w": 0.5, "b/conv/w": 0.25}
    assert _resolve_cached(cached, items, []) == cached


def test_resolve_cached_stale_on_site_set_change():
    """A cache entry saved against a different site set must be treated
    as stale (None → recalibrate), not silently partially applied."""
    tree = _tiny_quantized_tree()
    items = quantized_leaf_items(tree)
    # renamed site
    assert _resolve_cached({"a/conv/w": 0.5, "OLD/conv/w": 0.25},
                           items, []) is None
    # removed site
    assert _resolve_cached({"a/conv/w": 0.5}, items, []) is None
    # added site
    assert _resolve_cached(
        {"a/conv/w": 0.5, "b/conv/w": 0.25, "c/conv/w": 0.1},
        items, []) is None


def test_resolve_cached_legacy_list_uses_saved_order():
    """Legacy lists pair to sites by the ORDER THEY WERE SAVED IN, which
    may differ from today's sorted walk — the legacy_paths argument
    carries that original order."""
    tree = _tiny_quantized_tree()
    items = quantized_leaf_items(tree)
    # saved b-first (old hand-rolled walk), today's walk is a-first
    got = _resolve_cached([0.25, 0.5], items, ["b/conv/w", "a/conv/w"])
    assert got == {"b/conv/w": 0.25, "a/conv/w": 0.5}
    # legacy list against a changed site set → stale
    assert _resolve_cached([0.25, 0.5], items,
                           ["b/conv/w", "GONE/conv/w"]) is None
    assert _resolve_cached([0.25], items, ["b/conv/w"]) is None


def test_rehydrate_bakes_by_path_not_position():
    tree = _tiny_quantized_tree()
    by_path = {"a/conv/w": 0.5, "b/conv/w": 0.25}
    out = _rehydrate(tree, by_path)
    assert float(out["a"]["conv"]["w"]["x_scale"]) == 0.5
    assert float(out["b"]["conv"]["w"]["x_scale"]) == 0.25
    # source tree untouched
    assert "x_scale" not in tree["a"]["conv"]["w"]


def test_rehydrate_count_mismatch_asserts():
    tree = _tiny_quantized_tree()
    with pytest.raises(AssertionError):
        _rehydrate(tree, {"a/conv/w": 0.5})


def test_committed_cache_is_path_keyed_and_matches_bench_trees():
    """The repo's committed .int8_scales.json (the bench artifact's scale
    source) must be in the path-keyed format with the bench site counts."""
    from ffrnet_tpu.tools.int8_cache import default_cache_file
    with open(default_cache_file()) as f:
        entries = json.load(f)["entries"]
    for key, v in entries.items():
        assert isinstance(v, dict), f"legacy list entry survived: {key}"
        expected = 15 if key.startswith("recnet-") else 52
        assert len(v) == expected
        assert all("/" in p for p in v)
