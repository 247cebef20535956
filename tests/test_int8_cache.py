"""tools/int8_cache.py — the in-repo static-scale cache's file format.

Pure-python (no device work): the load/save round-trip, legacy
single-entry migration, and corruption tolerance. The rehydration
semantics themselves (scales by position into the quantized-leaf walks)
are exercised on real trees in test_quant.py and by every bench run.
"""

import json

from ffrnet_tpu.tools.int8_cache import (encoder_cache_key, load_scales,
                                         recnet_cache_key, save_scales)


def test_load_missing_file(tmp_path):
    assert load_scales(str(tmp_path / "nope.json"), "k") is None


def test_save_load_roundtrip(tmp_path):
    f = str(tmp_path / "c.json")
    save_scales(f, "k1", [1.5, 2.5])
    save_scales(f, "k2", [3.0])
    assert load_scales(f, "k1") == [1.5, 2.5]
    assert load_scales(f, "k2") == [3.0]
    assert load_scales(f, "k3") is None


def test_legacy_single_entry_read_and_migrate(tmp_path):
    f = str(tmp_path / "c.json")
    with open(f, "w") as fh:
        json.dump({"key": "old", "x_scales": [0.25]}, fh)
    # readable in place
    assert load_scales(f, "old") == [0.25]
    # a save folds the legacy payload into the multi-entry format
    save_scales(f, "new", [0.5])
    assert load_scales(f, "old") == [0.25]
    assert load_scales(f, "new") == [0.5]
    with open(f) as fh:
        assert set(json.load(fh)["entries"]) == {"old", "new"}


def test_save_overwrites_same_key(tmp_path):
    f = str(tmp_path / "c.json")
    save_scales(f, "k", [1.0])
    save_scales(f, "k", [2.0])
    assert load_scales(f, "k") == [2.0]


def test_corrupt_file_tolerated_on_save(tmp_path):
    f = str(tmp_path / "c.json")
    with open(f, "w") as fh:
        fh.write("{not json")
    save_scales(f, "k", [1.0])
    assert load_scales(f, "k") == [1.0]


def test_keys_are_distinct_and_config_sensitive():
    e = encoder_cache_key(fold_bn="1", dtype_name="bf16")
    r = recnet_cache_key(fold_bn="1", dtype_name="bf16")
    assert e != r
    assert encoder_cache_key(fold_bn="0", dtype_name="bf16") != e
    assert recnet_cache_key(fold_bn="1", dtype_name="fp32") != r
    assert recnet_cache_key(fold_bn="1", dtype_name="bf16", cal_batch=16) != r
