"""Data protocol tests: pairs.txt parsing, mask-twin resolution, transforms,
loader sharding/determinism."""

import os

import numpy as np
import pytest

from ffrnet_tpu.data.datasets import (
    CasiaPairs, LfwPairs, SyntheticPairs, _listdir_cached, find_mask_twin,
    parse_pairs_txt)
from ffrnet_tpu.data.pipeline import BatchLoader


@pytest.fixture
def tiny_lfw_tree(tmp_path):
    """Tiny LFW-style tree with masked twins and a pairs.txt."""
    from PIL import Image

    rng = np.random.default_rng(0)
    root = tmp_path / "lfw"
    names = ["Alice_A", "Bob_B"]
    for name in names:
        d = root / name
        d.mkdir(parents=True)
        for i in (1, 2):
            arr = rng.integers(0, 255, (112, 112, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{name}_{i:04}.jpg")
            # masked twin: numeric-prefix match, different name
            Image.fromarray(arr // 2).save(d / f"{name}_{i:04}_surgical.jpg")
    pairs = root / "pairs.txt"
    pairs.write_text(
        "2\n"
        "Alice_A\t1\t2\n"            # same pair
        "Alice_A\t1\tBob_B\t2\n"     # diff pair
    )
    return root, pairs


def test_parse_pairs_txt(tiny_lfw_tree):
    root, pairs = tiny_lfw_tree
    names, labels = parse_pairs_txt(str(pairs))
    assert names == [("Alice_A/Alice_A_0001.jpg", "Alice_A/Alice_A_0002.jpg"),
                     ("Alice_A/Alice_A_0001.jpg", "Bob_B/Bob_B_0002.jpg")]
    assert labels == [1, 0]


def test_find_mask_twin(tiny_lfw_tree):
    root, _ = tiny_lfw_tree
    _listdir_cached.cache_clear()
    twin = find_mask_twin(str(root), "Alice_A/Alice_A_0001.jpg")
    assert twin == os.path.join("Alice_A", "Alice_A_0001_surgical.jpg")
    # the reference's prefix scan is one-directional: the masked file's stem
    # is no prefix of the clean file, so no twin is found (get_mask_path,
    # data/dataset.py:15-22)
    assert find_mask_twin(str(root), "Alice_A/Alice_A_0001_surgical.jpg") is None


def test_lfw_pairs_ocl_substitution(tiny_lfw_tree):
    root, pairs = tiny_lfw_tree
    _listdir_cached.cache_clear()
    rng = np.random.default_rng(0)
    ds0 = LfwPairs(str(root), str(pairs), test_ocl_num=0, flip_prob=0.0)
    ds1 = LfwPairs(str(root), str(pairs), test_ocl_num=1, flip_prob=0.0)
    ds2 = LfwPairs(str(root), str(pairs), test_ocl_num=2, flip_prob=0.0)
    s0, s1, s2 = ds0.get(0, rng), ds1.get(0, rng), ds2.get(0, rng)
    # ocl1 swaps img1 for its masked twin (pixel values halved)
    assert not np.allclose(s0["img1"], s1["img1"])
    np.testing.assert_allclose(s0["img2"], s1["img2"])
    assert not np.allclose(s1["img2"], s2["img2"])
    assert s0["label"] == 1 and s0["img1"].shape == (112, 112, 3)
    assert s0["img1"].min() >= -1.0 and s0["img1"].max() <= 1.0


def test_lfw_pairs_missing_twin_fails_loudly(tiny_lfw_tree, tmp_path):
    # evaluating the clean image as "masked" would silently inflate ocl
    # accuracy (the reference crashes on a missing twin too)
    from PIL import Image

    root = tmp_path / "lfw_nomask"
    d = root / "Carol_C"
    d.mkdir(parents=True)
    arr = np.zeros((112, 112, 3), np.uint8)
    for i in (1, 2):
        Image.fromarray(arr).save(d / f"Carol_C_{i:04}.jpg")  # no twins
    pairs = root / "pairs.txt"
    pairs.write_text("1\nCarol_C\t1\t2\n")
    _listdir_cached.cache_clear()
    rng = np.random.default_rng(0)
    ds = LfwPairs(str(root), str(pairs), test_ocl_num=1, flip_prob=0.0)
    with pytest.raises(FileNotFoundError, match="masked twin"):
        ds.get(0, rng)
    # ocl0 on the same tree is fine
    LfwPairs(str(root), str(pairs), test_ocl_num=0, flip_prob=0.0).get(0, rng)


def test_mask_verification_rgb_quirk(tmp_path):
    # the reference's Mask_Data feeds raw RGB (no BGR re-merge,
    # data/dataloader_mask_verification.py:63-77); bgr=True opts into the
    # consistent BGR protocol
    from PIL import Image

    from ffrnet_tpu.data.datasets import MaskVerificationPairs

    root = tmp_path / "maskver"
    d = root / "masked_whn_112_align_v4"
    d.mkdir(parents=True)
    arr = np.zeros((112, 112, 3), np.uint8)
    arr[..., 0] = 200  # red-dominant so RGB vs BGR differ
    Image.fromarray(arr).save(d / "a.jpg")
    Image.fromarray(arr).save(d / "b.jpg")
    (root / "masked_pairs_new_v4.txt").write_text("a.jpg b.jpg 1\n")
    rng = np.random.default_rng(0)
    rgb = MaskVerificationPairs(str(root), flip_prob=0.0).get(0, rng)
    bgr = MaskVerificationPairs(str(root), flip_prob=0.0, bgr=True).get(0, rng)
    np.testing.assert_allclose(rgb["img1"], bgr["img1"][..., ::-1], atol=0.02)
    assert rgb["img1"][0, 0, 0] > rgb["img1"][0, 0, 2]  # R first (RGB)
    assert bgr["img1"][0, 0, 2] > bgr["img1"][0, 0, 0]  # R last (BGR)


def test_batch_loader_rejects_bad_process_args():
    ds = SyntheticPairs(num_identities=4)
    with pytest.raises(ValueError, match="together"):
        BatchLoader(ds, 4, process_index=1)
    with pytest.raises(ValueError, match="out of range"):
        BatchLoader(ds, 4, process_index=2, process_count=2)


def test_casia_pairs_bgr_and_flip(tiny_lfw_tree, tmp_path):
    root, _ = tiny_lfw_tree
    _listdir_cached.cache_clear()
    lst = tmp_path / "list.txt"
    lst.write_text("Alice_A/Alice_A_0001.jpg 0\nBob_B/Bob_B_0002.jpg 1\n")
    ds = CasiaPairs(str(root), str(lst), flip_prob=0.0, use_native=False)
    s = ds.get(0, np.random.default_rng(0))
    assert s["img_non"].shape == (112, 112, 3) and s["label"] == 0

    # BGR: reconstruct expected from PIL RGB
    from PIL import Image

    rgb = np.asarray(Image.open(root / "Alice_A/Alice_A_0001.jpg").convert("RGB"))
    expected = (rgb[:, :, ::-1].astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(s["img_non"], expected, atol=1e-6)

    # paired flip: with flip_prob=1 both images flip together
    ds_flip = CasiaPairs(str(root), str(lst), flip_prob=1.0, use_native=False)
    sf = ds_flip.get(0, np.random.default_rng(0))
    np.testing.assert_allclose(sf["img_non"], s["img_non"][:, ::-1], atol=1e-6)

    # native C++ decode fast path agrees with the PIL path (decoder-level
    # differences allowed: a couple of pixel LSB)
    from ffrnet_tpu.data import native

    if native.is_available():
        ds_nat = CasiaPairs(str(root), str(lst), flip_prob=0.0,
                            use_native=True)
        sn = ds_nat.get(0, np.random.default_rng(0))
        assert np.abs(sn["img_non"] - s["img_non"]).max() * 127.5 <= 2.0


def test_batch_loader_sharding_and_determinism():
    ds = SyntheticPairs(num_identities=8, samples_per_id=4)
    full = BatchLoader(ds, 4, shuffle=True, seed=7, num_threads=2)
    b0 = list(full.epoch(0))
    b0_again = list(BatchLoader(ds, 4, shuffle=True, seed=7,
                                num_threads=2).epoch(0))
    assert len(b0) == 8
    for a, b in zip(b0, b0_again):
        np.testing.assert_array_equal(a["img_non"], b["img_non"])
        np.testing.assert_array_equal(a["label"], b["label"])

    # two-host split covers the whole (shuffled) stream disjointly
    h0 = BatchLoader(ds, 4, shuffle=True, seed=7, process_index=0,
                     process_count=2)
    h1 = BatchLoader(ds, 4, shuffle=True, seed=7, process_index=1,
                     process_count=2)
    l0 = np.concatenate([b["label"] for b in h0.epoch(0)])
    l1 = np.concatenate([b["label"] for b in h1.epoch(0)])
    assert len(l0) == len(l1) == 16
    # shuffle differs between epochs
    e1 = list(full.epoch(1))
    assert not all(np.array_equal(a["label"], b["label"])
                   for a, b in zip(b0, e1))


def test_config_roundtrip(tmp_path):
    from ffrnet_tpu.config import parse_args

    opts = parse_args([
        "--phase", "train", "--batch_size", "32", "--optimizer", "adabound",
        "--lr", "0.001", "--loss_weight", "1", "2", "3", "0.5",
        "--weight_root", str(tmp_path), "--other", "unit"],
        make_dirs=True)
    assert opts.save_weight_dir == "model_FFR-Net-loss_sphere-unit"
    assert (tmp_path / opts.save_weight_dir / "opt.txt").exists()
    tc = opts.trainer_config()
    assert tc.optimizer == "adabound" and tc.loss_weight == (1, 2, 3, 0.5)


def test_checkpoint_store_roundtrip(tmp_path):
    import jax

    from ffrnet_tpu.checkpoint.store import (
        load_checkpoint, resolve_latest, save_checkpoint)
    from ffrnet_tpu.models import recnet

    params, state = recnet.init(jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), "0000100", params=params, model_state=state,
                    epoch=2, iteration=100)
    save_checkpoint(str(tmp_path), "latest", params=params, model_state=state,
                    epoch=2, iteration=110)
    # 'latest' resolves to lexicographic max -> 'latest.pth.gzip' sorts after
    # numbers (reference semantics, models/trainer.py:202-204)
    assert resolve_latest(str(tmp_path)).endswith("latest.pth.gzip")
    p2, s2, opt, meta = load_checkpoint(str(tmp_path), "latest")
    assert meta == {"epoch": 2, "iter": 110}
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(np.array_equal(a, b)), params, p2))


def test_batch_loader_equal_steps_across_hosts():
    """Uneven datasets must not desynchronize collective steps (shards are
    truncated to equal length; global batch divides across hosts)."""
    ds = SyntheticPairs(num_identities=5, samples_per_id=3)  # 15 samples
    h0 = BatchLoader(ds, 4, shuffle=True, seed=1, drop_last=True,
                     process_index=0, process_count=2)
    h1 = BatchLoader(ds, 4, shuffle=True, seed=1, drop_last=True,
                     process_index=1, process_count=2)
    # 15 samples -> 7 per host (truncated equally) -> 3 local batches of 2
    assert len(h0) == len(h1) == 3
    b0, b1 = list(h0.epoch(0)), list(h1.epoch(0))
    assert len(b0) == len(b1) == 3
    # local batches: global batch 4 over 2 hosts = 2 samples each
    assert b0[0]["label"].shape == (2,) and b1[0]["label"].shape == (2,)
    # disjoint sample streams
    assert set(map(tuple, b0[0]["img_non"].reshape(2, -1)[:, :4])) != \
        set(map(tuple, b1[0]["img_non"].reshape(2, -1)[:, :4]))


def test_batch_loader_start_batch_skips_without_decoding():
    """epoch(start_batch=k) yields exactly batches [k:], bitwise equal to a
    full iteration (per-(epoch,sample) RNG), and never touches the skipped
    samples (resume fast-forward must not decode/upload them)."""
    touched = []

    class Tracking(SyntheticPairs):
        def get(self, idx, rng):
            touched.append(idx)
            return super().get(idx, rng)

    ds = Tracking(num_identities=8, samples_per_id=4)
    full = list(BatchLoader(ds, 4, shuffle=True, seed=5).epoch(1))
    touched.clear()
    tail = list(BatchLoader(ds, 4, shuffle=True, seed=5).epoch(
        1, start_batch=3))
    assert len(tail) == len(full) - 3
    for a, b in zip(full[3:], tail):
        np.testing.assert_array_equal(a["img_non"], b["img_non"])
        np.testing.assert_array_equal(a["label"], b["label"])
    assert len(touched) == 4 * len(tail)  # skipped samples never decoded
    with pytest.raises(ValueError):
        next(iter(BatchLoader(ds, 4).epoch(0, start_batch=99)))


def test_batch_loader_abandoned_generator_cleans_up():
    import threading

    ds = SyntheticPairs(num_identities=8, samples_per_id=4)
    before = threading.active_count()
    for _ in range(10):
        gen = BatchLoader(ds, 4, prefetch=1, num_threads=2).epoch(0)
        next(gen)
        gen.close()  # abandon mid-epoch
    import time

    time.sleep(0.5)
    assert threading.active_count() <= before + 2  # no thread pile-up


def test_batch_loader_propagates_decode_errors():
    class Broken:
        def __len__(self):
            return 8

        def get(self, idx, rng):
            raise IOError(f"corrupt sample {idx}")

    loader = BatchLoader(Broken(), 4, num_threads=2)
    with pytest.raises(IOError):
        list(loader.epoch(0))


def test_kfold_tolerates_non_divisible_n():
    import jax.numpy as jnp

    from ffrnet_tpu.eval.lfw import kfold_verification

    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.uniform(-1, 1, 5995).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, 5995))
    res = kfold_verification(scores, labels)
    assert np.isfinite(float(res.mean_accuracy))


def test_resolve_latest_skips_crashed_tmp_files(tmp_path):
    # a crash between save_pth(tmp) and os.replace leaves a truncated
    # '.{name}.tmp.pth.gzip' — it must never resolve as latest (regression)
    from ffrnet_tpu.checkpoint.pth_io import save_pth
    from ffrnet_tpu.checkpoint.store import resolve_latest

    (tmp_path / ".latest.tmp.pth.gzip").write_bytes(b"truncated garbage")
    with pytest.raises(FileNotFoundError, match="no checkpoints"):
        resolve_latest(str(tmp_path))
    save_pth({"RecNet": {}}, str(tmp_path / "0000100.pth.gzip"))
    assert resolve_latest(str(tmp_path)).endswith("0000100.pth.gzip")


def test_orbax_latest_skips_tmp_dirs(tmp_path):
    # Orbax atomic saves use sibling '...-tmp-<ts>' dirs that sort AFTER
    # the finished name; latest-selection must ignore them (regression)
    pytest.importorskip("orbax.checkpoint")
    from ffrnet_tpu.checkpoint.orbax_io import load_orbax, save_orbax

    state = {"w": np.arange(4, dtype=np.float32)}
    save_orbax(str(tmp_path), 12, state)
    (tmp_path / "orbax_000000012.orbax-checkpoint-tmp-99").mkdir()
    back = load_orbax(str(tmp_path))
    np.testing.assert_array_equal(back["w"], state["w"])


def test_recnet_from_torch_validates_num_classes():
    from ffrnet_tpu.checkpoint.torch_convert import (recnet_from_torch,
                                                     recnet_to_torch)
    from ffrnet_tpu.models import recnet
    from ffrnet_tpu.models.recnet import RecNetConfig
    import jax

    cfg16 = RecNetConfig(num_classes=16)
    params, state = recnet.init(jax.random.PRNGKey(0), cfg16)
    sd = recnet_to_torch(params, state)
    recnet_from_torch(sd, cfg16)  # matching cfg ok
    recnet_from_torch(sd)         # no cfg: skip validation (resume path)
    with pytest.raises(ValueError, match="16 classes"):
        recnet_from_torch(sd, RecNetConfig(num_classes=10575))


def test_resolve_latest_accepts_on_disk_filename(tmp_path):
    """--which_file with the literal on-disk name ('0005000.pth.gzip')
    must resolve instead of double-suffixing (round-5 review)."""
    from ffrnet_tpu.checkpoint.store import resolve_latest

    (tmp_path / "0005000.pth.gzip").write_bytes(b"x")
    got = resolve_latest(str(tmp_path), "0005000.pth.gzip")
    assert got == str(tmp_path / "0005000.pth.gzip")
    assert resolve_latest(str(tmp_path), "0005000") == got


def test_restore_opt_state_rejects_wrong_shapes():
    """Same leaf COUNT but a different model config (e.g. changed
    num_classes) must fail fast with the leaf named, not as an opaque
    XLA shape error inside the jitted step (round-5 review)."""
    from ffrnet_tpu.checkpoint.store import restore_opt_state

    template = {"m": np.zeros((4, 2), np.float32),
                "v": np.zeros((4, 2), np.float32), "count": 0}
    # dict leaves flatten in key order: count, m, v
    good = restore_opt_state(template, [np.int64(3), np.ones((4, 2)),
                                        np.ones((4, 2))])
    assert good["m"].shape == (4, 2)
    with pytest.raises(ValueError, match="leaf 1: checkpoint shape"):
        restore_opt_state(template, [np.int64(3), np.ones((5, 2)),
                                     np.ones((4, 2))])
