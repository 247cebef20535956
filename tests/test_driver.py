"""Driver-level tests: synthetic LFW tree -> test() eval path end-to-end,
on a tiny encoder so the 1-core CPU suite stays fast."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_eval_pairs_protocol_runs(lfw_tree):
    """evaluate_pairs over a real (tiny) LFW tree with ocl substitution."""
    from ffrnet_tpu.data.datasets import LfwPairs, _listdir_cached
    from ffrnet_tpu.data.pipeline import BatchLoader
    from ffrnet_tpu.eval.lfw import kfold_verification, pair_cosine
    from ffrnet_tpu.models import irse

    _listdir_cached.cache_clear()
    root, pairs = lfw_tree
    ds = LfwPairs(str(root), str(pairs), test_ocl_num=1, flip_prob=0.0)
    assert len(ds) == 60
    loader = BatchLoader(ds, 20, shuffle=False, drop_last=False,
                         num_threads=2)

    # Tiny stand-in embedder (mean-pooled pixels) to keep CPU time sane;
    # the full-model path is covered by the slow train-step tests.
    scores, labels = [], []
    for batch in loader.epoch(0):
        f1 = batch["img1"].reshape(batch["img1"].shape[0], -1, 3).mean(1)
        f2 = batch["img2"].reshape(batch["img2"].shape[0], -1, 3).mean(1)
        scores.append(np.asarray(pair_cosine(jnp.asarray(f1), jnp.asarray(f2))))
        labels.append(batch["label"])
    scores = jnp.asarray(np.concatenate(scores))
    labels = jnp.asarray(np.concatenate(labels))
    res = kfold_verification(scores, labels, n_folds=10)
    assert np.isfinite(float(res.mean_accuracy))
    assert res.fold_accuracies.shape == (10,)


def test_options_flag_surface_matches_reference_names():
    """The public CLI flags the reference exposes must parse here too
    (utils/options.py:14-75 — TPU-meaningless GPU flags excluded)."""
    from ffrnet_tpu.config import parse_args

    opts = parse_args([
        "--phase", "test", "--batch_size", "16", "--total_epochs", "3",
        "--model_name", "FFR-Net", "--optimizer", "Adam", "--lr", "0.1",
        "--beta1", "0.9", "--momentum", "0.9", "--weight_decay", "0",
        "--loss_weight", "1", "1", "1", "1", "--print_freq", "100",
        "--save_freq", "4000", "--eval_freq", "1000", "--continue_train", "0",
        "--which_file", "latest", "--other", "train", "--debug", "0",
        "--train_data", "x", "--seed", "5", "--nThread", "2",
    ], make_dirs=False)
    assert opts.phase == "test" and opts.which_file == "latest"
    assert opts.n_thread == 2 and opts.seed == 5


def test_graft_entry_single_chip():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*jax.tree.map(
        lambda x: (jnp.zeros_like(x) if hasattr(x, "shape") else x), args))
    embed, feat_v, feat_new = out
    assert embed.shape == (8, 512)
    assert feat_v.shape == (8, 512)
    assert feat_new.shape == (8, 7, 7, 512)


def test_eval_batches_deterministic_by_default(lfw_tree):
    """Driver eval pins flip_prob=0: identical eval batches across seeds
    (the reference's random eval flip is opt-in via --faithful_eval_flip)."""
    from ffrnet_tpu.config import Options
    from ffrnet_tpu.data.datasets import _listdir_cached
    from ffrnet_tpu.train import make_eval_batches

    _listdir_cached.cache_clear()
    root, pairs = lfw_tree

    def first_epoch(seed, faithful=0):
        opts = Options(test_data=str(root), test_pair_list=str(pairs),
                       seed=seed, n_thread=2,
                       faithful_eval_flip=faithful).finalize(make_dirs=False)
        return np.concatenate(
            [np.asarray(b["img1"])
             for b in make_eval_batches(opts, 0, 20)[0]])

    np.testing.assert_array_equal(first_epoch(1), first_epoch(2))
    # faithful mode restores the reference's seed-dependent flips
    assert not np.array_equal(first_epoch(1, faithful=1),
                              first_epoch(2, faithful=1))


@pytest.mark.slow
def test_non_finite_loss_aborts_before_checkpoint(tmp_path, monkeypatch):
    """Failure detection through the LAZY metrics flush: an exploding run
    (lr=1e30) must raise FloatingPointError naming the poisoned iter, and
    every checkpoint on disk must still hold finite params (the flush runs
    before each save, so a poisoned step never reaches a checkpoint)."""
    import glob

    from ffrnet_tpu.checkpoint.store import load_checkpoint
    from ffrnet_tpu.config import Options
    from ffrnet_tpu.train import train

    monkeypatch.chdir(tmp_path)
    opts = Options(phase="train", train_data="synthetic", num_classes=8,
                   batch_size=8, total_epochs=1, optimizer="sgd", lr=1e30,
                   save_freq=1, print_freq=1000, eval_freq=0, n_thread=2,
                   seed=0, weight_root=str(tmp_path / "w")).finalize()
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        train(opts)
    found = glob.glob(str(tmp_path / "w" / "**" / "*.pth.gzip"),
                      recursive=True)
    assert found, "expected at least one checkpoint before the abort"
    for f in found:
        import os

        params, _, _, _ = load_checkpoint(os.path.dirname(f),
                                          os.path.basename(f).split(".")[0])
        for leaf in jax.tree.leaves(params):
            assert np.isfinite(np.asarray(leaf)).all(), f


@pytest.mark.slow
def test_resume_mid_epoch_after_epoch_zero(tmp_path, monkeypatch):
    """Resume fast-forward uses the IN-EPOCH offset: a checkpoint taken
    mid-epoch-1 must resume with the remaining batches of epoch 1, not
    skip the whole epoch (the reference compares the per-epoch index
    against the GLOBAL iter, train.py:42 — silently dropping up to a full
    epoch of training; fixed, PARITY.md)."""
    import glob
    import shutil

    from ffrnet_tpu.checkpoint.store import load_checkpoint
    from ffrnet_tpu.config import Options
    from ffrnet_tpu.train import train

    monkeypatch.chdir(tmp_path)

    def make_opts(root, extra=None):
        kw = dict(phase="train", train_data="synthetic", num_classes=16,
                  batch_size=8, total_epochs=2, optimizer="sgd", lr=1e-3,
                  save_freq=4, print_freq=1000, eval_freq=0, n_thread=2,
                  seed=0, weight_root=str(root))
        kw.update(extra or {})
        return Options(**kw).finalize()

    # full run: 64 synthetic samples / batch 8 = 8 steps/epoch x 2 epochs
    train(make_opts(tmp_path / "w1"))
    ck1 = glob.glob(str(tmp_path / "w1" / "**" / "0000012.pth.gzip"),
                    recursive=True)
    assert ck1, "expected the numbered iter-12 checkpoint (epoch 1)"
    _, _, _, meta = load_checkpoint(os.path.dirname(ck1[0]), "0000012")
    assert meta == {"epoch": 1, "iter": 12}

    # resume from iter 12 (epoch 1, in-epoch offset 4) in a FRESH root:
    # only the copied checkpoint exists, so any 'latest' afterward was
    # written by the resumed run itself
    opts2 = make_opts(tmp_path / "w2", {"continue_train": 1,
                                        "which_file": "0000012"})
    shutil.copy(ck1[0], os.path.join(opts2.ckpt_dir, "0000012.pth.gzip"))
    train(opts2)
    # the fixed fast-forward trains exactly steps 13..16; the reference's
    # global-index comparison would skip all of epoch 1 and write nothing
    _, _, _, meta2 = load_checkpoint(opts2.ckpt_dir, "latest")
    assert meta2 == {"epoch": 1, "iter": 16}, meta2


@pytest.mark.slow
def test_orbax_backend_train_and_resume(tmp_path, monkeypatch):
    """--ckpt_backend orbax end-to-end: train saves pruned orbax steps
    (save_freq multiples + newest), resume restores params/opt/epoch/iter
    from the latest step and continues to the right final iteration."""
    import glob

    from ffrnet_tpu.config import Options
    from ffrnet_tpu.train import train

    pytest.importorskip("orbax.checkpoint")
    monkeypatch.chdir(tmp_path)

    def make_opts(extra=None):
        kw = dict(phase="train", train_data="synthetic", num_classes=16,
                  batch_size=8, total_epochs=1, optimizer="adam", lr=1e-3,
                  save_freq=4, print_freq=1000, eval_freq=0, n_thread=2,
                  seed=0, ckpt_backend="orbax",
                  weight_root=str(tmp_path / "w"))
        kw.update(extra or {})
        return Options(**kw).finalize()

    train(make_opts())  # 64 samples / batch 8 = 8 steps
    ck_dir = make_opts().ckpt_dir
    steps = sorted(glob.glob(ck_dir + "/orbax_*"))
    step_ids = [int(s.split("_")[-1]) for s in steps]
    assert 8 in step_ids and 4 in step_ids          # save_freq multiples
    assert all(s % 4 == 0 or s >= 7 for s in step_ids), step_ids  # pruned

    # resume for one more epoch from the latest orbax step
    train(make_opts({"continue_train": 1, "total_epochs": 2}))
    step_ids = [int(s.split("_")[-1])
                for s in glob.glob(ck_dir + "/orbax_*")]
    assert max(step_ids) == 16, step_ids


@pytest.mark.slow
def test_midtrain_eval_on_multidevice_mesh(tmp_path, monkeypatch, lfw_tree):
    """Mid-train LFW eval must run against MESH-PLACED params: the train
    loop's params carry NamedShardings over the ('data','model') mesh, so
    the eval batches have to be placed on the same device set (the loader
    placement is replicated(mesh); a bare local-device placement makes jit
    reject the mixed device sets — regression caught in round-6 review)."""
    from ffrnet_tpu.config import Options
    from ffrnet_tpu.data.datasets import _listdir_cached
    from ffrnet_tpu.train import train

    _listdir_cached.cache_clear()
    monkeypatch.chdir(tmp_path)
    root, pairs = lfw_tree
    opts = Options(phase="train", train_data="synthetic", num_classes=8,
                   batch_size=8, total_epochs=1, optimizer="sgd", lr=1e-3,
                   save_freq=1000, print_freq=1000, n_thread=2, seed=0,
                   mesh_data=4, mesh_model=2,  # 8 virtual CPU devices
                   eval_freq=4,  # fires mid-epoch (32 samples / batch 8)
                   visualize=1,  # attention panel on the same mesh params
                   test_data=str(root), test_pair_list=str(pairs),
                   weight_root=str(tmp_path / "w")).finalize()
    train(opts)  # raises if eval batches land on an incompatible device set
    import glob

    pngs = glob.glob(os.path.join(opts.ckpt_dir, "visuals",
                                  "attention_*.png"))
    assert pngs, "expected --visualize 1 to dump an attention panel PNG"


@pytest.mark.slow
def test_int8_encoder_train(tmp_path, monkeypatch, capfd):
    """--int8_encoder 1: the frozen encoder is BN-folded, int8-quantized,
    and static-calibrated on REAL training images, then runs inside the
    jitted train step (gradients never touch it — only RecNet params are
    differentiated), while LFW eval keeps the float tree. The loop must
    train to completion with finite per-iter losses. Measured win:
    1.216x full-step throughput (BASELINE.md enc_arms duel); reference
    has only the fp32 frozen forward (models/trainer.py:139-146)."""
    from ffrnet_tpu.config import Options, parse_args
    from ffrnet_tpu.train import train

    # flag surface: parses from the CLI like every other option
    assert parse_args(["--int8_encoder", "1"],
                      make_dirs=False).int8_encoder == 1

    monkeypatch.chdir(tmp_path)
    opts = Options(phase="train", train_data="synthetic", num_classes=4,
                   batch_size=8, total_epochs=1, optimizer="sgd", lr=1e-3,
                   save_freq=1000, print_freq=1,  # flush (checks finite)
                   eval_freq=0, n_thread=2, seed=0, int8_encoder=1,
                   weight_root=str(tmp_path / "w")).finalize()
    train(opts)  # 16 samples / batch 8 = 2 int8-encoder steps
    err = capfd.readouterr().err
    assert "[int8_encoder] calibrated static scales" in err


def test_mesh_eval_batch_selection():
    """_mesh_eval_batch: largest batch under the request whose every
    loader batch (ragged tail included) divides by the 'data' axis."""
    from ffrnet_tpu.train import _mesh_eval_batch

    assert _mesh_eval_batch(6000, 250, 8) == 248  # 6000%248=48, 48%8=0
    assert _mesh_eval_batch(6000, 250, 2) == 250
    assert _mesh_eval_batch(60, 20, 4) == 20
    assert _mesh_eval_batch(7, 3, 2) is None  # nothing divides -> replicate


def test_make_eval_batches_shards_over_mesh(lfw_tree):
    """Passing the Mesh to make_eval_batches shards every eval batch over
    'data' (a replicated batch makes each device redundantly score the
    full protocol — round-5 review); the pair ORDER (and hence the
    protocol result) is unchanged vs the unsharded loader."""
    from jax.sharding import PartitionSpec as P

    from ffrnet_tpu.config import Options
    from ffrnet_tpu.data.datasets import _listdir_cached
    from ffrnet_tpu.parallel.mesh import make_mesh
    from ffrnet_tpu.train import make_eval_batches

    _listdir_cached.cache_clear()
    root, pairs = lfw_tree
    opts = Options(test_data=str(root), test_pair_list=str(pairs),
                   seed=0, n_thread=2).finalize(make_dirs=False)
    mesh = make_mesh(n_data=4, n_model=2)
    batches, n_pairs = make_eval_batches(opts, 0, 20, placement=mesh)
    got = []
    for b in batches:
        assert b["img1"].shape[0] % 4 == 0
        assert b["img1"].sharding.spec == P("data")
        got.append(np.asarray(b["img1"]))
    assert sum(g.shape[0] for g in got) == n_pairs == 60
    ref, _ = make_eval_batches(opts, 0, 20)  # default local placement
    np.testing.assert_array_equal(
        np.concatenate(got), np.concatenate([np.asarray(b["img1"])
                                             for b in ref]))
