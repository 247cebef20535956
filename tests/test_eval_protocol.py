"""Verification-protocol tests: the vectorized device sweep vs the
reference's OWN KFold / find_best_threshold / eval_acc functions
(lfw/lfw_eval.py:110-162) — the reference code itself is the golden, so a
misread of the protocol cannot be baked into both sides (VERDICT r1 #4).
A numpy mirror remains only as a fast large-n sanity check."""

import numpy as np
import pytest
import jax.numpy as jnp

from ffrnet_tpu.eval.lfw import kfold_verification, pair_cosine


@pytest.fixture(scope="module")
def ref_eval():
    """The reference's own eval-protocol module (plain numpy/python —
    importable here; torch is present for the parity fixtures anyway)."""
    from ffrnet_tpu.utils.reference_compat import install_reference_stubs

    if not install_reference_stubs():
        pytest.skip("reference checkout not available")
    pytest.importorskip("torch")
    import lfw.lfw_eval as le

    return le


def _reference_avg_accuracy(le, scores, labels):
    """Drive the reference's actual functions exactly as get_avg_accuracy
    does (lfw/lfw_eval.py:272-287): KFold -> find_best_threshold on the
    train split -> eval_acc on the test split, rows = [dist, label, idx]."""
    predicts = np.array(
        [[float(s), int(l), i] for i, (s, l) in enumerate(zip(scores, labels))])
    thresholds = np.arange(-1.0, 1.0, 0.005)
    accs, best_ts = [], []
    for train, test in le.KFold(len(scores), 10):
        best_t = le.find_best_threshold(thresholds, predicts[train])
        accs.append(le.eval_acc(best_t, predicts[test], save_wrong=0))
        best_ts.append(best_t)
    return float(np.mean(accs)), np.array(best_ts), np.array(accs)


def test_kfold_matches_reference_code(ref_eval):
    """Golden vs the reference's own protocol functions on a realistic
    bimodal score distribution (600 pairs: the pure-python eval_acc visits
    every row per threshold, so full 6000 would be ~10 min; fold geometry
    i*n//n_folds is identical at any n)."""
    rng = np.random.default_rng(7)
    n = 600
    labels = rng.integers(0, 2, n)
    scores = np.where(labels == 1, rng.normal(0.55, 0.2, n),
                      rng.normal(0.05, 0.2, n)).astype(np.float32).clip(-1, 1)
    ref_mean, ref_ts, ref_accs = _reference_avg_accuracy(ref_eval, scores, labels)
    res = kfold_verification(jnp.asarray(scores), jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(res.fold_accuracies), ref_accs,
                               atol=1e-6)
    np.testing.assert_allclose(float(res.mean_accuracy), ref_mean, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.best_thresholds), ref_ts,
                               atol=1e-6)


def test_kfold_matches_reference_code_tie_cases(ref_eval):
    """Tie-break edges against the reference's own code: scores drawn FROM
    the threshold grid force exact score==threshold comparisons (eval_acc
    uses strict >) and many-way accuracy ties (find_best_threshold keeps
    the LAST tied threshold via >=)."""
    rng = np.random.default_rng(11)
    n = 600
    grid = np.arange(-1.0, 1.0, 0.005)
    cases = [
        (grid[rng.integers(0, len(grid), n)].astype(np.float32),
         rng.integers(0, 2, n)),                     # scores on the grid
        (np.zeros(n, np.float32), np.zeros(n, np.int64)),   # all-tied sweep
        (np.full(n, 0.25, np.float32), rng.integers(0, 2, n)),  # constant
    ]
    for scores, labels in cases:
        ref_mean, ref_ts, ref_accs = _reference_avg_accuracy(
            ref_eval, scores, labels)
        res = kfold_verification(jnp.asarray(scores), jnp.asarray(labels))
        np.testing.assert_allclose(np.asarray(res.best_thresholds), ref_ts,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.fold_accuracies), ref_accs,
                                   atol=1e-6)
        np.testing.assert_allclose(float(res.mean_accuracy), ref_mean,
                                   atol=1e-6)


def _reference_protocol(scores, labels, n_folds=10):
    """Numpy mirror of the protocol — kept ONLY as a fast sanity check at
    the full n=6000 (the golden is the reference's own code above)."""
    n = len(scores)
    thresholds = np.arange(-1.0, 1.0, 0.005)
    base = list(range(n))
    accs, best_ts = [], []
    for i in range(n_folds):
        test = base[i * n // n_folds:(i + 1) * n // n_folds]
        train = list(set(base) - set(test))

        def eval_acc(threshold, idx):
            pred = (scores[idx] > threshold).astype(int)
            return np.count_nonzero(labels[idx] == pred) / len(idx)

        best_t = best_acc = 0
        for t in thresholds:
            a = eval_acc(t, train)
            if a >= best_acc:
                best_acc, best_t = a, t
        accs.append(eval_acc(best_t, test))
        best_ts.append(best_t)
    return float(np.mean(accs)), np.array(best_ts), np.array(accs)


def test_kfold_matches_reference_protocol():
    rng = np.random.default_rng(42)
    n = 6000
    labels = rng.integers(0, 2, n)
    # realistic bimodal score distribution
    scores = np.where(
        labels == 1,
        rng.normal(0.55, 0.2, n),
        rng.normal(0.05, 0.2, n),
    ).astype(np.float32).clip(-1, 1)

    ref_mean, ref_ts, ref_accs = _reference_protocol(scores, labels)
    res = kfold_verification(jnp.asarray(scores), jnp.asarray(labels))

    np.testing.assert_allclose(np.asarray(res.fold_accuracies), ref_accs, atol=1e-6)
    np.testing.assert_allclose(float(res.mean_accuracy), ref_mean, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.best_thresholds), ref_ts, atol=1e-6)


def test_kfold_tie_break_keeps_last_threshold():
    # All-zero scores, all labels 0: every threshold >= 0 predicts "diff" for
    # all pairs -> accuracy 1 for thresholds >= 0; the reference keeps the
    # LAST tied threshold (>= update).
    scores = np.zeros(6000, dtype=np.float32)
    labels = np.zeros(6000, dtype=np.int64)
    ref_mean, ref_ts, _ = _reference_protocol(scores, labels)
    res = kfold_verification(jnp.asarray(scores), jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(res.best_thresholds), ref_ts, atol=1e-6)
    assert float(res.mean_accuracy) == ref_mean == 1.0


def test_pair_cosine_epsilon():
    f1 = np.zeros((3, 8), dtype=np.float32)
    f2 = np.ones((3, 8), dtype=np.float32)
    out = np.asarray(pair_cosine(jnp.asarray(f1), jnp.asarray(f2)))
    np.testing.assert_allclose(out, 0.0)  # 0/(0+eps), no NaN

    rng = np.random.default_rng(0)
    a = rng.standard_normal((5, 16)).astype(np.float32)
    b = rng.standard_normal((5, 16)).astype(np.float32)
    expected = (a * b).sum(1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-8)
    np.testing.assert_allclose(
        np.asarray(pair_cosine(jnp.asarray(a), jnp.asarray(b))), expected,
        atol=1e-6, rtol=1e-6)


def test_misclassified_indices_and_wrong_image_dump(tmp_path):
    """save_wrong_imgs equivalent (lfw/lfw_eval.py:120-135): per-fold
    thresholds -> wrong-pair indices -> PNG dump."""
    import os

    from ffrnet_tpu.eval.lfw import misclassified_indices
    from ffrnet_tpu.eval.runner import save_wrong_images

    n = 60
    labels = np.tile([1, 0], n // 2).astype(np.int64)
    scores = np.where(labels > 0, 0.8, -0.2).astype(np.float32)
    planted = [4, 11, 28]
    for i in planted:
        scores[i] = -scores[i]  # cross the margin
    res = kfold_verification(jnp.asarray(scores), jnp.asarray(labels),
                             n_folds=10)
    wrong = misclassified_indices(scores, labels, res, n_folds=10)

    # mirror: each fold's threshold applied to its own pairs
    thr = np.asarray(res.best_thresholds)
    expected = [i for i in range(n)
                if (scores[i] > thr[i // (n // 10)]) != (labels[i] > 0)]
    assert wrong.tolist() == expected
    # flipped same-person pairs land at score -0.8 — wrong at any chosen
    # threshold, so they must be reported
    assert {4, 28} <= set(wrong.tolist())

    class _FakePairs:
        def get(self, idx, rng):
            v = np.full((8, 8, 3), idx / 100.0, np.float32)
            return {"img1": v, "img2": -v}

    out_dir = tmp_path / "wrong_images_new"
    take = wrong[:3]
    n_files = save_wrong_images(_FakePairs(), take, str(out_dir))
    assert n_files == 2 * len(take) > 0
    names = sorted(os.listdir(out_dir))
    assert names[0] == f"{int(wrong[0]):04d}_1.png"
    assert len(names) == n_files


def test_roc_and_tar_at_far():
    """roc_curve / tar_at_far against a literal numpy mirror."""
    from ffrnet_tpu.eval.lfw import roc_curve, tar_at_far

    rng = np.random.default_rng(4)
    labels = (rng.uniform(size=600) > 0.5).astype(np.int64)
    scores = np.where(labels > 0, rng.normal(0.4, 0.3, 600),
                      rng.normal(-0.2, 0.3, 600)).astype(np.float32)
    fpr, tpr = map(np.asarray, roc_curve(jnp.asarray(scores),
                                         jnp.asarray(labels)))
    ths = -1.0 + 0.005 * np.arange(400)
    pos, neg = labels > 0, labels == 0
    exp_tpr = [(scores[pos] > t).mean() for t in ths]
    exp_fpr = [(scores[neg] > t).mean() for t in ths]
    np.testing.assert_allclose(tpr, exp_tpr, atol=1e-6)
    np.testing.assert_allclose(fpr, exp_fpr, atol=1e-6)

    tar = tar_at_far(scores, labels, far_targets=(0.01, 0.1))
    assert 0.0 <= tar[0.01] <= tar[0.1] <= 1.0


def test_exact_roc_and_metrics():
    """exact_roc / roc_metrics vs a brute-force sweep over unique scores."""
    from ffrnet_tpu.eval.lfw import exact_roc, roc_metrics

    rng = np.random.default_rng(7)
    labels = (rng.uniform(size=500) > 0.5).astype(np.int64)
    scores = np.where(labels > 0, rng.normal(0.5, 0.25, 500),
                      rng.normal(-0.1, 0.25, 500)).astype(np.float32)
    # force ties so the tie-collapse path is exercised
    scores[:50] = np.round(scores[:50], 1)

    fpr, tpr = exact_roc(scores, labels)
    assert fpr[0] == tpr[0] == 0.0 and fpr[-1] == tpr[-1] == 1.0
    assert np.all(np.diff(fpr) >= 0) and np.all(np.diff(tpr) >= 0)
    pos, neg = labels > 0, labels == 0
    # brute force: threshold just below each unique score (predict >= s)
    exp = {(0.0, 0.0)}
    for s in np.unique(scores):
        exp.add((float((scores[neg] >= s).mean()),
                 float((scores[pos] >= s).mean())))
    got = set(zip(map(float, fpr), map(float, tpr)))
    assert got == exp

    m = roc_metrics(scores, labels, far_targets=(1e-2, 1e-1))
    assert set(m) == {"tar@far", "eer", "auc"}
    assert 0.0 <= m["tar@far"][0.01] <= m["tar@far"][0.1] <= 1.0
    # well-separated classes: strong AUC, small EER; and EER sits where
    # interpolated FPR == FNR along the curve
    assert m["auc"] > 0.9 and m["eer"] < 0.2
    fnr_at = 1.0 - np.interp(m["eer"], fpr, tpr)
    assert abs(fnr_at - m["eer"]) < 0.02

    # degenerate single-class inputs stay finite
    m_pos = roc_metrics(np.array([0.1, 0.2]), np.array([1, 1]))
    assert np.isfinite(m_pos["eer"]) and np.isfinite(m_pos["auc"])


def test_kfold_bf16_scores_use_exact_f32_grid():
    """The round-down threshold grid must stay f32 even for bf16 scores:
    comparisons promote bf16 -> f32 exactly, whereas casting the grid to
    bf16 re-rounds thresholds to NEAREST and flips comparisons near grid
    points (round-5 review). Property: bf16 scores and their exact f32
    images must produce identical fold results."""
    import ml_dtypes

    rng = np.random.default_rng(11)
    labels = (rng.uniform(size=600) > 0.5).astype(np.int64)
    scores = np.where(labels > 0, rng.normal(0.35, 0.3, 600),
                      rng.normal(-0.2, 0.3, 600)).astype(np.float32)
    # park some scores exactly ON grid points (as bf16 values)
    scores[:100] = np.float32(
        np.asarray([-0.5, 0.0, 0.25, 0.5] * 25, np.float32).astype(
            ml_dtypes.bfloat16))
    s_bf16 = jnp.asarray(scores).astype(jnp.bfloat16)
    s_f32 = s_bf16.astype(jnp.float32)  # exact image of every bf16 value
    r16 = kfold_verification(s_bf16, jnp.asarray(labels))
    r32 = kfold_verification(s_f32, jnp.asarray(labels))
    assert float(r16.mean_accuracy) == float(r32.mean_accuracy)
    np.testing.assert_array_equal(np.asarray(r16.best_thresholds),
                                  np.asarray(r32.best_thresholds))
    assert np.asarray(r16.best_thresholds).dtype == np.float32


def test_tar_at_far_matches_exact_roc():
    """tar_at_far interpolates on the EXACT empirical ROC (the 400-point
    grid is too coarse at small FARs — round-5 review): it must agree
    with roc_metrics for shared targets."""
    from ffrnet_tpu.eval.lfw import roc_metrics, tar_at_far

    rng = np.random.default_rng(5)
    labels = (rng.uniform(size=4000) > 0.5).astype(np.int64)
    scores = np.where(labels > 0, rng.normal(0.5, 0.2, 4000),
                      rng.normal(-0.2, 0.2, 4000)).astype(np.float32)
    tar = tar_at_far(scores, labels, far_targets=(1e-3, 1e-2))
    m = roc_metrics(scores, labels, far_targets=(1e-3, 1e-2))
    assert tar == m["tar@far"]


def test_evaluate_pairs_default_score_fn_is_cached():
    """evaluate_pairs without score_fn must reuse ONE jitted score fn per
    config — a fresh closure per call would repay the full 30-90s TPU
    compile on every eval (round-5 review)."""
    from ffrnet_tpu.eval.runner import _SCORE_FN_CACHE, _cached_score_fn
    from ffrnet_tpu.models.recnet import RecNetConfig

    cfg = RecNetConfig(num_classes=7)
    f1 = _cached_score_fn(cfg)
    f2 = _cached_score_fn(RecNetConfig(num_classes=7))  # equal config
    assert f1 is f2
    assert _cached_score_fn(RecNetConfig(num_classes=8)) is not f1
    assert any(len(k) > 1 for k in _SCORE_FN_CACHE)


def test_multiprocess_size_mismatch_fails_after_collective():
    """A mis-sliced process must fail with the count diagnostic AFTER the
    all-gather (raising before it would hang every other host in the
    collective forever — round-5 review). Single-process simulation:
    the collective degenerates to a local gather."""
    import jax

    from ffrnet_tpu.eval.runner import evaluate_pairs_multiprocess
    from ffrnet_tpu.models import irse, recnet
    from ffrnet_tpu.models.recnet import RecNetConfig

    cfg = RecNetConfig(num_classes=4)
    enc_p, enc_s = irse.init(jax.random.PRNGKey(0))
    rec_p, rec_s = recnet.init(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(0)
    batches = [{
        "img1": rng.uniform(-1, 1, (10, 112, 112, 3)).astype(np.float32),
        "img2": rng.uniform(-1, 1, (10, 112, 112, 3)).astype(np.float32),
        "label": rng.integers(0, 2, 10).astype(np.int64),
    }]
    with pytest.raises(ValueError, match="per-process pair counts"):
        # claims 30 pairs but feeds only 10
        evaluate_pairs_multiprocess(enc_p, enc_s, rec_p, rec_s, batches,
                                    n_pairs=30, cfg=cfg,
                                    process_index=0, process_count=1)
