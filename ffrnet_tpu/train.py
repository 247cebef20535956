"""Train / test driver (reference train.py rebuilt for TPU).

Run:  python -m ffrnet_tpu.train --phase train --train_data <root> ...
      python -m ffrnet_tpu.train --phase test --test_data <root> ...

Loop cadence matches the reference (train.py:40-97): per-iteration logging,
'latest' checkpoint every save_freq//10, numbered every save_freq, LFW eval
at ocl in {0,1,2} every eval_freq, per-iteration LR schedule; resume with
--continue_train 1 --which_file latest fast-forwards to the stored
epoch/iter (train.py:29-42). The compute itself is one pjit'd step over a
('data', 'model') mesh.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ffrnet_tpu.checkpoint.pth_io import load_pth
from ffrnet_tpu.checkpoint.store import load_checkpoint, save_checkpoint
from ffrnet_tpu.checkpoint.torch_convert import backbone_from_torch, recnet_from_torch
from ffrnet_tpu.config import Options, parse_args
from ffrnet_tpu.data.datasets import CasiaPairs, LfwPairs, SyntheticPairs
from ffrnet_tpu.data.pipeline import BatchLoader
from ffrnet_tpu.eval.runner import evaluate_pairs, make_pair_score_fn
from ffrnet_tpu.models import irse
from ffrnet_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                      replicated, validate_batch_for_mesh)
from ffrnet_tpu.training.trainer import (
    TrainState, create_train_state, make_distributed_step,
    unpad_train_state_classes)
from ffrnet_tpu.utils.logger import Logger
from ffrnet_tpu.utils.timer import Timer


class PreemptionGuard:
    """Preemption-safe training: SIGTERM/SIGUSR1 -> finish the in-flight
    step, write the 'latest' checkpoint, exit cleanly with a resume hint.

    TPU pods and most cloud schedulers deliver SIGTERM (or a SIGUSR1-style
    preemption notice) with a grace window; the reference has no handling —
    a preempted run loses everything since its last periodic save and
    resumes only by manual `--continue_train 1` (train.py:29-42). The
    handler only sets a flag; all real work happens at a safe point in the
    train loop, so a signal can never corrupt a half-written checkpoint
    (checkpoint writes are atomic regardless, checkpoint/store.py).
    """

    def __init__(self):
        self.requested = False
        self._prev_handlers = {}

    def install(self) -> "PreemptionGuard":
        import signal

        for sig in (signal.SIGTERM, signal.SIGUSR1):
            self._prev_handlers[sig] = signal.signal(sig, self._handler)
        return self

    def uninstall(self) -> None:
        """Restore the handlers that were active before install(). Without
        this a SIGTERM arriving AFTER train() returns would still be
        swallowed by the stale handler — fatal for embedding processes
        (tests, notebooks, services) that expect default termination."""
        import signal

        for sig, prev in self._prev_handlers.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, TypeError):  # non-main thread / odd prev
                pass
        self._prev_handlers = {}

    def _handler(self, signum, frame):
        self.requested = True
        print(f"[preempt] signal {signum} received — will checkpoint and "
              "exit after the current step", file=sys.stderr, flush=True)


#: module-level so tests (and embedding applications) can trigger/inspect it
preemption_guard = PreemptionGuard()


def maybe_init_distributed() -> None:
    """Multi-host initialization (jax.distributed) when launched under a
    multi-process coordinator. Single-process runs skip this. Controlled by
    the standard JAX env vars (COORDINATOR_ADDRESS / process ids) or
    FFRNET_DISTRIBUTED=1 for auto-detection."""
    import os

    if os.environ.get("FFRNET_DISTRIBUTED") != "1" and \
            "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return
    try:
        jax.distributed.initialize()
        print(f"[dist] process {jax.process_index()}/{jax.process_count()} "
              f"local devices: {jax.local_device_count()}", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"[dist] initialize failed ({e}); continuing single-process",
              file=sys.stderr)


def load_encoder(opts: Options):
    """Frozen IR-SE50: imported from se50.pth when present, else random."""
    if opts.encoder_weights and os.path.exists(opts.encoder_weights):
        sd = load_pth(opts.encoder_weights)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        return backbone_from_torch(sd)
    print(f"[warn] encoder weights {opts.encoder_weights!r} not found — "
          "random init (parity numbers will be meaningless)", file=sys.stderr)
    return irse.init(jax.random.PRNGKey(0))


def prepare_int8_encoder(enc_params, enc_state, dataset, compute_dtype,
                         cal_images: int = 8):
    """Int8-static frozen encoder for the train step (--int8_encoder 1).

    Fold BN (exact — the frozen encoder always runs in eval mode), cast
    to the compute dtype, quantize conv/linear weights to int8, then
    calibrate static activation scales on the first REAL training images
    (both the mask-free and occluded streams, so mask statistics are in
    range). Gradients never touch the encoder — the loss differentiates
    only RecNet params (training/trainer.py) — so this changes no
    backward math. Measured: 1.216x full-train-step throughput at batch
    128 bf16 vs the float tree, BN-folding alone a wash (BASELINE.md
    "enc_arms"); embedding cosine floor 0.9993 (held-out, batch 256).
    The reference trains the frozen fp32 encoder every step
    (models/trainer.py:139-146 of /root/reference) with no such lever.

    Calibration runs the EAGER encoder on the host CPU (per-op dispatch
    through a relayed TPU costs ~50 ms RTT each) — one batch-8 pass,
    minutes on slow hosts, once per run.
    """
    from ffrnet_tpu.models.optimize import fold_backbone_bn
    from ffrnet_tpu.models.quantize import (calibrate_activation_scales,
                                            quantize_encoder_params)
    from ffrnet_tpu.ops.nn import tree_cast_floats

    dtype = jnp.bfloat16 if compute_dtype == "bf16" else jnp.float32
    fp, fs = fold_backbone_bn(enc_params, enc_state)
    # quantize AFTER the dtype cast so weight scales come from the
    # weights actually served inside the step
    fp, fs = tree_cast_floats((fp, fs), dtype)

    imgs = []
    cal_rng = np.random.default_rng(0)  # calibration-only sample rng; the
    # training loader's per-(epoch, sample) streams are untouched
    for i in range(len(dataset)):
        item = dataset.get(i, cal_rng)
        for k in ("img_non", "img_ocl"):
            a = np.asarray(item[k])
            if a.dtype == np.uint8:  # host_normalize=0 samples
                a = a.astype(np.float32) / 127.5 - 1.0
            imgs.append(a.astype(np.float32))
        if len(imgs) >= cal_images:
            break
    x = np.stack(imgs[:cal_images])

    t0 = time.perf_counter()
    cpu = jax.devices("cpu")[0]
    host_q, host_s = jax.device_get((quantize_encoder_params(fp), fs))
    with jax.default_device(cpu):
        cal = calibrate_activation_scales(
            jax.tree.map(jnp.asarray, host_q),
            jax.tree.map(jnp.asarray, host_s),
            [jnp.asarray(x, dtype)])
    print(f"[int8_encoder] calibrated static scales on {len(x)} training "
          f"images in {time.perf_counter() - t0:.1f}s", file=sys.stderr,
          flush=True)
    return jax.tree.map(jnp.asarray, jax.device_get(cal)), fs


def make_train_dataset(opts: Options):
    host_norm = bool(opts.host_normalize)
    if opts.train_data in ("", "synthetic"):
        print("[warn] no --train_data given — synthetic identity dataset",
              file=sys.stderr)
        return SyntheticPairs(num_identities=min(opts.num_classes, 64),
                              host_normalize=host_norm)
    img_list = opts.train_img_list or os.path.join(
        os.path.dirname(opts.train_data), "test", "casia_cleanlist.txt")
    return CasiaPairs(opts.train_data, img_list, host_normalize=host_norm)


def _mesh_eval_batch(n_pairs: int, batch_size: int, n_data: int):
    """Largest eval batch <= batch_size such that EVERY loader batch —
    including the ragged final one — is divisible by the mesh 'data'
    axis, so eval batches can shard over 'data'. None when no such size
    exists (then the caller replicates, the old behavior)."""
    for b in range(min(batch_size, n_pairs), n_data - 1, -1):
        if b % n_data == 0 and (n_pairs % b) % n_data == 0:
            return b
    return None


def make_eval_batches(opts: Options, ocl_num: int, batch_size: int,
                      placement=None):
    # flip_prob=0 pins eval determinism; the reference's random eval-time
    # flip (data/dataset.py:148-151) is opt-in via --faithful_eval_flip 1.
    ds = LfwPairs(opts.test_data, opts.test_pair_list, test_ocl_num=ocl_num,
                  flip_prob=0.5 if opts.faithful_eval_flip else 0.0,
                  host_normalize=bool(opts.host_normalize))
    n_pairs = len(ds)
    if isinstance(placement, jax.sharding.Mesh):
        # mid-train eval on a single-process mesh: shard the batches over
        # 'data' so each device scores 1/n_data of the protocol — a
        # replicated batch makes every device redundantly score the FULL
        # 6000 pairs (review finding, round 5). Falls back to replicated
        # when no batch size under the requested one divides evenly.
        mesh = placement
        n_data = mesh.shape["data"]
        placement = replicated(mesh)
        if n_data > 1:
            b = _mesh_eval_batch(n_pairs, batch_size, n_data)
            if b is not None:
                batch_size = b
                placement = batch_sharding(mesh)
    if jax.process_count() > 1:
        # contiguous per-process slice; the multiprocess runner all-gathers
        # scores back into protocol order (eval.runner)
        from ffrnet_tpu.data.pipeline import SliceDataset
        from ffrnet_tpu.eval.runner import process_pair_slice

        ds = SliceDataset(ds, process_pair_slice(n_pairs))
    # device placement in the loader's producer thread: batch k+1's upload
    # overlaps batch k's decode/dispatch (the runner never fetches per
    # batch, so the whole eval still pays ONE host sync — eval/runner.py).
    # `placement` must be compatible with wherever the caller's params
    # live: mid-train params are mesh-placed, so the train loop passes its
    # Mesh (resolved above to data-sharded batches, or replicated when
    # nothing divides) — a bare local device there would make jit reject
    # the mixed device sets. None = host batches (old behavior, kept for
    # multi-process runs where each host scores its own slice).
    loader = BatchLoader(ds, batch_size, shuffle=False, drop_last=False,
                         seed=opts.seed, num_threads=opts.n_thread,
                         process_index=0, process_count=1,
                         sharding=placement,
                         pack={"imgs": ("img1", "img2")}
                         if opts.pack_upload else None)
    return loader.epoch(0), n_pairs


def eval_lfw(opts: Options, enc, rec, ocl_num: int, cfg, score_fn=None,
             dump_wrong_to: Optional[str] = None, placement=None,
             metrics_out: Optional[dict] = None):
    """(acc_new, acc) at the given occlusion count (train.py:101-113).

    dump_wrong_to: when set, write each misclassified pair's images under
    <dump_wrong_to>/wrong_images{,_new}_ocl{n}/ — the reference's
    save_wrong_imgs hook (lfw/lfw_eval.py:120-135) wired end-to-end.
    placement: optional device/sharding for the eval batches (must match
    where enc/rec live — see make_eval_batches).
    metrics_out: when a dict is passed, it is filled with operating-point
    metrics {"new"/"raw": {"tar@far", "eer", "auc"}} from the exact
    empirical ROC (eval/lfw.py::roc_metrics) — a framework extra; the
    reference reports fold accuracy only (lfw/lfw_eval.py:272-287).
    """
    multiproc = jax.process_count() > 1
    if placement is None and not multiproc:
        # params on the default device (test phase, library callers):
        # producer-thread upload to the local device streams batches up
        placement = jax.local_devices()[0]
    batches, n_pairs = make_eval_batches(opts, ocl_num, opts.batch_size,
                                         placement=placement)
    if multiproc:
        from ffrnet_tpu.eval.runner import evaluate_pairs_multiprocess

        def run(return_scores):
            return evaluate_pairs_multiprocess(
                enc[0], enc[1], rec[0], rec[1], batches, n_pairs=n_pairs,
                cfg=cfg.recnet, score_fn=score_fn,
                return_scores=return_scores)
    else:
        def run(return_scores):
            return evaluate_pairs(enc[0], enc[1], rec[0], rec[1], batches,
                                  cfg=cfg.recnet, score_fn=score_fn,
                                  return_scores=return_scores)

    want_dump = dump_wrong_to is not None and (
        not multiproc or jax.process_index() == 0)
    if not want_dump and metrics_out is None:
        res_new, res_raw = run(False)[:2]
        return float(res_new.mean_accuracy), float(res_raw.mean_accuracy)

    res_new, res_raw, s_new, s_raw, labels = run(True)
    if metrics_out is not None:
        from ffrnet_tpu.eval.lfw import roc_metrics

        metrics_out["new"] = roc_metrics(s_new, labels)
        metrics_out["raw"] = roc_metrics(s_raw, labels)
    if not want_dump:
        return float(res_new.mean_accuracy), float(res_raw.mean_accuracy)

    from ffrnet_tpu.eval.lfw import misclassified_indices
    from ffrnet_tpu.eval.runner import save_wrong_images
    dump_ds = LfwPairs(opts.test_data, opts.test_pair_list,
                       test_ocl_num=ocl_num, flip_prob=0.0)
    for scores, res, sub in ((s_new, res_new, "wrong_images_new"),
                             (s_raw, res_raw, "wrong_images")):
        wrong = misclassified_indices(scores, labels, res)
        n = save_wrong_images(dump_ds, wrong,
                              os.path.join(dump_wrong_to,
                                           f"{sub}_ocl{ocl_num}"))
        print(f"[save_wrong] ocl{ocl_num} {sub}: {n} files", file=sys.stderr)
    return float(res_new.mean_accuracy), float(res_raw.mean_accuracy)


def log_attention_visual(opts: Options, enc, rec, cfg, logger,
                         iteration: int, placement=None) -> None:
    """Render + log the attention panel for the first ocl-1 eval batch.

    Rebuild of the reference's visualize() (lfw/lfw_eval.py:164-223 —
    defined there but never called; live here behind --visualize 1):
    clean|masked 4-column panels (image, 67x67 M_space grid, M_channel
    matrix, argmax-channel feature map) to TensorBoard and
    ckpt_dir/visuals/attention_{iter:07d}.png.
    """
    import types

    from ffrnet_tpu.eval.visualize import visualize_pair
    from ffrnet_tpu.models import recnet as recnet_mod

    n_rows = min(opts.batch_size, 8)
    batches, _ = make_eval_batches(opts, 1, n_rows, placement=placement)
    batch = next(iter(batches))
    img1 = batch["imgs"][:, 0] if "imgs" in batch else batch["img1"]
    img2 = batch["imgs"][:, 1] if "imgs" in batch else batch["img2"]

    @jax.jit
    def attention(enc_p, enc_s, rec_p, rec_s, i1, i2):
        from ffrnet_tpu.ops.nn import images_to_unit_range

        i1, i2 = images_to_unit_range(i1), images_to_unit_range(i2)
        both = jnp.concatenate([i1, i2], axis=0)
        fm, _, _ = irse.apply(enc_p, enc_s, both, training=False)
        lab = jnp.zeros((both.shape[0],), jnp.int32)  # head output unused
        out, _ = recnet_mod.apply(rec_p, rec_s, fm, lab, cfg=cfg.recnet,
                                  training=False)
        return fm, out.m_space, out.m_channel, i1, i2

    fm, m_space, m_channel, i1, i2 = jax.device_get(
        attention(enc[0], enc[1], rec[0], rec[1], img1, img2))
    n = i1.shape[0]

    def half(sl):
        return types.SimpleNamespace(m_space=m_space[sl], m_channel=m_channel[sl])

    panel = visualize_pair(i1, half(slice(None, n)), i2,
                           half(slice(n, None)), fm[:n], fm[n:],
                           n_rows=n_rows)
    logger.record_single_image(panel, "attention/ocl1")
    try:
        from PIL import Image

        path = os.path.join(opts.ckpt_dir, "visuals",
                            f"attention_{iteration:07d}.png")
        Image.fromarray(panel).save(path)
    except Exception as e:  # PNG dump is best-effort; the scalar eval is not
        print(f"[visualize] PNG dump failed: {e}", file=sys.stderr)


def train(opts: Options) -> None:
    # arm the preemption guard FIRST: setup (weight import, compile,
    # placement) takes long enough that a grace-window signal can land
    # before the loop starts — it must not be lost (or kill the process)
    guard = preemption_guard
    guard.requested = False
    try:
        guard.install()
    except ValueError:  # not the main thread (e.g. driven from a test)
        pass
    try:
        _train(opts, guard)
    finally:
        guard.uninstall()


def _train(opts: Options, guard: PreemptionGuard) -> None:
    logger = Logger(opts.log_dir, opts.save_weight_dir, phase="train")
    timer = Timer()
    cfg = opts.trainer_config()

    dataset = make_train_dataset(opts)
    enc_params, enc_state = load_encoder(opts)

    state = create_train_state(jax.random.PRNGKey(opts.seed), cfg)
    start_epoch, start_iter = 0, 0
    if opts.continue_train:
        from ffrnet_tpu.checkpoint.store import restore_opt_state

        if opts.ckpt_backend == "orbax":
            from ffrnet_tpu.checkpoint.orbax_io import load_orbax

            payload = load_orbax(
                opts.ckpt_dir,
                None if opts.which_file == "latest"
                else int(opts.which_file))
            params, model_state = payload["params"], payload["model_state"]
            opt_leaves = payload["opt_leaves"]
            meta = {"epoch": int(payload["epoch"]),
                    "iter": int(payload["iter"])}
        else:
            params, model_state, opt_leaves, meta = load_checkpoint(
                opts.ckpt_dir, opts.which_file)
        tx_state = (state.opt_state if opt_leaves is None
                    else restore_opt_state(state.opt_state, opt_leaves))
        state = TrainState(params, model_state, tx_state,
                           jnp.asarray(meta["iter"], jnp.int32))
        start_epoch, start_iter = meta["epoch"], meta["iter"]
    elif opts.recnet_weights:
        payload = load_pth(opts.recnet_weights)
        sd = payload.get("RecNet", payload)
        params, model_state = recnet_from_torch(sd)
        state = TrainState(params, model_state, state.opt_state, state.step)

    mesh = make_mesh(n_data=opts.mesh_data or None, n_model=opts.mesh_model)
    validate_batch_for_mesh(mesh, opts.batch_size)
    if opts.cache_features:
        # Feature-cached mode: encode every (sample, flip) through the
        # frozen encoder ONCE, then train RecNet-only steps from the cache
        # (training/feature_cache.py). The reference re-runs the frozen
        # encoder every step (models/trainer.py:139-146).
        import copy as _copy

        from ffrnet_tpu.training.feature_cache import (
            CachedFeatureDataset, build_feature_cache)
        from ffrnet_tpu.training.trainer import (
            FEATURE_KEYS, make_distributed_feature_step)

        cache_dir = opts.feature_cache_dir or os.path.join(
            opts.ckpt_dir, "feature_cache")
        flip_prob = getattr(dataset, "flip_prob", 0.0)
        # shallow copy, not dataclasses.replace: replace() re-runs
        # __post_init__, re-reading and re-validating the entire img_list
        # just to zero one field (and requires a dataclass); the copy
        # shares the parsed items/caches, which are read-mostly
        if flip_prob:
            flipfree = _copy.copy(dataset)
            flipfree.flip_prob = 0.0
        else:
            flipfree = dataset
        if not isinstance(dataset, CasiaPairs):
            print("[warn] --cache_features with a non-CasiaPairs dataset: "
                  "the cache freezes ANY per-epoch augmentation beyond the "
                  "paired flip (e.g. SyntheticPairs noise is drawn once)",
                  file=sys.stderr)
        def build_encoder():
            # int8-static cache BUILD: the build is ONE frozen-encoder pass
            # over every (sample, flip). Measured (BASELINE.md round-4
            # "Int8 feature-cache BUILD"): through a relay-attached
            # device the pass is feature-download-bound (encode <1% of
            # the pass) and int8 is a WASH (0.998x); on directly-attached
            # hosts the encode share bounds the gain at the static-int8
            # encoder win (1.42-1.51x). The cached features
            # carry the int8 quantization error into every
            # RecNet-only epoch — same opt-in trade as the in-step
            # --int8_encoder path (convergence A/B, BASELINE.md enc_arms);
            # LFW eval keeps the float tree either way. Lazy for real
            # (review finding, round 5): build_feature_cache invokes this
            # factory only when a build is actually needed and only after
            # the builder lock exists, so a complete cache never pays the
            # minutes of eager calibration and multi-host waiters see a
            # heartbeat throughout. The fingerprint hashes the FLOAT tree
            # plus the variant tag below — calibration is deterministic
            # given (tree, dataset, dtype), so int8-built and float-built
            # caches still never collide.
            return prepare_int8_encoder(
                enc_params, enc_state, flipfree, cfg.compute_dtype)
        build_kw = dict(batch_size=opts.batch_size,
                        compute_dtype=cfg.compute_dtype,
                        num_threads=opts.n_thread,
                        encoder_factory=(build_encoder if opts.int8_encoder
                                         else None),
                        fingerprint_extra=("int8-static-v1"
                                           if opts.int8_encoder else ""))
        if jax.process_count() > 1:
            # one builder per shared cache_dir; waiters watch the builder's
            # per-batch lock heartbeat (feature_cache.lock_age_s). If
            # neither meta nor a live lock ever appears, cache_dir is
            # host-local storage -> build locally. A blind deadline here
            # would start a concurrent build into a SHARED dir and corrupt
            # the primary build (review finding, round 5); the lock now
            # pre-dates even the int8 calibration, so the grace window
            # only has to cover process skew + the fingerprint fetch.
            import time as _time

            from jax.experimental import multihost_utils

            from ffrnet_tpu.training.feature_cache import lock_age_s

            if jax.process_index() == 0:
                build_feature_cache(flipfree, enc_params, enc_state,
                                    cache_dir, **build_kw)
            else:
                meta_path = os.path.join(cache_dir, "meta.json")
                grace = _time.time() + float(os.environ.get(
                    "FFRNET_CACHE_GRACE_S", "300"))
                stale_s = float(os.environ.get(
                    "FFRNET_CACHE_STALE_S", "1800"))
                while not os.path.exists(meta_path):
                    age = lock_age_s(cache_dir)
                    if age is None and _time.time() > grace:
                        # no meta, no lock: host-local dir — build here
                        build_feature_cache(flipfree, enc_params, enc_state,
                                            cache_dir, **build_kw)
                        break
                    if age is not None and age > stale_s:
                        raise RuntimeError(
                            f"feature-cache build heartbeat in {cache_dir}"
                            f" is {age:.0f}s stale — the builder likely "
                            "crashed; remove building.lock (and any "
                            "partial .npy files) and restart")
                    _time.sleep(2.0)
            multihost_utils.sync_global_devices("ffrnet_feature_cache")
        else:
            build_feature_cache(flipfree, enc_params, enc_state, cache_dir,
                                **build_kw)
        dataset = CachedFeatureDataset(cache_dir, flip_prob=flip_prob)
        if opts.int8_encoder:
            print("[info] feature cache built with the int8-static "
                  "encoder (quantization error is baked into the cached "
                  "features for every epoch); no in-step encoder runs and "
                  "LFW eval stays float", file=sys.stderr)
        eval_enc = None
        fstep, state = make_distributed_feature_step(
            mesh, cfg, state, packed=bool(opts.pack_upload))
        # the encoder is out of the step but still serves every LFW eval:
        # place it once (host leaves in jitted-call args would re-upload
        # the full tree per eval batch through a relayed device)
        enc_params = jax.device_put(enc_params, replicated(mesh))
        enc_state = jax.device_put(enc_state, replicated(mesh))

        def step(_enc_p, _enc_s, st, batch):
            return fstep(st, batch)

        if opts.pack_upload:
            from ffrnet_tpu.training.trainer import (FEATURE_PACK,
                                                     PACKED_FEATURE_KEYS)

            batch_keys, batch_pack = list(PACKED_FEATURE_KEYS), FEATURE_PACK
        else:
            batch_keys, batch_pack = list(FEATURE_KEYS), None
    else:
        eval_enc = None
        if opts.int8_encoder:
            # LFW eval keeps the FLOAT encoder (accuracy-gated protocol);
            # only the in-step frozen forward runs int8
            eval_enc = (jax.device_put(enc_params, replicated(mesh)),
                        jax.device_put(enc_state, replicated(mesh)))
            enc_params, enc_state = prepare_int8_encoder(
                enc_params, enc_state, dataset, cfg.compute_dtype)
        step, (enc_params, enc_state, state) = make_distributed_step(
            mesh, cfg, enc_params, enc_state, state,
            packed=bool(opts.pack_upload))
        if opts.pack_upload:
            batch_keys = ["imgs", "label"]
            batch_pack = {"imgs": ("img_non", "img_ocl")}
        else:
            batch_keys, batch_pack = ["img_non", "img_ocl", "label"], None
    bshard = batch_sharding(mesh)

    last_orbax_step = [-1]

    def save_now(name: str, epoch: int, iteration: int) -> None:
        if (opts.ckpt_backend != "orbax" and jax.process_count() > 1
                and jax.process_index() != 0):
            # pth backend over a shared dir: one writer — N processes
            # writing the same file raced each other (round-5 review).
            # orbax coordinates multi-host saves itself, so every process
            # must participate there.
            return
        # slice TP class padding off before writing: checkpoints keep the
        # torch-compatible (num_classes, 512) classifier (models/recnet.py:248)
        ck = unpad_train_state_classes(state, cfg.recnet.num_classes)
        if opts.ckpt_backend == "orbax":
            # orbax steps subsume the latest/numbered split: each save is
            # the step number; retention keeps the save_freq multiples
            # (the reference's numbered cadence) plus the newest
            if iteration == last_orbax_step[0]:
                return  # same boundary hit both cadences this iter
            from ffrnet_tpu.checkpoint.orbax_io import (prune_orbax,
                                                        save_orbax)

            save_orbax(opts.ckpt_dir, iteration, {
                "params": ck.params, "model_state": ck.model_state,
                "opt_leaves": list(jax.tree.leaves(ck.opt_state)),
                "epoch": epoch, "iter": iteration})
            prune_orbax(opts.ckpt_dir, keep_every=opts.save_freq)
            last_orbax_step[0] = iteration
            return
        save_checkpoint(opts.ckpt_dir, name, params=ck.params,
                        model_state=ck.model_state, opt_state=ck.opt_state,
                        epoch=epoch, iteration=iteration)
    loader = BatchLoader(dataset, opts.batch_size, shuffle=not opts.debug,
                         drop_last=not opts.debug, seed=opts.seed,
                         num_threads=opts.n_thread,
                         sharding={k: bshard for k in batch_keys},
                         pack=batch_pack)

    logger.record_text("model_config", opts.config_string)
    cur_iters = start_iter
    total_iters = opts.total_epochs * len(loader)
    score_fn = make_pair_score_fn(cfg.recnet)

    # Per-iter metrics are recorded LAZILY: each step's device scalars are
    # queued and fetched in ONE device_get at the next print/save/eval
    # boundary. Through a relayed TPU a per-iteration float() sync costs a
    # ~50 ms RTT — more than the 39 ms step itself — so eager fetching
    # would halve real driver throughput; batching preserves every
    # per-iter scalar while amortizing the RTT over print_freq steps.
    pending: list = []

    def flush_metrics() -> None:
        """Fetch + log all queued metrics; runs the non-finite failure
        check over them. Called before every checkpoint write, eval, and
        preemption exit, so a poisoned step (the reference had no such
        guard; recovery = --continue_train 1) still never reaches a
        checkpoint."""
        if not pending:
            return
        fetched = jax.device_get([m for _, _, m in pending])
        queued, pending[:] = list(pending), []
        for (it, ep, _), m in zip(queued, fetched):
            logger.set_current_iter(it, ep)
            # RAW floats go to the scalar sinks (tensorboard/JSON) — a
            # 4-decimal pre-format would flatten late-training losses
            # below 5e-5 to exactly 0.0 in the recorded curves (review
            # finding, round 5); formatting is print-only. LR is recorded
            # as a scalar too, not just printed.
            values = {k: float(v) for k, v in m.items()}
            logger.record_scalar(values, "train_values")
            logger.print_scalar({k: f"{v:.4f}" for k, v in values.items()
                                 if k != "LR"})
            logger.print_scalar({"LR": f"{values['LR']:.6f}"})
            if not np.isfinite(float(m["TotalLoss"])):
                logger.close()
                raise FloatingPointError(
                    f"non-finite loss at iter {it} (epoch {ep}); "
                    f"restart with --continue_train 1 --which_file latest")
        # keep the fetch RTT out of the next iteration's DataTime bucket
        timer.update_time("Flush")

    # In-epoch resume fast-forward. Checkpoints store the GLOBAL iteration;
    # the batches already consumed within the resume epoch are
    # start_iter - start_epoch*len(loader). The reference compares the
    # per-epoch index i against the GLOBAL count (train.py:42), which for
    # any resume epoch >= 1 skips the ENTIRE epoch — silently dropping up
    # to len(loader) training batches. Fixed here (PARITY.md "Deliberate
    # behavior differences"). The skip happens inside the loader
    # (epoch(start_batch=...)): skipped batches are never decoded or
    # uploaded, and the per-(epoch, sample) RNG keeps the remaining
    # batches bitwise identical to an unskipped epoch.
    skip_in_epoch = min(max(start_iter - start_epoch * len(loader), 0),
                        len(loader))

    for epoch in range(start_epoch, opts.total_epochs):
        start_b = skip_in_epoch if epoch == start_epoch else 0
        for batch in loader.epoch(epoch, start_batch=start_b):
            cur_iters += 1
            timer.update_time("DataTime")

            state, metrics = step(enc_params, enc_state, state, batch)
            timer.update_time("Step")
            pending.append((cur_iters, epoch, metrics))

            if cur_iters % opts.print_freq == 0:
                flush_metrics()
                print(f"Model Configuration: {opts.save_weight_dir}")
                logger.print_iter_summary(total_iters, opts.total_epochs, timer)

            if cur_iters % opts.save_freq == 0:
                flush_metrics()
                name = "debug" if opts.debug else f"{cur_iters:07d}"
                save_now(name, epoch, cur_iters)
            if cur_iters % max(opts.save_freq // 10, 1) == 0:
                flush_metrics()
                save_now("latest", epoch, cur_iters)

            if guard.requested:
                flush_metrics()
                save_now("latest", epoch, cur_iters)
                print(f"[preempt] checkpointed at iter {cur_iters} "
                      f"(epoch {epoch}); resume with --continue_train 1 "
                      "--which_file latest", file=sys.stderr, flush=True)
                logger.close()
                return

            if opts.eval_freq and cur_iters % opts.eval_freq == 0 and opts.test_data:
                flush_metrics()
                rec = (state.params, state.model_state)
                enc = eval_enc or (enc_params, enc_state)
                # mid-train params are mesh-placed: eval batches must join
                # them on the SAME device set. Passing the mesh itself lets
                # make_eval_batches shard the batches over 'data' (full
                # replication would score the whole protocol redundantly
                # on every device) with a replicated fallback.
                eval_place = (None if jax.process_count() > 1 else mesh)
                for ocl in range(1 if opts.debug else 3):
                    acc_new, acc = eval_lfw(opts, enc, rec, ocl, cfg,
                                            score_fn, placement=eval_place)
                    logger.record_scalar({"acc": acc}, f"test_acc/ocl{ocl}")
                    logger.record_scalar({"acc_new": acc_new}, f"test_acc/ocl{ocl}")
                    print(f"test result ocl{ocl}: acc_new {acc_new:.4f} "
                          f"acc {acc:.4f}")
                if opts.visualize and jax.process_count() == 1:
                    log_attention_visual(opts, enc, rec, cfg, logger,
                                         cur_iters, placement=eval_place)
            if opts.debug:
                break
    flush_metrics()
    logger.close()


def test(opts: Options) -> None:
    logger = Logger(opts.log_dir, opts.save_weight_dir, phase="test")
    cfg = opts.trainer_config()
    enc_params, enc_state = load_encoder(opts)
    if opts.recnet_weights:
        payload = load_pth(opts.recnet_weights)
        params, model_state = recnet_from_torch(payload.get("RecNet", payload))
    else:
        params, model_state, _, _ = load_checkpoint(opts.ckpt_dir,
                                                    opts.which_file)
    # the torch converters return host-numpy trees; place them ONCE —
    # host leaves in jitted-call args re-upload the full ~170MB per eval
    # batch through a relayed device (CLAUDE.md; review finding, round 5)
    enc_params, enc_state = jax.device_put((enc_params, enc_state))
    params, model_state = jax.device_put((params, model_state))
    logger.set_current_iter(0, 0)
    score_fn = make_pair_score_fn(cfg.recnet)
    dump_dir = opts.ckpt_dir if opts.save_wrong else None
    for ocl in range(3):
        metrics = {} if opts.report_roc else None
        acc_new, acc = eval_lfw(opts, (enc_params, enc_state),
                                (params, model_state), ocl, cfg, score_fn,
                                dump_wrong_to=dump_dir, metrics_out=metrics)
        logger.record_scalar({"acc": acc}, f"test_acc/ocl{ocl}")
        logger.record_scalar({"acc_new": acc_new}, f"test_acc_new/ocl{ocl}")
        print(f"test result ocl{ocl}: acc_new {acc_new:.4f} acc {acc:.4f}")
        if metrics:
            for kind in ("new", "raw"):
                m = metrics[kind]
                logger.record_scalar(
                    {"eer": m["eer"], "auc": m["auc"],
                     **{f"tar@far{f:g}": t for f, t in m["tar@far"].items()}},
                    f"test_roc_{kind}/ocl{ocl}")
                tars = " ".join(f"tar@{f:g} {t:.4f}"
                                for f, t in sorted(m["tar@far"].items()))
                print(f"test roc ocl{ocl} [{kind}]: eer {m['eer']:.4f} "
                      f"auc {m['auc']:.4f} {tars}")
    logger.close()


def main(argv=None):
    opts = parse_args(argv)
    np.random.seed(opts.seed)
    maybe_init_distributed()
    if opts.phase == "train":
        train(opts)
    else:
        test(opts)


if __name__ == "__main__":
    main()
