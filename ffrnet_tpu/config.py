"""Experiment configuration: reference-compatible flag surface.

Replaces the reference's two-tier run.py + argparse system
(run.py:41-63, utils/options.py:13-132) with one dataclass + argparse
front-end that keeps the same public flags (--phase/--batch_size/
--loss_weight/--optimizer/--lr/...). Derived fields (run dirs, config
string dump) follow the reference's `save_weight_dir` naming
(utils/options.py:112-131). The GPU-picking side effects
(utils/options.py:81-95) have no TPU analog and are dropped.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

from ffrnet_tpu.models.recnet import RecNetConfig
from ffrnet_tpu.training.trainer import TrainerConfig


@dataclass
class Options:
    # phase / debug
    phase: str = "train"
    debug: int = 0
    # data
    dataset: str = "CASIA"
    train_data: str = ""
    train_img_list: str = ""
    val_data: str = ""
    test_data: str = ""           # LFW root (aligned + masked twins)
    test_pair_list: str = ""      # lfw_pairs.txt
    weight_root: str = "./weight"
    # model
    model_name: str = "FFR-Net"
    num_classes: int = 10575
    ss_impl: str = "xla"          # self-similarity implementation: xla|pallas
    compute_dtype: str = "fp32"   # fp32 | bf16 (mixed-precision training)
    remat: int = 0                # rematerialize RecNet branches in backward
    # loss
    loss_weight: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    loss: str = "sphere"
    faithful_ce_weight: int = 1
    # The reference applies a random paired hflip to EVAL pairs too
    # (data/dataset.py:148-151 via LFWData), making reported accuracy
    # seed-dependent. Default 0 = deterministic eval; set 1 to replicate.
    faithful_eval_flip: int = 0
    # optimizer
    optimizer: str = "Adam"
    lr: float = 1e-2
    beta1: float = 0.5
    beta2: float = 0.999
    weight_decay: float = 5e-4
    momentum: float = 0.9
    nesterov: int = 0
    # Feature-cached training: 1 = precompute the frozen encoder's outputs
    # for every (sample, flip) once (training/feature_cache.py), then run
    # RecNet-only steps (train_step_from_features) at ~3x the step
    # throughput. Exact for datasets whose only augmentation is the paired
    # flip (CASIA); the cache lives under --feature_cache_dir (default
    # <ckpt_dir>/feature_cache).
    cache_features: int = 0
    feature_cache_dir: str = ""
    # Pack both image (or feature) streams of each batch into ONE
    # (N, 2, ...) device buffer; unpacking happens inside the step.
    # Default OFF: a serialized put-then-fetch microbench favors one
    # buffer 3.5-6x (per-buffer fixed costs), but in the real loop the
    # producer-thread uploads already overlap the step and packing
    # measured ~40% SLOWER (same-session A/B x3, BASELINE.md). Kept as an
    # option for fabrics where per-buffer costs dominate end-to-end.
    pack_upload: int = 0
    # Where image batches are normalized to [-1, 1]: 0 (default) ships
    # uint8 pixels and normalizes on device (identical values, 4x fewer
    # host->device bytes — the measured driver bottleneck on relayed
    # hosts); 1 = reference-style float32 host normalization.
    host_normalize: int = 0
    # Opt-in: run the FROZEN encoder inside the train step as int8
    # (fold BN -> int8 weights -> static activation scales calibrated on
    # the first training images). Measured 1.216x full-step throughput at
    # batch 128 bf16, embed cosine >=0.9993 (BASELINE.md enc_arms duel).
    # Gradients never touch the encoder, so backward math is unchanged;
    # LFW eval keeps the float encoder. Ignored with --cache_features
    # (no in-step encoder there). Startup pays one eager host-CPU
    # calibration pass (~minutes on slow hosts).
    int8_encoder: int = 0
    # train
    seed: int = 123
    n_thread: int = 8
    batch_size: int = 64
    total_epochs: int = 10
    continue_train: int = 0
    ckpt_backend: str = "pth"     # 'pth' = torch-compatible .pth.gzip store
    # (checkpoint/store.py); 'orbax' = async/atomic per-shard orbax saves
    # (checkpoint/orbax_io.py) for large-scale runs — steps replace the
    # latest/numbered split, pruned to the save_freq multiples + newest
    save_freq: int = 2000
    print_freq: int = 10
    eval_freq: int = 100
    report_roc: int = 0           # test phase: also report exact-ROC
    # operating points per ocl level (TAR@FAR 1e-3/1e-2/1e-1, EER, AUC) for
    # raw + rectified embeddings — framework extra; the reference reports
    # 10-fold accuracy only (lfw/lfw_eval.py:272-287)
    visualize: int = 0            # log the M_space/M_channel attention
    # panel (eval/visualize.py) for the first ocl-1 eval batch at each eval
    # boundary: TensorBoard image + PNG under ckpt_dir/visuals. Makes the
    # reference's dead visualize() (lfw/lfw_eval.py:164-223 — defined,
    # never called) a live capability
    # parallelism
    mesh_data: int = 0            # 0 = all devices / mesh_model
    mesh_model: int = 1
    # test / misc
    test_result_dir: str = "./test_result"
    save_wrong: int = 0           # test phase: dump misclassified pairs
    # (wrong_images{,_new}/ under ckpt_dir — the reference's save_wrong_imgs
    # hook, lfw/lfw_eval.py:120-135, which its call sites never enabled)
    which_file: str = "latest"
    other: str = ""
    encoder_weights: str = "./pretrain/se50.pth"
    recnet_weights: str = ""      # optional FFRNet.pth(.gzip) import

    # derived (filled by finalize)
    save_weight_dir: str = ""
    ckpt_dir: str = ""
    log_dir: str = ""
    config_string: str = ""

    def finalize(self, make_dirs: bool = True) -> "Options":
        self.save_weight_dir = "model_{}-loss_{}-{}".format(
            self.model_name, self.loss, self.other)
        self.ckpt_dir = os.path.join(self.weight_root, self.save_weight_dir)
        self.log_dir = os.path.join(self.weight_root, "log_dir")
        if make_dirs:
            for d in (self.ckpt_dir, self.log_dir,
                      os.path.join(self.ckpt_dir, "visuals"),
                      os.path.join(self.ckpt_dir, "test"),
                      os.path.join(self.ckpt_dir, "val")):
                os.makedirs(d, exist_ok=True)
        lines = ["------------ Options -------------"]
        for f_ in sorted(dataclasses.fields(self), key=lambda f_: f_.name):
            lines.append(f"{f_.name}: {getattr(self, f_.name)}")
        lines.append("-------------- End ----------------")
        self.config_string = "\n".join(lines)
        if make_dirs:
            with open(os.path.join(self.ckpt_dir, "opt.txt"), "w") as fh:
                fh.write(self.config_string + "\n")
        return self

    def trainer_config(self) -> TrainerConfig:
        return TrainerConfig(
            optimizer=self.optimizer.lower(),
            lr=self.lr,
            beta1=self.beta1,
            beta2=self.beta2,
            momentum=self.momentum,
            weight_decay=self.weight_decay,
            nesterov=bool(self.nesterov),
            loss_weight=tuple(self.loss_weight),
            faithful_ce_weight=bool(self.faithful_ce_weight),
            compute_dtype=self.compute_dtype,
            remat=bool(self.remat),
            recnet=RecNetConfig(num_classes=self.num_classes,
                                ss_impl=self.ss_impl),
        )


def parse_args(argv: Optional[List[str]] = None, *, make_dirs: bool = True) -> Options:
    """argparse front-end exposing the reference's public flags."""
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    defaults = Options()
    p.add_argument("--phase", type=str, default=defaults.phase)
    p.add_argument("--debug", type=int, default=defaults.debug)
    p.add_argument("--dataset", type=str, default=defaults.dataset)
    p.add_argument("--train_data", type=str, default=defaults.train_data)
    p.add_argument("--train_img_list", type=str, default=defaults.train_img_list)
    p.add_argument("--val_data", type=str, default=defaults.val_data)
    p.add_argument("--test_data", type=str, default=defaults.test_data)
    p.add_argument("--test_pair_list", type=str, default=defaults.test_pair_list)
    p.add_argument("--weight_root", type=str, default=defaults.weight_root)
    p.add_argument("--model_name", type=str, default=defaults.model_name)
    p.add_argument("--num_classes", type=int, default=defaults.num_classes)
    p.add_argument("--ss_impl", type=str, default=defaults.ss_impl)
    p.add_argument("--compute_dtype", type=str, default=defaults.compute_dtype,
                   choices=["fp32", "bf16"])
    p.add_argument("--remat", type=int, default=defaults.remat)
    p.add_argument("--loss_weight", type=float, nargs=4,
                   default=list(defaults.loss_weight))
    p.add_argument("--loss", type=str, default=defaults.loss)
    p.add_argument("--faithful_ce_weight", type=int,
                   default=defaults.faithful_ce_weight)
    p.add_argument("--faithful_eval_flip", type=int,
                   default=defaults.faithful_eval_flip)
    p.add_argument("--host_normalize", type=int,
                   default=defaults.host_normalize)
    p.add_argument("--int8_encoder", type=int,
                   default=defaults.int8_encoder)
    p.add_argument("--cache_features", type=int,
                   default=defaults.cache_features)
    p.add_argument("--pack_upload", type=int, default=defaults.pack_upload)
    p.add_argument("--feature_cache_dir", type=str,
                   default=defaults.feature_cache_dir)
    p.add_argument("--optimizer", type=str, default=defaults.optimizer)
    p.add_argument("--lr", type=float, default=defaults.lr)
    p.add_argument("--beta1", type=float, default=defaults.beta1)
    p.add_argument("--beta2", type=float, default=defaults.beta2)
    p.add_argument("--weight_decay", type=float, default=defaults.weight_decay)
    p.add_argument("--momentum", type=float, default=defaults.momentum)
    p.add_argument("--nesterov", type=int, default=defaults.nesterov)
    p.add_argument("--seed", type=int, default=defaults.seed)
    p.add_argument("--nThread", dest="n_thread", type=int, default=defaults.n_thread)
    p.add_argument("--batch_size", type=int, default=defaults.batch_size)
    p.add_argument("--total_epochs", type=int, default=defaults.total_epochs)
    p.add_argument("--continue_train", type=int, default=defaults.continue_train)
    p.add_argument("--ckpt_backend", type=str,
                   default=defaults.ckpt_backend, choices=["pth", "orbax"])
    p.add_argument("--save_freq", type=int, default=defaults.save_freq)
    p.add_argument("--print_freq", type=int, default=defaults.print_freq)
    p.add_argument("--eval_freq", type=int, default=defaults.eval_freq)
    p.add_argument("--report_roc", type=int, default=defaults.report_roc)
    p.add_argument("--visualize", type=int, default=defaults.visualize)
    p.add_argument("--mesh_data", type=int, default=defaults.mesh_data)
    p.add_argument("--mesh_model", type=int, default=defaults.mesh_model)
    p.add_argument("--test_result_dir", type=str, default=defaults.test_result_dir)
    p.add_argument("--save_wrong", type=int, default=defaults.save_wrong)
    p.add_argument("--which_file", type=str, default=defaults.which_file)
    p.add_argument("--other", type=str, default=defaults.other)
    p.add_argument("--encoder_weights", type=str, default=defaults.encoder_weights)
    p.add_argument("--recnet_weights", type=str, default=defaults.recnet_weights)
    ns = p.parse_args(argv)
    opts = Options(**{k: (tuple(v) if k == "loss_weight" else v)
                      for k, v in vars(ns).items()})
    return opts.finalize(make_dirs=make_dirs)
