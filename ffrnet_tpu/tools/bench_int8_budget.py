"""Int8 accuracy-budget table for the checkpoint-parity gate.

The BASELINE.json acceptance for the (still-absent) released checkpoints
is "within 0.1% of FFRNet.pth" (tools/parity_check.py). BENCH_r03's int8
eval arm measured a raw-protocol delta of exactly that bound on ONE seed
of random weights — so before real weights land, this tool pre-builds
the budget ALLOCATION (VERDICT r3 weak #6 / next #6): full 10-fold
verification-protocol deltas (eval/lfw.py fold sweep — the same code the
LFW evaluator runs, lfw/lfw_eval.py:110-160 of /root/reference),

  across >=3 seeds            (encoder init / RecNet init / data),
  margins {0.75, 1.0}         (x_scale = margin * amax / 127),
  split by quantized tree     (encoder-only / recnet-only / all),

on a TRAINED RecNet (a few hundred train steps on device-synthetic
identities) so the rectified branch measures real signal, not a random
projection. Pairs are ocl-1 (img1 clean, img2 masked), where the
rectified path matters most.

    python -m ffrnet_tpu.tools.bench_int8_budget [--seeds 3] [--train_steps 200]

Writes docs/int8_budget.json; the summary table goes into BASELINE.md
"Int8 accuracy budget".
"""

from __future__ import annotations

import argparse
import copy
import functools
import json
import os
import sys
import time

import numpy as np

from ffrnet_tpu.tools.synth import make_batch_fn, make_eval_pairs


def _with_margin(cal_tree, margin: float):
    """Rescale baked x_scales (amaxes are margin-independent, so one
    calibration pass serves the whole margin sweep)."""
    import jax.numpy as jnp

    from ffrnet_tpu.models.quantize import quantized_leaf_items

    out = copy.deepcopy(cal_tree)
    for _, leaf in quantized_leaf_items(out):
        leaf["x_scale"] = jnp.float32(float(leaf["x_scale"]) * margin)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--train_steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--num_classes", type=int, default=128)
    p.add_argument("--noise", type=float, default=0.25)
    p.add_argument("--eval_pairs", type=int, default=600)
    p.add_argument("--margins", type=str, default="0.75,1.0")
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["fp32", "bf16"])
    p.add_argument("--cal_images", type=int, default=8)
    p.add_argument("--out", type=str, default="docs/int8_budget.json")
    args = p.parse_args(argv)
    margins = [float(m) for m in args.margins.split(",")]

    import jax
    import jax.numpy as jnp

    from ffrnet_tpu.data.datasets import SyntheticPairs
    from ffrnet_tpu.eval.runner import evaluate_pairs, make_pair_score_fn
    from ffrnet_tpu.models import irse
    from ffrnet_tpu.models.optimize import fold_backbone_bn
    from ffrnet_tpu.models.quantize import (
        calibrate_activation_scales, calibrate_recnet_activation_scales,
        quantize_encoder_params, quantize_recnet_params)
    from ffrnet_tpu.models.recnet import RecNetConfig
    from ffrnet_tpu.ops.nn import tree_cast_floats
    from ffrnet_tpu.training.trainer import (TrainerConfig,
                                             create_train_state, train_step)

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    n_ids = args.num_classes
    cfg = TrainerConfig(optimizer="adam", lr=1e-3,
                        compute_dtype=args.dtype,
                        recnet=RecNetConfig(num_classes=n_ids))
    score = make_pair_score_fn(cfg.recnet)
    t_start = time.perf_counter()
    rows = []

    for s in range(args.seeds):
        ds = SyntheticPairs(num_identities=n_ids, samples_per_id=4,
                            seed=7 + s, noise=args.noise)
        templates = jax.device_put(jnp.asarray(ds.templates))
        make_batch = make_batch_fn(templates, args.batch, n_ids, args.noise)
        img1, img2, lab = make_eval_pairs(
            templates, jax.random.PRNGKey(1000 + s), args.eval_pairs,
            n_ids, args.noise)
        # evaluate_pairs batches (device-resident: zero re-upload); images
        # cast to the compute dtype — every tree below (folded float
        # reference included) is tree_cast_floats to `dtype`
        bs = 200
        batches = [{"img1": img1[i:i + bs].astype(dtype),
                    "img2": img2[i:i + bs].astype(dtype),
                    "label": lab[i:i + bs]}
                   for i in range(0, args.eval_pairs, bs)]

        enc_p, enc_s = irse.init(jax.random.PRNGKey(s))
        # trained RecNet so the rectified branch measures signal
        jstep = jax.jit(functools.partial(train_step, cfg=cfg))
        st = create_train_state(jax.random.PRNGKey(100 + s), cfg)
        for step in range(1, args.train_steps + 1):
            st, m = jstep(enc_p, enc_s, st,
                          make_batch(jax.random.PRNGKey(step)))
        m = jax.device_get(m)
        print(f"[seed {s}] trained {args.train_steps} steps: "
              f"TrainAcc {float(m['TrainAcc']):.3f}", file=sys.stderr,
              flush=True)

        # float reference arm: the folded+cast serving tree (the tree the
        # int8 path quantizes — deltas isolate QUANTIZATION error alone)
        fp, fs = fold_backbone_bn(enc_p, enc_s)
        fp, fs = tree_cast_floats((fp, fs), dtype)
        rec_p, rec_s = tree_cast_floats((st.params, st.model_state), dtype)

        # calibrate once per seed on host CPU (eager); margin sweep
        # rescales the baked scales
        xcal = np.stack([np.asarray(ds.get(i, np.random.default_rng(0))
                                    ["img_non"])
                         for i in range(args.cal_images)])
        cpu = jax.devices("cpu")[0]
        host_q, host_s = jax.device_get((quantize_encoder_params(fp), fs))
        host_qr, host_rs = jax.device_get(
            (quantize_recnet_params(rec_p), rec_s))
        fms = []
        t0 = time.perf_counter()
        with jax.default_device(cpu):
            cal_enc = calibrate_activation_scales(
                jax.tree.map(jnp.asarray, host_q),
                jax.tree.map(jnp.asarray, host_s),
                [jnp.asarray(xcal, dtype)], capture_featmaps=fms)
            cal_rec = calibrate_recnet_activation_scales(
                jax.tree.map(jnp.asarray, host_qr),
                jax.tree.map(jnp.asarray, host_rs),
                [jnp.asarray(f, dtype) for f in fms], cfg=cfg.recnet)
        cal_s = time.perf_counter() - t0
        print(f"[seed {s}] calibrated enc+recnet in {cal_s:.0f}s",
              file=sys.stderr, flush=True)
        cal_enc, cal_rec = jax.device_get((cal_enc, cal_rec))

        def acc(ep, rp):
            res_new, res_raw = evaluate_pairs(
                jax.device_put(jax.tree.map(jnp.asarray, ep)), fs,
                jax.device_put(jax.tree.map(jnp.asarray, rp)), rec_s,
                batches, cfg.recnet, score_fn=score)
            return (float(res_new.mean_accuracy),
                    float(res_raw.mean_accuracy))

        f_rect, f_raw = acc(jax.device_get(fp), jax.device_get(rec_p))
        print(f"[seed {s}] float: rect {f_rect:.4f} raw {f_raw:.4f}",
              file=sys.stderr, flush=True)
        for margin in margins:
            enc_m = _with_margin(cal_enc, margin)
            rec_m = _with_margin(cal_rec, margin)
            for split, (ep, rp) in {
                    "enc_only": (enc_m, jax.device_get(rec_p)),
                    "recnet_only": (jax.device_get(fp), rec_m),
                    "all": (enc_m, rec_m)}.items():
                q_rect, q_raw = acc(ep, rp)
                rows.append({
                    "seed": s, "margin": margin, "split": split,
                    "float_rect": round(f_rect, 4),
                    "float_raw": round(f_raw, 4),
                    "int8_rect": round(q_rect, 4),
                    "int8_raw": round(q_raw, 4),
                    "d_rect": round(q_rect - f_rect, 4),
                    "d_raw": round(q_raw - f_raw, 4),
                })
                print(f"[seed {s}] m={margin} {split}: "
                      f"d_rect {rows[-1]['d_rect']:+.4f} "
                      f"d_raw {rows[-1]['d_raw']:+.4f}",
                      file=sys.stderr, flush=True)

    # allocation summary: worst |delta| per (margin, split) across seeds
    summary = {}
    for margin in margins:
        for split in ("enc_only", "recnet_only", "all"):
            sel = [r for r in rows
                   if r["margin"] == margin and r["split"] == split]
            summary[f"m{margin}/{split}"] = {
                "worst_abs_d_rect": max(abs(r["d_rect"]) for r in sel),
                "worst_abs_d_raw": max(abs(r["d_raw"]) for r in sel),
                "mean_d_rect": round(float(np.mean(
                    [r["d_rect"] for r in sel])), 4),
                "mean_d_raw": round(float(np.mean(
                    [r["d_raw"] for r in sel])), 4),
            }
    out = {
        "tool": "bench_int8_budget",
        "config": {"seeds": args.seeds, "train_steps": args.train_steps,
                   "num_classes": n_ids, "noise": args.noise,
                   "eval_pairs": args.eval_pairs, "dtype": args.dtype,
                   "margins": margins, "protocol": "10-fold sweep, ocl-1 "
                   "pairs, trained RecNet, folded float reference"},
        "rows": rows,
        "summary": summary,
        "wall_s": round(time.perf_counter() - t_start, 1),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"tool": out["tool"], "summary": summary,
                      "wall_s": out["wall_s"]}))
    return out


if __name__ == "__main__":
    main()
