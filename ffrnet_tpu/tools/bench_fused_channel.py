"""Same-session A/B: XLA factored RecNet vs the fused channel-branch
Pallas kernel (ops/pallas/channel_branch.py — the SURVEY §7 8a experiment).

Two in-situ duels (the only honest ones — isolated kernel duels mispredict
fusion effects, BASELINE.md round-2 lesson), interleaved in ONE process:

  1. recnet inference forward at each --batches size;
  2. the fused align->encode->rectify->score pipeline at --pipe_batch
     (the bench.py headline configuration).

Plus an isolated channel-branch duel (kernel vs the XLA factored branch
alone) so the fusion-boundary cost is attributable. Adopt or record the
measured rejection in BASELINE.md next to the ss-only one.

    python -m ffrnet_tpu.tools.bench_fused_channel [--batches 256,1024]

Reference math being accelerated: models/recnet.py:372-386,406,409 (the
channel attention + rectification matmul).
"""

from __future__ import annotations

import argparse
import json
import sys
from functools import partial


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=str, default="256,1024")
    p.add_argument("--pipe_batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["fp32", "bf16"])
    p.add_argument("--skip_pipeline", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ffrnet_tpu.models import irse, recnet
    from ffrnet_tpu.models.recnet import RecNetConfig
    from ffrnet_tpu.ops.nn import tree_cast_floats
    from ffrnet_tpu.ops.pallas.channel_branch import (_reference,
                                                      channel_branch_pallas)
    from ffrnet_tpu.tools.timing import time_op

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    batches = [int(b) for b in args.batches.split(",")]

    cfg_x = RecNetConfig()
    cfg_p = RecNetConfig(channel_impl="pallas_fused")
    rec_p, rec_s = recnet.init(jax.random.PRNGKey(1), cfg_x)
    rec_p, rec_s = tree_cast_floats((rec_p, rec_s), dtype)
    rec_p, rec_s = jax.device_put((rec_p, rec_s))

    out = {"tool": "bench_fused_channel", "dtype": args.dtype,
           "per_batch": {}}
    rng = np.random.default_rng(0)

    for b in batches:
        fm = jax.device_put(jnp.asarray(
            rng.standard_normal((b, 7, 7, 512)), dtype))
        flat = jax.device_put(jnp.asarray(
            rng.standard_normal((b, 512, 49)), dtype))

        def rec_fwd(cfg, x):
            (v, _), _ = recnet.apply(rec_p, rec_s, x, cfg=cfg, training=False)
            return v

        f_xla = partial(rec_fwd, cfg_x)
        f_pal = partial(rec_fwd, cfg_p)
        # numeric agreement first (one fetch each)
        v_x = np.asarray(jax.jit(f_xla)(fm), np.float32)
        v_p = np.asarray(jax.jit(f_pal)(fm), np.float32)
        denom = np.maximum(np.abs(v_x).max(), 1e-9)
        rec_err = float(np.abs(v_x - v_p).max() / denom)

        # isolated channel-branch duel (attributes any in-situ delta);
        # custom_vjp functions reject keyword args -> lambdas, not partial
        c_xla = (lambda x: _reference(x, rec_p["conv4channel"]))
        c_pal = (lambda x: channel_branch_pallas(x, rec_p["conv4channel"]))

        ms = {"recnet_xla": [], "recnet_pallas": [],
              "branch_xla": [], "branch_pallas": []}
        for _ in range(args.rounds):
            ms["recnet_xla"].append(time_op(f_xla, fm, iters=args.iters))
            ms["recnet_pallas"].append(time_op(f_pal, fm, iters=args.iters))
            ms["branch_xla"].append(time_op(c_xla, flat, iters=args.iters))
            ms["branch_pallas"].append(time_op(c_pal, flat, iters=args.iters))
        # drop glitched rounds (time_op returns 0.0 when the relay slope
        # stayed non-positive through its retries)
        rec_ = {k: round(min([x for x in v if x > 0.0] or [0.0]), 3)
                for k, v in ms.items()}
        rec_["recnet_speedup"] = round(
            rec_["recnet_xla"] / max(rec_["recnet_pallas"], 1e-9), 3)
        rec_["branch_speedup"] = round(
            rec_["branch_xla"] / max(rec_["branch_pallas"], 1e-9), 3)
        rec_["max_rel_err"] = rec_err
        out["per_batch"][str(b)] = rec_
        print(f"[bench_fused_channel] batch {b}: {rec_}", file=sys.stderr,
              flush=True)

    if not args.skip_pipeline:
        # full-pipeline in-situ duel at the headline configuration
        from ffrnet_tpu.eval.lfw import pair_cosine
        from ffrnet_tpu.models.optimize import fold_backbone_bn
        from ffrnet_tpu.ops.align import (ARCFACE_REF_PTS, auto_warp_config,
                                          cv2_transform, warp_affine_tiled)

        b = args.pipe_batch
        enc_p, enc_s = irse.init(jax.random.PRNGKey(0))
        enc_p, enc_s = fold_backbone_bn(enc_p, enc_s)
        enc_p, enc_s = tree_cast_floats((enc_p, enc_s), dtype)
        enc_p, enc_s = jax.device_put((enc_p, enc_s))
        raw = jax.device_put(jnp.asarray(
            rng.uniform(0, 255, (b, 250, 250, 3)), dtype))
        lmk_host = (ARCFACE_REF_PTS[None] * 2.1
                    + rng.normal(0, 2, (b, 5, 2)) + 15).astype(np.float32)
        lmk = jax.device_put(jnp.asarray(lmk_host))
        wcfg = auto_warp_config(lmk_host, ARCFACE_REF_PTS, (250, 250),
                                (112, 112))

        def pipe(cfg, raw_in, lmk_in):
            ref = jnp.broadcast_to(jnp.asarray(ARCFACE_REF_PTS), lmk_in.shape)
            mats = cv2_transform(lmk_in, ref)
            al = warp_affine_tiled(raw_in, mats, out_hw=(112, 112),
                                   tile=wcfg[0], crop=wcfg[1])
            x = (al.astype(dtype) / 127.5) - 1.0
            featmap, _, _ = irse.apply(enc_p, enc_s, x, training=False)
            (v, _), _ = recnet.apply(rec_p, rec_s, featmap, cfg=cfg,
                                     training=False)
            return pair_cosine(v[0::2].astype(jnp.float32),
                               v[1::2].astype(jnp.float32))

        p_xla = (lambda r: pipe(cfg_x, r, lmk))  # time_op drives one input
        p_pal = (lambda r: pipe(cfg_p, r, lmk))
        ms_x, ms_p = [], []
        for _ in range(args.rounds):
            ms_x.append(time_op(p_xla, raw, iters=args.iters))
            ms_p.append(time_op(p_pal, raw, iters=args.iters))
        best_x, best_p = min(ms_x), min(ms_p)
        out["pipeline"] = {
            "batch": b,
            "pipeline_ms_xla": round(best_x, 3),
            "pipeline_ms_pallas": round(best_p, 3),
            "faces_per_sec_xla": round(b / (best_x / 1e3), 1),
            "faces_per_sec_pallas": round(b / (best_p / 1e3), 1),
            "speedup": round(best_x / max(best_p, 1e-9), 3),
            "rounds_ms_xla": [round(v, 3) for v in ms_x],
            "rounds_ms_pallas": [round(v, 3) for v in ms_p],
        }
        print(f"[bench_fused_channel] pipeline: {out['pipeline']}",
              file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
