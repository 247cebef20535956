"""Same-session duel: does int8-quantizing RecNet's conv chains pay?

Two interleaved duels in ONE process (the only comparable methodology on
this relay, CLAUDE.md):

  1. isolated RecNet forward at --batch: bf16 vs dynamic-int8 vs
     calibrated-static-int8 (models/quantize.py::quantize_recnet_params),
     with held-out rectified-embedding cosines vs the bf16 arm;
  2. in-situ fused align->encode->rectify->score pipeline at the bench.py
     headline configuration, arms: static-int8 encoder + bf16 RecNet (the
     current opt-in champion, BASELINE.md numbers-of-record) vs
     static-int8 encoder + static-int8 RecNet.

RecNet calibration feature maps come from the float encoder run JITTED ON
DEVICE (featmaps are cheap to fetch; the eager host-CPU pass is only
needed for the recnet-tree walk itself, which is tiny). Encoder static
scales come from the in-repo cache (tools/int8_cache.py — same scales
bench.py serves).

    python -m ffrnet_tpu.tools.bench_int8_recnet [--batch 256]

Adopt or record the measured rejection in BASELINE.md. Reference
capability being beaten: the fp32 CUDA RecNet, models/recnet.py:347-429
(no quantized path exists there).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from functools import partial


def _cos(a, b):
    import numpy as np

    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    c = (a * b).sum(1) / np.maximum(
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1), 1e-12)
    return round(float(c.mean()), 5), round(float(c.min()), 5)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["fp32", "bf16"])
    p.add_argument("--cal_batch", type=int, default=8)
    p.add_argument("--skip_pipeline", action="store_true")
    p.add_argument("--pipeline_batches", type=str, default="",
                   help="comma-separated pipeline batch sizes (default: "
                        "--batch); all run in one process so per-face "
                        "rates are comparable across sizes")
    args = p.parse_args(argv)
    args.pipeline_batches = ([int(x) for x in
                              args.pipeline_batches.split(",")]
                             if args.pipeline_batches else None)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ffrnet_tpu.eval.lfw import pair_cosine
    from ffrnet_tpu.models import irse, recnet
    from ffrnet_tpu.models.optimize import fold_backbone_bn
    from ffrnet_tpu.models.quantize import (quantize_encoder_params,
                                            quantize_recnet_params)
    from ffrnet_tpu.ops.align import (ARCFACE_REF_PTS, auto_warp_config,
                                      cv2_transform, warp_affine_tiled)
    from ffrnet_tpu.ops.nn import tree_cast_floats
    from ffrnet_tpu.tools.int8_cache import (default_cache_file,
                                             encoder_cache_key,
                                             recnet_cache_key,
                                             static_encoder_tree,
                                             static_recnet_tree)
    from ffrnet_tpu.tools.timing import time_op

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    b = args.batch
    out = {"tool": "bench_int8_recnet", "dtype": args.dtype, "batch": b}

    enc_p, enc_s = irse.init(jax.random.PRNGKey(0))
    enc_p, enc_s = fold_backbone_bn(enc_p, enc_s)
    enc_p, enc_s = tree_cast_floats((enc_p, enc_s), dtype)
    enc_p, enc_s = jax.device_put((enc_p, enc_s))
    rec_p, rec_s = recnet.init(jax.random.PRNGKey(1))
    rec_p, rec_s = tree_cast_floats((rec_p, rec_s), dtype)
    rec_p, rec_s = jax.device_put((rec_p, rec_s))
    cfg = recnet.RecNetConfig()

    # --- calibrate the int8 RecNet -----------------------------------------
    # featmaps from the jitted float encoder ON DEVICE (fast), then the
    # cheap eager recnet-only calibration on host CPU — via the shared
    # in-repo scale cache (tools/int8_cache.py; same scales bench.py's
    # int8_recnet_pipeline arm serves). Calibration data (seed 2, same
    # convention as the encoder cache) is disjoint from every eval input
    # below (seeds 0/1) -> the cosines are held-out.
    qrec = jax.device_put(quantize_recnet_params(rec_p))
    enc_fwd = jax.jit(
        lambda x: irse.apply(enc_p, enc_s, x, training=False)[0])
    srec, rec_status = static_recnet_tree(
        qrec, rec_s, enc_fwd, dtype, cfg=cfg, cal_batch=args.cal_batch,
        cache_file=default_cache_file(),
        cache_key=recnet_cache_key(
            fold_bn=os.environ.get("FFRNET_BENCH_FOLD_BN", "1"),
            dtype_name=args.dtype, cal_batch=args.cal_batch))
    out["recnet_scales_cache"] = rec_status

    # --- duel 1: isolated RecNet forward ------------------------------------
    rng = np.random.default_rng(0)
    fm_eval = enc_fwd(jnp.asarray(
        rng.uniform(-1.0, 1.0, (b, 112, 112, 3)), dtype))  # held-out, real
    # featmap statistics (not gaussian noise) so activation ranges are honest

    def rec_fwd(rp, fm):
        (v, _), _ = recnet.apply(rp, rec_s, fm, cfg=cfg, training=False)
        return v

    arms = {"bf16": partial(rec_fwd, rec_p),
            "dynamic": partial(rec_fwd, qrec),
            "static": partial(rec_fwd, srec)}
    v_ref = np.asarray(jax.jit(arms["bf16"])(fm_eval), np.float32)
    iso = {}
    for k in ("dynamic", "static"):
        iso[f"cos_mean_{k}"], iso[f"cos_min_{k}"] = _cos(
            v_ref, jax.jit(arms[k])(fm_eval))
    ms = {k: [] for k in arms}
    for _ in range(args.rounds):
        for k, f in arms.items():
            ms[k].append(time_op(f, fm_eval, iters=args.iters))
    for k, v in ms.items():
        pos = [x for x in v if x > 0.0]
        iso[f"recnet_ms_{k}"] = round(min(pos), 3) if pos else 0.0
    for k in ("dynamic", "static"):
        iso[f"speedup_{k}"] = round(
            iso["recnet_ms_bf16"] / max(iso[f"recnet_ms_{k}"], 1e-9), 3)
    out["isolated"] = iso
    print(f"[bench_int8_recnet] isolated: {iso}", file=sys.stderr, flush=True)

    # --- duel 2: in-situ fused pipeline -------------------------------------
    # Per --pipeline_batches entry (default: --batch), interleaved bf16- vs
    # int8-RecNet arms on top of the static-int8 encoder. Batches run in ONE
    # process, so per-face rates ARE comparable across batch sizes (the
    # bf16 pipeline's own sweep pinned 256; int8 scales differently —
    # static encoder holds 1.42x at 512 where dynamic collapsed).
    if not args.skip_pipeline:
        senc, status = static_encoder_tree(
            jax.device_put(quantize_encoder_params(enc_p)), enc_s, dtype,
            cache_file=default_cache_file(),
            cache_key=encoder_cache_key(
                fold_bn=os.environ.get("FFRNET_BENCH_FOLD_BN", "1"),
                dtype_name=args.dtype))
        out["enc_scales_cache"] = status
        out["pipeline"] = {}

        for pb in (args.pipeline_batches or [b]):
            raw = jax.device_put(jnp.asarray(
                rng.uniform(0, 255, (pb, 250, 250, 3)), dtype))
            lmk_host = (ARCFACE_REF_PTS[None] * 2.1
                        + rng.normal(0, 2, (pb, 5, 2)) + 15).astype(
                            np.float32)
            lmk = jax.device_put(jnp.asarray(lmk_host))
            wcfg = auto_warp_config(lmk_host, ARCFACE_REF_PTS, (250, 250),
                                    (112, 112))

            def pipe(rp, raw_in, lmk=lmk, wcfg=wcfg):
                ref = jnp.broadcast_to(jnp.asarray(ARCFACE_REF_PTS),
                                       lmk.shape)
                mats = cv2_transform(lmk, ref)
                al = warp_affine_tiled(raw_in, mats, out_hw=(112, 112),
                                       tile=wcfg[0], crop=wcfg[1])
                x = (al.astype(dtype) / 127.5) - 1.0
                featmap, _, _ = irse.apply(senc, enc_s, x, training=False)
                (v, _), _ = recnet.apply(rp, rec_s, featmap, cfg=cfg,
                                         training=False)
                return pair_cosine(v[0::2].astype(jnp.float32),
                                   v[1::2].astype(jnp.float32))

            p_bf16 = (lambda r, f=pipe: f(rec_p, r))
            p_int8 = (lambda r, f=pipe: f(srec, r))
            ms_b, ms_q = [], []
            for _ in range(args.rounds):
                ms_b.append(time_op(p_bf16, raw, iters=args.iters))
                ms_q.append(time_op(p_int8, raw, iters=args.iters))
            best_b = min([x for x in ms_b if x > 0.0] or [0.0])
            best_q = min([x for x in ms_q if x > 0.0] or [0.0])
            sec = {
                "arms": "int8_static_enc + {bf16, int8_static} recnet",
                "pipeline_ms_rec_bf16": round(best_b, 3),
                "pipeline_ms_rec_int8": round(best_q, 3),
                "faces_per_sec_rec_bf16": round(pb / (best_b / 1e3), 1),
                "faces_per_sec_rec_int8": round(pb / (best_q / 1e3), 1),
                "speedup": round(best_b / max(best_q, 1e-9), 3),
                "rounds_ms_rec_bf16": [round(v, 3) for v in ms_b],
                "rounds_ms_rec_int8": [round(v, 3) for v in ms_q],
            }
            out["pipeline"][str(pb)] = sec
            print(f"[bench_int8_recnet] pipeline b{pb}: {sec}",
                  file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
