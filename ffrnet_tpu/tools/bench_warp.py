"""Warp-kernel configuration sweep (XLA tiled-warp shapes, serial vs
batched tiles).

The XLA column-band warp is HBM-bandwidth-bound: its dominant traffic is
the materialized (N, P, crop_h) bilinear y-weight tensor plus the
(N, P, crop_w, C) x-interp intermediate, so total bytes scale with crop_h
— which the full-height column band maximizes. Shorter tiles shrink
crop_h but multiply lax.map steps; `serial=False` removes the sequential
dispatch by batching every tile through one einsum. This sweep measures
the exact-guarded configurations and prints one JSON line each, so the
production config (bench.py / align_faces) is chosen from data.

    python -m ffrnet_tpu.tools.bench_warp [--batch 256] [--dtype bf16]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["fp32", "bf16"])
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--src", type=int, default=250, help="source image side")
    p.add_argument("--configs", type=str, default="",
                   help="override candidates: 'th,tw,ch,cw;th,tw,ch,cw;...'")
    p.add_argument("--u8_duel", type=int, default=0,
                   help="storage/precision duel at ONE config (the first "
                        "candidate, or --configs): bf16-source vs "
                        "uint8-source (1-byte HBM reads, exact) vs "
                        "uint8-source + int8-MXU y-stage (2.01-LSB pixel "
                        "bound) — interleaved rounds, then exit")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ffrnet_tpu.ops.align import (
        ARCFACE_REF_PTS, cv2_transform, warp_affine_mxu, warp_affine_tiled,
        warp_tile_bound_ok)
    from ffrnet_tpu.tools.timing import time_op

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.uniform(
        0, 255, (args.batch, args.src, args.src, 3)).astype(np.float32)
    ).astype(dtype)
    lmk = (ARCFACE_REF_PTS[None] * (args.src / 119.0)
           + rng.normal(0, 2, (args.batch, 5, 2)) + 15).astype(np.float32)
    mats = cv2_transform(jnp.asarray(lmk), jnp.broadcast_to(
        jnp.asarray(ARCFACE_REF_PTS), lmk.shape))
    mats_np = np.asarray(mats)

    def record(name, ms, **extra):
        print(json.dumps({"config": name,
                          "ms": round(ms, 3) if ms is not None else None,
                          "batch": args.batch, "dtype": args.dtype, **extra}),
              flush=True)

    # (tile, crop) candidates; crop_h=256 means full padded height
    configs = [
        ((112, 16), (256, 64)),   # round-1 production column band
        ((112, 16), (256, 48)),
        ((56, 16), (160, 64)),
        ((56, 16), (160, 48)),
        ((28, 16), (96, 64)),
        ((28, 16), (96, 48)),
        ((16, 16), (64, 48)),
        ((14, 16), (64, 64)),
        ((28, 28), (96, 96)),
    ]
    if args.configs:
        configs = []
        for spec in args.configs.split(";"):
            th, tw, ch, cw = (int(v) for v in spec.split(","))
            configs.append(((th, tw), (ch, cw)))
    if args.u8_duel:
        tile, crop = configs[0]
        if not warp_tile_bound_ok(mats_np, tile, crop):
            record(f"u8_duel{tile}x{crop}", None, skipped="bound")
            return
        raw_u8 = jnp.asarray(rng.integers(
            0, 256, (args.batch, args.src, args.src, 3)), jnp.uint8)
        # float arm warps the SAME pixel values pre-cast (honest A/B:
        # identical transforms and outputs; only storage/precision differ)
        raw_f = raw_u8.astype(dtype)
        arms = {
            "src_" + args.dtype: (lambda r: warp_affine_tiled(
                r, mats, out_hw=(112, 112), tile=tile, crop=crop), raw_f),
            "src_u8": (lambda r: warp_affine_tiled(
                r, mats, out_hw=(112, 112), tile=tile, crop=crop,
                compute_dtype=dtype), raw_u8),
            "src_u8_yint8": (lambda r: warp_affine_tiled(
                r, mats, out_hw=(112, 112), tile=tile, crop=crop,
                compute_dtype=dtype, y_int8=True), raw_u8),
        }
        res = {k: [] for k in arms}
        for _ in range(3):  # interleaved rounds
            for k, (fn, x0) in arms.items():
                ms = time_op(fn, x0, iters=args.iters)
                if ms > 0.0:
                    res[k].append(ms)
        base = min(res["src_" + args.dtype] or [0.0])
        for k, v in res.items():
            best = min(v) if v else None
            record(f"u8_duel{tile}x{crop}:{k}", best,
                   speedup=(round(base / best, 3)
                            if best and base else None))
        return

    for tile, crop in configs:
        if not warp_tile_bound_ok(mats_np, tile, crop):
            record(f"tiled{tile}x{crop}", None, skipped="bound")
            continue
        for serial in (True, False):
            tag = f"tiled{tile}x{crop}{'_serial' if serial else '_batched'}"
            print(f"[bench_warp] {tag} compiling...", file=sys.stderr,
                  flush=True)
            try:
                ms = time_op(lambda r, t=tile, c=crop, s=serial:
                             warp_affine_tiled(r, mats, out_hw=(112, 112),
                                               tile=t, crop=c, serial=s),
                             raw, iters=args.iters)
                record(tag, ms)
            except Exception as e:  # OOM etc: report, keep sweeping
                record(tag, None, error=str(e)[-120:])
    ms = time_op(lambda r: warp_affine_mxu(r, mats, out_hw=(112, 112),
                                           crop_rows=128), raw,
                 iters=args.iters)
    record("rowcrop128", ms)


if __name__ == "__main__":
    main()
