"""Per-component TPU timing for the inference pipeline (roofline view).

Times each encoder stage, the heads, RecNet, the warp variants, and the
cp2tform solve in isolation with the relay-safe chained methodology
(tools/timing.py), and reports achieved TFLOP/s against the analytic FLOP
count per component — the measurement VERDICT r1 asked for behind the
"encoder MXU utilization" work. Workload mirrors the reference hot path
(pretrain/model_ir_se50.py:84-141, models/recnet.py:398-429,
lfw/gen_lfw112x96.py:6-17).

    python -m ffrnet_tpu.tools.bench_stages [--batch 256] [--dtype bf16]
"""

from __future__ import annotations

import argparse
import json
import sys


# stage boundaries in the flat unit list for num_layers=50
_STAGES_50 = [(0, 3, 112, 64, 64), (3, 7, 56, 64, 128),
              (7, 21, 28, 128, 256), (21, 24, 14, 256, 512)]
# (unit_lo, unit_hi, input_hw, in_ch_first, out_ch)


def _unit_flops(h_in, cin, cout, stride):
    """MAC*2 for one IR-SE unit: conv1 3x3 s1 at input res + conv2 3x3
    stride + (projection shortcut if cin != cout)."""
    h_out = h_in // stride
    f = h_in * h_in * 9 * cin * cout * 2          # conv1
    f += h_out * h_out * 9 * cout * cout * 2      # conv2
    if cin != cout:
        f += h_out * h_out * cin * cout * 2       # 1x1 projection
    return f


def stage_flops(batch):
    from ffrnet_tpu.models.irse import unit_configs

    units = unit_configs(50)
    flops = {}
    for si, (lo, hi, hw, _, _) in enumerate(_STAGES_50, start=1):
        total, h = 0, hw
        for (cin, cout, stride) in units[lo:hi]:
            total += _unit_flops(h, cin, cout, stride)
            h //= stride
        flops[f"stage{si}"] = total * batch
    flops["stem"] = 112 * 112 * 9 * 3 * 64 * 2 * batch
    flops["head"] = (512 * 7 * 7) * 512 * 2 * batch
    return flops


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["fp32", "bf16"])
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--fold_bn", type=int, default=1)
    p.add_argument("--int8", type=int, default=0,
                   help="add int8-static encoder/RecNet rows (scale cache "
                        "hit path) and print the int8 serving-pipeline "
                        "stage-share table (VERDICT r3 next #5)")
    p.add_argument("--stem_duel", type=int, default=0,
                   help="A/B the roofline's one low-utilization stage "
                        "(stem conv, 2.7 TFLOP/s bf16 — the C=3 input "
                        "starves the MXU): production lax.conv vs an "
                        "im2col matmul (27-wide contraction) vs a "
                        "channel-padded (3->8, zero weights) conv; "
                        "exactness-checked against production")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ffrnet_tpu.models import irse, recnet
    from ffrnet_tpu.models.recnet import RecNetConfig
    from ffrnet_tpu.ops import nn as ops
    from ffrnet_tpu.ops.align import (
        ARCFACE_REF_PTS, cv2_transform, similarity_transform, warp_affine,
        warp_affine_mxu, warp_affine_tiled)
    from ffrnet_tpu.tools.timing import time_op

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    b = args.batch
    params, state = irse.init(jax.random.PRNGKey(0))
    if args.fold_bn:
        from ffrnet_tpu.models.optimize import fold_backbone_bn

        params, state = fold_backbone_bn(params, state)
    from ffrnet_tpu.ops.nn import tree_cast_floats

    params = tree_cast_floats(params, dtype)
    state = tree_cast_floats(state, dtype)
    units = irse.unit_configs(50)

    rng = np.random.default_rng(0)

    def rand(*shape):
        return jnp.asarray(rng.standard_normal(shape), dtype)

    results = {}
    flops = stage_flops(b)

    def record(name, ms, key=None):
        entry = {"ms": round(ms, 3)}
        if key or name in flops:
            f = flops.get(key or name)
            entry["tflops"] = round(f / (ms * 1e-3) / 1e12, 1)
        results[name] = entry
        print(f"[stages] {name}: {entry}", file=sys.stderr, flush=True)

    # stem
    x = rand(b, 112, 112, 3)

    def stem(x):
        y = ops.conv2d(x, params["input"]["conv"]["w"],
                       params["input"]["conv"].get("b"), stride=1, padding=1)
        y, _ = irse._bn(params["input"]["bn"], state["input"]["bn"], y, False)
        return ops.prelu(y, params["input"]["prelu"]["slope"], axis=-1)

    record("stem", time_op(stem, x, args.iters))

    # stages
    for si, (lo, hi, hw, cin, _) in enumerate(_STAGES_50, start=1):
        xin = rand(b, hw, hw, cin)

        def stage_fn(x, lo=lo, hi=hi):
            y = x
            for p_, s_, (_, _, stride) in zip(params["body"][lo:hi],
                                              state["body"][lo:hi],
                                              units[lo:hi]):
                y, _ = irse._apply_unit(p_, s_, y, stride, "ir_se", False)
            return y

        record(f"stage{si}", time_op(stage_fn, xin, args.iters))

    # full encoder + heads
    record("encoder_full", time_op(
        lambda x: irse.apply(params, state, x, training=False)[1], x,
        args.iters))

    # recnet
    cfg = RecNetConfig()
    rp, rs = recnet.init(jax.random.PRNGKey(1), cfg)
    rp, rs = tree_cast_floats(rp, dtype), tree_cast_floats(rs, dtype)
    fm = rand(b, 7, 7, 512)
    record("recnet", time_op(
        lambda z: recnet.apply(rp, rs, z, cfg=cfg, training=False)[0][0], fm,
        args.iters))

    # alignment: solve + warps
    raw = jnp.asarray(rng.uniform(0, 255, (b, 250, 250, 3)), dtype)
    lmk = jnp.asarray((ARCFACE_REF_PTS[None] * 2.0
                       + rng.normal(0, 2, (b, 5, 2)) + 20), jnp.float32)
    ref = jnp.broadcast_to(jnp.asarray(ARCFACE_REF_PTS), lmk.shape)
    mats = cv2_transform(lmk, ref)
    record("cp2tform_solve", time_op(
        lambda l: similarity_transform(l, ref), lmk, args.iters))
    record("warp_tiled", time_op(
        lambda r: warp_affine_tiled(r, mats, out_hw=(112, 112)), raw,
        args.iters))
    # the production serving config (bench.py auto_warp_config pick)
    record("warp_band", time_op(
        lambda r: warp_affine_tiled(r, mats, out_hw=(112, 112),
                                    tile=(112, 8), crop=(256, 40)), raw,
        args.iters))
    record("warp_rowcrop", time_op(
        lambda r: warp_affine_mxu(r, mats, out_hw=(112, 112), crop_rows=128),
        raw, args.iters))
    if args.iters <= 4:  # gather warp is slow; only on short runs
        record("warp_gather", time_op(
            lambda r: warp_affine(r, mats, out_hw=(112, 112)), raw, 2))

    if args.stem_duel:
        import jax.lax as lax

        w = params["input"]["conv"]["w"]  # (3, 3, 3, 64) HWIO
        bconv = params["input"]["conv"].get("b")

        def stem_prod(x):
            return ops.conv2d(x, w, bconv, stride=1, padding=1)

        # im2col: one (N*H*W, 27) x (27, 64) matmul — a contraction wide
        # enough to feed the MXU, if XLA fuses the patch gather into the
        # matmul operand feed instead of materializing 27x the input
        w_flat = jnp.transpose(w, (2, 0, 1, 3)).reshape(27, w.shape[-1])

        def stem_im2col(x):
            pat = lax.conv_general_dilated_patches(
                x, filter_shape=(3, 3), window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jnp.einsum("nhwk,ko->nhwo", pat, w_flat,
                           preferred_element_type=jnp.float32)
            y = y.astype(x.dtype)
            return y if bconv is None else y + bconv

        # channel-pad: zero-pad C 3->8 in both operands (identical math;
        # probes whether XLA's C=3 handling is the inefficiency)
        w_pad = jnp.pad(w, ((0, 0), (0, 0), (0, 5), (0, 0)))

        def stem_padc(x):
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
            return ops.conv2d(xp, w_pad, bconv, stride=1, padding=1)

        ref = np.asarray(jax.jit(stem_prod)(x), np.float32)
        duel = {}
        for name, fn in (("prod", stem_prod), ("im2col", stem_im2col),
                         ("padc", stem_padc)):
            got = np.asarray(jax.jit(fn)(x), np.float32)
            err = float(np.max(np.abs(got - ref)))
            ms = time_op(fn, x, args.iters)
            duel[name] = {"ms": round(ms, 3), "max_abs_err": err}
            print(f"[stem_duel] {name}: {duel[name]}", file=sys.stderr,
                  flush=True)
        results["stem_duel"] = duel

    if args.int8:
        from ffrnet_tpu.models.quantize import (quantize_encoder_params,
                                                quantize_recnet_params)
        from ffrnet_tpu.tools.int8_cache import (
            default_cache_file, encoder_cache_key, recnet_cache_key,
            static_encoder_tree, static_recnet_tree)

        sp, st_enc = static_encoder_tree(
            jax.device_put(quantize_encoder_params(params)), state, dtype,
            cache_file=default_cache_file(),
            cache_key=encoder_cache_key(fold_bn=str(args.fold_bn),
                                        dtype_name=args.dtype))
        print(f"[stages] enc scale cache: {st_enc}", file=sys.stderr,
              flush=True)
        record("encoder_int8", time_op(
            lambda x: irse.apply(sp, state, x, training=False)[1], x,
            args.iters))
        enc_fwd = jax.jit(
            lambda xx: irse.apply(params, state, xx, training=False)[0])
        srec, st_rec = static_recnet_tree(
            jax.device_put(quantize_recnet_params(rp)), rs, enc_fwd, dtype,
            cache_file=default_cache_file(), cfg=cfg,
            cache_key=recnet_cache_key(fold_bn=str(args.fold_bn),
                                       dtype_name=args.dtype))
        print(f"[stages] recnet scale cache: {st_rec}", file=sys.stderr,
              flush=True)
        record("recnet_int8", time_op(
            lambda z: recnet.apply(srec, rs, z, cfg=cfg,
                                   training=False)[0][0], fm, args.iters))
        # int8 serving-pipeline stage shares (sum-of-stages view; the
        # fused pipeline overlaps some of this — compare with bench.py's
        # int8_recnet_pipeline ms for the fusion gain)
        stages = {"cp2tform_solve": results["cp2tform_solve"]["ms"],
                  "warp_band": results["warp_band"]["ms"],
                  "encoder_int8": results["encoder_int8"]["ms"],
                  "recnet_int8": results["recnet_int8"]["ms"]}
        tot = sum(stages.values())
        results["int8_stage_shares"] = {
            k: {"ms": v, "share": round(v / tot, 3)}
            for k, v in stages.items()}
        results["int8_stage_shares"]["sum_ms"] = round(tot, 3)

    print(json.dumps({"batch": b, "dtype": args.dtype, "results": results}))


if __name__ == "__main__":
    main()
