"""Same-session A/B/C: bf16 vs dynamic-int8 vs static-int8 encoder on TPU.

Measures the one remaining encoder headroom BASELINE.md identifies — the
v5e int8 MXU path (97.7 TOPS vs 49.6 bf16 TFLOP/s) — by dueling the
frozen IR-SE50 forward (folded BN, the serving configuration) against the
same forward with body convs + output Linear quantized
(models/quantize.py), in BOTH activation-scale modes:

  - dynamic: per-batch amax reduce in the graph (no calibration data);
  - static:  calibrated scales baked into the tree (the amax reduce — a
    full activation read per site — disappears; out-of-range values
    saturate at +/-127).

All arms run interleaved in ONE process per batch size (the only
comparable methodology on this relay, CLAUDE.md), across --batches sizes.
Embedding agreement (cosine vs the bf16 arm) is computed on an eval batch
HELD OUT from the calibration set, so static-scale saturation is actually
exercised; --margins sweeps the calibration margin to show where
saturation starts to bite (accuracy-only, no timing).

    python -m ffrnet_tpu.tools.bench_int8 [--batches 128,256,512]
        [--static_scales 1] [--margins 0.5,0.75,1.0,1.25]

Reference: the frozen fp32 CUDA encoder, pretrain/model_ir_se50.py:108-154
(no quantized path exists there).
"""

from __future__ import annotations

import argparse
import copy
import json
import sys
from functools import partial


def _cos(a, b):
    import numpy as np

    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    c = (a * b).sum(1) / np.maximum(
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1), 1e-12)
    return float(c.mean()), float(c.min())


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--batches", type=str, default="",
                   help="comma-separated batch sizes; overrides --batch")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--rounds", type=int, default=3,
                   help="interleaved A/B repetitions; min per arm reported")
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["fp32", "bf16"])
    p.add_argument("--quant_linear", type=int, default=1)
    p.add_argument("--static_scales", type=int, default=1,
                   help="include the calibrated static-scale arm")
    p.add_argument("--margins", type=str, default="",
                   help="calibration-margin sweep (held-out cosine only), "
                        "e.g. 0.5,0.75,1.0,1.5")
    p.add_argument("--cal_batch", type=int, default=16,
                   help="calibration set size (host-CPU eager pass)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ffrnet_tpu.models import irse
    from ffrnet_tpu.models.optimize import fold_backbone_bn
    from ffrnet_tpu.models.quantize import (_quantized_leaves,
                                            calibrate_activation_scales,
                                            quantize_encoder_params)
    from ffrnet_tpu.ops.nn import tree_cast_floats
    from ffrnet_tpu.tools.timing import time_op

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    batches = ([int(b) for b in args.batches.split(",")] if args.batches
               else [args.batch])

    params, state = irse.init(jax.random.PRNGKey(0))
    params, state = fold_backbone_bn(params, state)
    params, state = tree_cast_floats((params, state), dtype)
    params, state = jax.device_put((params, state))
    qparams = jax.device_put(
        quantize_encoder_params(params,
                                quantize_linear=bool(args.quant_linear)))

    def fwd(p, xin):
        feat, emb, _ = irse.apply(p, state, xin, training=False)
        return emb

    sparams = None
    margins = ([float(m) for m in args.margins.split(",")] if args.margins
               else [])
    if args.static_scales or margins:
        # calibrate EAGER on host CPU (eager TPU dispatch pays per-op RTT
        # through the relay); only the baked scalar scales ship to device.
        # Calibration data (rng seed 2) is DISJOINT from every eval batch
        # (jax PRNGKey 1) — the cosines below are held-out measurements.
        cpu = jax.devices("cpu")[0]
        host_q, host_s = jax.device_get((qparams, state))
        xcal = np.random.default_rng(2).uniform(
            -1.0, 1.0, (args.cal_batch, 112, 112, 3)).astype(np.float32)
        with jax.default_device(cpu):
            cal = calibrate_activation_scales(
                jax.tree.map(jnp.asarray, host_q),
                jax.tree.map(jnp.asarray, host_s),
                [jnp.asarray(xcal, dtype)])  # serve-dtype batch: the eager
            # stem conv needs input dtype == weight dtype, and calibrating
            # at the serving dtype matches what inference will see
        cal = jax.device_get(cal)
        if args.static_scales:
            sparams = jax.device_put(cal)

    def with_margin(m):
        """Rescale the baked x_scale leaves (amaxes are margin-independent,
        so one calibration pass serves the whole sweep)."""
        out = copy.deepcopy(cal)
        for leaf in _quantized_leaves(out):
            leaf["x_scale"] = np.float32(leaf["x_scale"] * m)
        return jax.device_put(jax.tree.map(jnp.asarray, out))

    out = {
        "tool": "bench_int8",
        "dtype": args.dtype,
        "quant_linear": bool(args.quant_linear),
        "arms": (["bf16", "int8_dynamic", "int8_static"] if sparams is not None
                 else ["bf16", "int8_dynamic"]),
        "per_batch": {},
    }

    for b in batches:
        x = jax.device_put(jax.random.uniform(
            jax.random.PRNGKey(1), (b, 112, 112, 3),
            minval=-1.0, maxval=1.0).astype(dtype))
        f_float = partial(fwd, params)
        f_int8 = partial(fwd, qparams)
        f_static = partial(fwd, sparams) if sparams is not None else None

        # accuracy agreement on identical (held-out) inputs, one fetch each
        emb_f = np.asarray(jax.jit(f_float)(x), np.float32)
        cos_d = _cos(emb_f, jax.jit(f_int8)(x))
        cos_s = _cos(emb_f, jax.jit(f_static)(x)) if f_static else None

        ms_f, ms_q, ms_s = [], [], []
        for _ in range(args.rounds):
            ms_f.append(time_op(f_float, x, iters=args.iters))
            ms_q.append(time_op(f_int8, x, iters=args.iters))
            if f_static is not None:
                ms_s.append(time_op(f_static, x, iters=args.iters))
        best_f, best_q = min(ms_f), min(ms_q)
        rec = {
            "encoder_ms_float": round(best_f, 3),
            "encoder_ms_int8": round(best_q, 3),
            "speedup_dynamic": round(best_f / max(best_q, 1e-9), 3),
            "imgs_per_sec_int8": round(b / (best_q / 1e3), 1),
            "embed_cos_mean": cos_d[0],
            "embed_cos_min": cos_d[1],
            "rounds_ms_float": [round(v, 3) for v in ms_f],
            "rounds_ms_int8": [round(v, 3) for v in ms_q],
        }
        if ms_s:
            best_s = min(ms_s)
            rec.update({
                "encoder_ms_int8_static": round(best_s, 3),
                "speedup_static": round(best_f / max(best_s, 1e-9), 3),
                "imgs_per_sec_static": round(b / (best_s / 1e3), 1),
                "embed_cos_mean_static": cos_s[0],
                "embed_cos_min_static": cos_s[1],
                "rounds_ms_int8_static": [round(v, 3) for v in ms_s],
            })
        out["per_batch"][str(b)] = rec
        print(f"[bench_int8] batch {b}: {rec}", file=sys.stderr, flush=True)

    if margins:
        b = max(batches)
        x = jax.device_put(jax.random.uniform(
            jax.random.PRNGKey(1), (b, 112, 112, 3),
            minval=-1.0, maxval=1.0).astype(dtype))
        emb_f = np.asarray(jax.jit(partial(fwd, params))(x), np.float32)
        sweep = {}
        # params traced as an argument: every margin shares one pytree
        # structure, so the whole sweep costs ONE compile
        jfwd = jax.jit(fwd)
        for m in margins:
            mp = with_margin(m)
            mean, mn = _cos(emb_f, jfwd(mp, x))
            sweep[str(m)] = {"cos_mean": mean, "cos_min": mn}
            print(f"[bench_int8] margin {m}: mean {mean:.5f} min {mn:.5f}",
                  file=sys.stderr, flush=True)
        out["margin_sweep_heldout"] = {"batch": b, "margins": sweep}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
