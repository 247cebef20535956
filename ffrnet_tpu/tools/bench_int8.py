"""Same-session A/B: bf16 encoder vs int8-quantized encoder on the TPU.

Measures the one remaining encoder headroom BASELINE.md identifies — the
v5e int8 MXU path (97.7 TOPS vs 49.6 bf16 TFLOP/s) — by dueling the
frozen IR-SE50 forward (folded BN, the serving configuration) against the
same forward with body convs + output Linear quantized
(models/quantize.py). Also reports the embedding agreement (cosine)
between the two paths on identical inputs, so the accuracy cost and the
speed win land in the same artifact. Relay-safe chained timing
(tools/timing.py); only same-session numbers are comparable on this image
(CLAUDE.md).

    python -m ffrnet_tpu.tools.bench_int8 [--batch 256] [--iters 8]

Reference: the frozen fp32 CUDA encoder, pretrain/model_ir_se50.py:108-154
(no quantized path exists there).
"""

from __future__ import annotations

import argparse
import json
from functools import partial


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--rounds", type=int, default=3,
                   help="A/B repetitions; min of each side is reported")
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["fp32", "bf16"])
    p.add_argument("--quant_linear", type=int, default=1)
    p.add_argument("--static_scales", type=int, default=0,
                   help="also duel calibrated static activation scales")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ffrnet_tpu.models import irse
    from ffrnet_tpu.models.optimize import fold_backbone_bn
    from ffrnet_tpu.models.quantize import quantize_encoder_params
    from ffrnet_tpu.ops.nn import tree_cast_floats
    from ffrnet_tpu.tools.timing import time_op

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    b = args.batch

    params, state = irse.init(jax.random.PRNGKey(0))
    params, state = fold_backbone_bn(params, state)
    params, state = tree_cast_floats((params, state), dtype)
    params, state = jax.device_put((params, state))
    qparams = jax.device_put(
        quantize_encoder_params(params,
                                quantize_linear=bool(args.quant_linear)))

    x = jax.random.uniform(jax.random.PRNGKey(1), (b, 112, 112, 3),
                           minval=-1.0, maxval=1.0).astype(dtype)
    x = jax.device_put(x)

    def fwd(p, xin):
        feat, emb, _ = irse.apply(p, state, xin, training=False)
        return emb

    f_float = partial(fwd, params)
    f_int8 = partial(fwd, qparams)

    sparams = None
    if args.static_scales:
        from ffrnet_tpu.models.quantize import calibrate_activation_scales

        # calibrate EAGER on host CPU (eager TPU dispatch pays per-op RTT
        # through the relay); only the baked scalar scales ship to device
        cpu = jax.devices("cpu")[0]
        host_q, host_s = jax.device_get((qparams, state))
        xcal = np.random.default_rng(2).uniform(
            -1.0, 1.0, (16, 112, 112, 3)).astype(np.float32)
        with jax.default_device(cpu):
            cal = calibrate_activation_scales(
                jax.tree.map(jnp.asarray, host_q),
                jax.tree.map(jnp.asarray, host_s), [jnp.asarray(xcal)])
        sparams = jax.device_put(jax.device_get(cal))
    f_static = partial(fwd, sparams) if sparams is not None else None

    # accuracy agreement on identical inputs (one fetch)
    emb_f = np.asarray(jax.jit(f_float)(x), np.float32)
    emb_q = np.asarray(jax.jit(f_int8)(x), np.float32)
    cos = (emb_f * emb_q).sum(1) / np.maximum(
        np.linalg.norm(emb_f, axis=1) * np.linalg.norm(emb_q, axis=1), 1e-12)

    # interleaved A/B rounds: relay throughput swings, min-of-rounds per side
    ms_f, ms_q, ms_s = [], [], []
    for _ in range(args.rounds):
        ms_f.append(time_op(f_float, x, iters=args.iters))
        ms_q.append(time_op(f_int8, x, iters=args.iters))
        if f_static is not None:
            ms_s.append(time_op(f_static, x, iters=args.iters))
    best_f, best_q = min(ms_f), min(ms_q)

    out = {
        "tool": "bench_int8",
        "batch": b,
        "dtype": args.dtype,
        "quant_linear": bool(args.quant_linear),
        "encoder_ms_float": round(best_f, 3),
        "encoder_ms_int8": round(best_q, 3),
        "speedup": round(best_f / max(best_q, 1e-9), 3),
        "imgs_per_sec_int8": round(b / (best_q / 1e3), 1),
        "embed_cos_mean": float(np.mean(cos)),
        "embed_cos_min": float(np.min(cos)),
        "rounds_ms_float": [round(v, 3) for v in ms_f],
        "rounds_ms_int8": [round(v, 3) for v in ms_q],
    }
    if ms_s:
        emb_s = np.asarray(jax.jit(f_static)(x), np.float32)
        cos_s = (emb_f * emb_s).sum(1) / np.maximum(
            np.linalg.norm(emb_f, axis=1) * np.linalg.norm(emb_s, axis=1),
            1e-12)
        best_s = min(ms_s)
        out.update({
            "encoder_ms_int8_static": round(best_s, 3),
            "speedup_static": round(best_f / max(best_s, 1e-9), 3),
            "embed_cos_mean_static": float(np.mean(cos_s)),
            "rounds_ms_int8_static": [round(v, 3) for v in ms_s],
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
