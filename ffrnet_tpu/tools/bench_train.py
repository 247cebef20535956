"""Training-step throughput benchmark (imgs/sec/chip).

The reference never measured training throughput (only per-section seconds,
utils/timer.py). This tool times the full jitted train step — two frozen
encoder branches + RecNet fwd/bwd + 4-part loss + optimizer — with the
relay-safe chained methodology from bench.py.

    python -m ffrnet_tpu.tools.bench_train [--batch 128] [--iters 10]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--optimizer", type=str, default="adam")
    p.add_argument("--num_classes", type=int, default=10575)
    p.add_argument("--dtype", type=str, default="fp32", choices=["fp32", "bf16"])
    p.add_argument("--remat", type=int, default=0,
                   help="jax.checkpoint the RecNet branches (recompute in "
                        "backward; measures the remat-vs-store tradeoff)")
    p.add_argument("--remat_channel", type=int, default=0,
                   help="jax.checkpoint ONLY the channel-attention branch "
                        "(RecNetConfig.remat_channel): drops the (N,512,512) "
                        "M_channel intermediates from the stored residuals")
    p.add_argument("--ss_loss_impl", type=str, default="factored",
                   choices=["factored", "materialized"],
                   help="channel self-similarity loss path: Gram-free trace "
                        "identity vs literal (N,512,512) Grams "
                        "(losses.gram_mse_factored)")
    p.add_argument("--c4c_impl", type=str, default="factored",
                   choices=["factored", "materialized"],
                   help="channel-attention dataflow in the RecNet forward "
                        "(RecNetConfig.c4c_impl)")
    p.add_argument("--features", type=int, default=0,
                   help="feature-cached mode: run encode_frozen once, then "
                        "time RecNet-only steps (train_step_from_features) "
                        "— the frozen-encoder caching the torch reference "
                        "cannot express")
    p.add_argument("--enc_arms", type=int, default=0,
                   help="same-process frozen-encoder duel: float (the "
                        "production trainer tree) vs BN-folded vs "
                        "int8-static-folded encoder inside the FULL train "
                        "step. Valid because the encoder is frozen and "
                        "runs in eval mode (folding is exact; gradients "
                        "never touch it — only RecNet params are "
                        "differentiated). Interleaved rounds, chained "
                        "timing; overrides --features")
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--converge", type=int, default=0,
                   help="with --enc_arms: also run N REAL optimization "
                        "steps per arm (float vs int8_static encoder) on "
                        "identical synthetic identity data and report "
                        "final TrainAcc / triplet gap / loss — trajectory "
                        "evidence that int8-encoder training learns "
                        "equivalently, not just faster")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ffrnet_tpu.models import irse
    from ffrnet_tpu.models.recnet import RecNetConfig
    from ffrnet_tpu.training.trainer import (
        TrainerConfig, create_train_state, train_step)

    cfg = TrainerConfig(optimizer=args.optimizer, lr=1e-3,
                        compute_dtype=args.dtype, remat=bool(args.remat),
                        ss_loss_impl=args.ss_loss_impl,
                        recnet=RecNetConfig(
                            num_classes=args.num_classes,
                            c4c_impl=args.c4c_impl,
                            remat_channel=bool(args.remat_channel)))
    enc_params, enc_state = irse.init(jax.random.PRNGKey(0))
    state = create_train_state(jax.random.PRNGKey(1), cfg)

    rng = np.random.default_rng(0)
    batch = {
        "img_non": jnp.asarray(rng.uniform(
            -1, 1, (args.batch, 112, 112, 3)).astype(np.float32)),
        "img_ocl": jnp.asarray(rng.uniform(
            -1, 1, (args.batch, 112, 112, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, args.num_classes, args.batch)),
    }
    if args.enc_arms:
        from ffrnet_tpu.models.optimize import fold_backbone_bn
        from ffrnet_tpu.models.quantize import quantize_encoder_params
        from ffrnet_tpu.tools.int8_cache import (default_cache_file,
                                                 encoder_cache_key,
                                                 static_encoder_tree)

        fp, fs = fold_backbone_bn(enc_params, enc_state)
        # the scale cache is keyed to the folded bf16/fp32 serving tree;
        # activations are identical folded/unfolded (folding is exact), so
        # the same scales serve here
        sp, status = static_encoder_tree(
            jax.device_put(quantize_encoder_params(fp)), fs,
            jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
            cache_file=default_cache_file(),
            cache_key=encoder_cache_key(fold_bn="1", dtype_name=args.dtype))
        arms = {"float": (enc_params, enc_state), "folded": (fp, fs),
                "int8_static": (sp, fs)}
        # one TrainState per arm; successive steps chain through the state
        # (the relay-safe serialization bench.py's run_chain relies on)
        states = {k: create_train_state(jax.random.PRNGKey(1), cfg)
                  for k in arms}
        jstep = jax.jit(functools.partial(train_step, cfg=cfg))

        def chain(k, n):
            ep, es = arms[k]
            t0 = time.perf_counter()
            metrics = None
            for _ in range(n):
                states[k], metrics = jstep(ep, es, states[k], batch)
            float(jax.device_get(metrics["TotalLoss"]))
            return time.perf_counter() - t0

        for k in arms:  # compile + warm
            chain(k, 1)
            chain(k, 1)
        ms = {k: [] for k in arms}
        for _ in range(args.rounds):
            for k in arms:
                # retry non-positive slopes (relay throughput swings)
                for _attempt in range(3):
                    dt = chain(k, 2 + args.iters) - chain(k, 2)
                    if dt > 0.0:
                        ms[k].append(dt / args.iters * 1e3)
                        break
        rec = {"tool": "bench_train_enc_arms", "batch": args.batch,
               "dtype": args.dtype, "scale_cache": status}
        for k, v in ms.items():
            pos = [x for x in v if x > 0.0]
            best = min(pos) if pos else 0.0
            rec[f"step_ms_{k}"] = round(best, 2)
            rec[f"imgs_per_sec_{k}"] = round(
                args.batch / (best / 1e3), 1) if best else 0.0
        for k in ("folded", "int8_static"):
            rec[f"speedup_{k}"] = round(
                rec["step_ms_float"] / max(rec[f"step_ms_{k}"], 1e-9), 3)
        print(json.dumps(rec))

        if args.converge:
            # convergence A/B: same data order per arm, small head that
            # CAN converge in N steps; folding is exact so only the
            # float/int8 pair is informative
            from ffrnet_tpu.data.datasets import SyntheticPairs

            n_ids = min(args.num_classes, 64)
            ds = SyntheticPairs(num_identities=n_ids, samples_per_id=4,
                                seed=3)
            ccfg = TrainerConfig(optimizer="adam", lr=1e-3,
                                 compute_dtype=args.dtype,
                                 recnet=RecNetConfig(num_classes=n_ids))
            cstep = jax.jit(functools.partial(train_step, cfg=ccfg))
            conv = {}
            for k in ("float", "int8_static"):
                ep, es = arms[k]
                st = create_train_state(jax.random.PRNGKey(1), ccfg)
                order = np.random.default_rng(1)
                srng = np.random.default_rng(2)
                m = None
                for _ in range(args.converge):
                    idx = order.choice(len(ds), args.batch, replace=True)
                    samples = [ds.get(int(i), srng) for i in idx]
                    bc = {kk: jnp.asarray(np.stack([s[kk] for s in samples]))
                          for kk in ("img_non", "img_ocl", "label")}
                    st, m = cstep(ep, es, st, bc)
                m = jax.device_get(m)
                conv[k] = {
                    "TrainAcc": round(float(m["TrainAcc"]), 4),
                    "triplet_gap": round(
                        float(m["NegDist"]) - float(m["PosDist"]), 4),
                    "TotalLoss": round(float(m["TotalLoss"]), 3)}
            print(json.dumps({"tool": "bench_train_enc_arms_converge",
                              "steps": args.converge, "batch": args.batch,
                              "num_classes": n_ids, "dtype": args.dtype,
                              "arms": conv}))
        return

    if args.features:
        from ffrnet_tpu.training.trainer import (encode_frozen,
                                                 train_step_from_features)

        feats = jax.jit(functools.partial(
            encode_frozen, compute_dtype=args.dtype))(
                enc_params, enc_state, batch)
        fstep = jax.jit(functools.partial(train_step_from_features, cfg=cfg))

        def step(_, __, state, ___):
            return fstep(state, feats)
    else:
        step = jax.jit(functools.partial(train_step, cfg=cfg))

    t0 = time.perf_counter()
    state, metrics = step(enc_params, enc_state, state, batch)
    float(jax.device_get(metrics["TotalLoss"]))
    print(f"[bench_train] compile+first {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    def chain(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step(enc_params, enc_state, state, batch)
        float(jax.device_get(metrics["TotalLoss"]))
        return time.perf_counter() - t0

    t_short = chain(2)
    t_long = chain(2 + args.iters)
    dt = max(t_long - t_short, 1e-9)
    imgs_per_sec = args.batch * args.iters / dt
    print(json.dumps({
        "metric": "train_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/s",
        "batch": args.batch,
        "dtype": args.dtype,
        "remat": bool(args.remat),
        "remat_channel": bool(args.remat_channel),
        "ss_loss_impl": args.ss_loss_impl,
        "c4c_impl": args.c4c_impl,
        "features": bool(args.features),
        "step_ms": round(1e3 * dt / args.iters, 2),
    }))


if __name__ == "__main__":
    main()
