"""Full-LFW-pass evaluation benchmark (wall-clock through the relay).

Times the complete verification protocol — 6000 pairs through frozen
IR-SE50 + RecNet, raw + rectified cosine scores, 10-fold threshold sweep —
exactly as eval.runner.evaluate_pairs runs it in training (train.py
eval_freq hook) and in the test phase. The runner keeps all per-batch
scores on device and pays ONE host sync per eval; --sync_per_batch
restores the reference-style per-batch device round-trip
(lfw/lfw_eval.py:226-252) to quantify the difference on a relayed TPU
(~50 ms RTT per sync).

    python -m ffrnet_tpu.tools.bench_eval [--batch 250] [--pairs 6000]
        [--dtype bf16] [--sync_per_batch]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=250)
    p.add_argument("--pairs", type=int, default=6000)
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["fp32", "bf16"])
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--sync_per_batch", action="store_true",
                   help="fetch each batch's scores to host inside the loop "
                        "(the pre-round-2 runner / reference behavior)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ffrnet_tpu.eval.runner import evaluate_pairs, make_pair_score_fn
    from ffrnet_tpu.models import irse, recnet
    from ffrnet_tpu.models.recnet import RecNetConfig
    from ffrnet_tpu.ops.nn import tree_cast_floats

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = RecNetConfig()
    enc_p, enc_s = irse.init(jax.random.PRNGKey(0))
    rec_p, rec_s = recnet.init(jax.random.PRNGKey(1), cfg)
    if dtype != jnp.float32:
        enc_p, enc_s, rec_p, rec_s = (tree_cast_floats(t, dtype)
                                      for t in (enc_p, enc_s, rec_p, rec_s))

    rng = np.random.default_rng(0)
    n = args.pairs

    def device_batches():
        """Pre-staged device batches: isolates eval/dispatch time from host
        synthesis + upload (a real run streams uploads behind compute)."""
        out = []
        for i in range(0, n, args.batch):
            b = min(args.batch, n - i)
            out.append({
                "img1": jnp.asarray(rng.uniform(
                    -1, 1, (b, 112, 112, 3)).astype(np.float32)).astype(dtype),
                "img2": jnp.asarray(rng.uniform(
                    -1, 1, (b, 112, 112, 3)).astype(np.float32)).astype(dtype),
                "label": rng.integers(0, 2, b).astype(np.int64),
            })
        return out

    batches = device_batches()

    base_score = make_pair_score_fn(cfg)
    if args.sync_per_batch:
        def score(*a):
            r, s = base_score(*a)
            return np.asarray(r), np.asarray(s)  # host sync per batch
    else:
        score = base_score

    def one_pass():
        t0 = time.perf_counter()
        res_new, res_raw = evaluate_pairs(
            enc_p, enc_s, rec_p, rec_s, batches, cfg, score_fn=score)
        # evaluate_pairs already synced; reading the floats is free
        float(res_new.mean_accuracy), float(res_raw.mean_accuracy)
        return time.perf_counter() - t0

    t_compile = one_pass()
    print(f"[bench_eval] compile+first pass {t_compile:.1f}s",
          file=sys.stderr, flush=True)
    times = [one_pass() for _ in range(args.repeats)]
    best = min(times)
    print(json.dumps({
        "metric": "lfw_eval_pass_seconds",
        "value": round(best, 3),
        "unit": "s",
        "pairs": n,
        "batch": args.batch,
        "dtype": args.dtype,
        "sync_per_batch": bool(args.sync_per_batch),
        "pairs_per_sec": round(n / best, 1),
        "all_times": [round(t, 3) for t in times],
    }))


if __name__ == "__main__":
    main()
