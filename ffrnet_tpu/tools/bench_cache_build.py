"""Feature-cache BUILD pass: float vs int8-static frozen encoder (A/B).

Measures what `--cache_features 1 --int8_encoder 1` actually buys: the
one-time cache build is a full frozen-encoder sweep over every
(sample, flip), so the static-int8 encoder win applies to the whole
pass (train.py build_encoder). The reference has no cache at all — it
re-runs the fp32 frozen encoder every step (models/trainer.py:139-146
of /root/reference).

Methodology: same-session interleaved rounds (float, int8, float, int8,
...) into fresh cache dirs, wall-clocking each `build_feature_cache`
call end to end — encoder forwards + device_get of the feature tensors
+ host memmap writes. Through this image's relay the device_get legs
pay real RTT/bandwidth, so the reported speedup is a LOWER bound on
what the encoder win contributes on a directly-attached host (the
encoder share of the pass is reported separately via the in-step
encode time). Calibration (eager host-CPU, minutes) runs ONCE before
timing and is reported as its own one-time cost, exactly as the driver
amortizes it.

    python -m ffrnet_tpu.tools.bench_cache_build [--n 2048] [--batch 256]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2048,
                   help="dataset size (samples; each builds 2 flip variants)")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["fp32", "bf16"])
    p.add_argument("--rounds", type=int, default=3,
                   help="interleaved (float, int8) rounds")
    args = p.parse_args(argv)

    import jax

    from ffrnet_tpu.data.datasets import SyntheticPairs
    from ffrnet_tpu.models import irse
    from ffrnet_tpu.train import prepare_int8_encoder
    from ffrnet_tpu.training.feature_cache import build_feature_cache

    spi = max(1, args.n // 64)
    ds = SyntheticPairs(num_identities=64, samples_per_id=spi, seed=0)
    n = len(ds)

    enc_p, enc_s = irse.init(jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    q_p, q_s = prepare_int8_encoder(enc_p, enc_s, ds, args.dtype)
    cal_s = time.perf_counter() - t0
    arms = {"float": (enc_p, enc_s), "int8": (q_p, q_s)}

    def one_build(tree):
        d = tempfile.mkdtemp(prefix="ffrnet_cachebuild_")
        t0 = time.perf_counter()
        build_feature_cache(ds, *tree, d, batch_size=args.batch,
                            compute_dtype=args.dtype, num_threads=2)
        dt = time.perf_counter() - t0
        shutil.rmtree(d, ignore_errors=True)
        return dt

    # untimed warm build per arm: pays the jit compile + relay warmup so
    # the interleaved rounds compare steady-state passes
    for name, tree in arms.items():
        w = one_build(tree)
        print(f"[warm] {name}: {w:.2f}s", file=sys.stderr, flush=True)

    times = {k: [] for k in arms}
    for r in range(args.rounds):
        for name, tree in arms.items():
            dt = one_build(tree)
            times[name].append(dt)
            print(f"[round {r}] {name}: {dt:.3f}s "
                  f"({n / dt:.1f} samples/s)", file=sys.stderr, flush=True)

    med = {k: float(np.median(v)) for k, v in times.items()}
    out = {
        "tool": "bench_cache_build",
        "n": n, "batch": args.batch, "dtype": args.dtype,
        "calibration_s_onetime": round(cal_s, 2),
        "pass_s": {k: [round(t, 3) for t in v] for k, v in times.items()},
        "median_s": {k: round(v, 3) for k, v in med.items()},
        "samples_per_s": {k: round(n / v, 1) for k, v in med.items()},
        "speedup_int8": round(med["float"] / med["int8"], 3),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
