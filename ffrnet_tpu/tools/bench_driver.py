"""Real-driver-loop throughput: loader threads -> (sharded) device upload
-> jitted train step -> lazy metric queue, i.e. what train.py actually
does per iteration — including the host->device input traffic that
bench_train's pre-staged methodology deliberately excludes.

The reference's analog is the DataTime/Forward/Backward sections printed
by its Timer (utils/timer.py:14-30, train.py:50-54); it never reports a
throughput number. BASELINE.md "Driver-loop reality" records this loop as
input-upload-bound through the relayed TPU (~19 MB/batch at fp32); the
--host_normalize 0 path ships uint8 (4x fewer bytes) and normalizes on
device, and the loader uploads from its producer thread so the next
batch's transfer overlaps the current step.

    python -m ffrnet_tpu.tools.bench_driver [--batch 128] [--iters 30]
        [--host_normalize 0|1] [--upload_only 0|1]
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
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--host_normalize", type=int, default=0)
    p.add_argument("--num_classes", type=int, default=64)
    p.add_argument("--dtype", type=str, default="fp32",
                   choices=["fp32", "bf16"])
    p.add_argument("--n_thread", type=int, default=8)
    p.add_argument("--upload_only", type=int, default=0,
                   help="skip the train step: isolates loader+upload cost")
    p.add_argument("--donate", type=int, default=1,
                   help="donate the train state to the step (train.py does;"
                        " 0 measures the no-donation calling convention)")
    p.add_argument("--producer_upload", type=int, default=1,
                   help="device_put in the loader's producer thread "
                        "(overlaps upload with the step); 0 = consumer-side")
    p.add_argument("--pack", type=int, default=0,
                   help="pack both image streams into ONE (N,2,H,W,C) "
                        "buffer per batch. Default off, matching the "
                        "driver: fewer per-buffer costs in serialized "
                        "microbenches but measured ~40% slower in the "
                        "overlapped real loop (BASELINE.md)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ffrnet_tpu.data.datasets import SyntheticPairs
    from ffrnet_tpu.data.pipeline import BatchLoader
    from ffrnet_tpu.models import irse
    from ffrnet_tpu.models.recnet import RecNetConfig
    from ffrnet_tpu.training.trainer import (
        TrainerConfig, create_train_state, train_step)

    cfg = TrainerConfig(optimizer="adam", lr=1e-3, compute_dtype=args.dtype,
                        recnet=RecNetConfig(num_classes=args.num_classes))
    enc_params, enc_state = irse.init(jax.random.PRNGKey(0))
    state = create_train_state(jax.random.PRNGKey(1), cfg)
    # SyntheticPairs generates on the fly (no disk); decode cost ~0 so the
    # measured loop isolates upload + step, the driver's device-side path
    ds = SyntheticPairs(num_identities=args.num_classes,
                        samples_per_id=max(
                            1, (args.iters + args.warmup + 2) * args.batch
                            // args.num_classes + 1),
                        host_normalize=bool(args.host_normalize))
    dev = jax.devices()[0]
    from jax.sharding import SingleDeviceSharding

    sharding = SingleDeviceSharding(dev)
    if args.pack:
        shard_keys = ("imgs", "label")
        pack = {"imgs": ("img_non", "img_ocl")}
    else:
        shard_keys, pack = ("img_non", "img_ocl", "label"), None
    loader = BatchLoader(ds, args.batch, shuffle=False, drop_last=True,
                         seed=0, num_threads=args.n_thread,
                         process_index=0, process_count=1,
                         sharding={k: sharding for k in shard_keys},
                         upload_in_producer=bool(args.producer_upload),
                         pack=pack)
    step = jax.jit(functools.partial(train_step, cfg=cfg),
                   donate_argnums=(2,) if args.donate else ())

    sample = ds.get(0, np.random.default_rng(0))
    bytes_per_batch = 2 * args.batch * sample["img_non"].nbytes

    it = iter(loader.epoch(0))
    # compile outside the timed region
    first = next(it)
    if not args.upload_only:
        state, metrics = step(enc_params, enc_state, state, first)
        float(jax.device_get(metrics["TotalLoss"]))
    for _ in range(args.warmup):
        batch = next(it)
        if args.upload_only:
            jax.block_until_ready(list(batch.values()))
        else:
            state, metrics = step(enc_params, enc_state, state, batch)
    pending = []
    t0 = time.perf_counter()
    for _ in range(args.iters):
        batch = next(it)
        if args.upload_only:
            # force the transfer to finish (block_until_ready can return
            # early through the relay; a 1-element fetch pays one RTT)
            np.asarray(batch["label"][:1])
        else:
            state, metrics = step(enc_params, enc_state, state, batch)
            pending.append(metrics)
    if not args.upload_only:
        jax.device_get([m["TotalLoss"] for m in pending])  # lazy flush
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "driver_loop_imgs_per_sec",
        "value": round(args.batch * args.iters / dt, 2),
        "unit": "imgs/s",
        "ms_per_iter": round(1e3 * dt / args.iters, 2),
        "batch": args.batch,
        "host_normalize": bool(args.host_normalize),
        "upload_only": bool(args.upload_only),
        "mb_per_batch": round(bytes_per_batch / 1e6, 2),
        "dtype": args.dtype,
        "donate": bool(args.donate),
        "producer_upload": bool(args.producer_upload),
        "pack": bool(args.pack),
    }))


if __name__ == "__main__":
    main()
