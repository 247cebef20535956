"""Numerical-parity report against released PyTorch weights.

Given the released `se50.pth` (frozen encoder) and optionally `FFRNet.pth`
(RecNet), this tool:
  1. imports the weights through the torch-free reader + converters,
  2. runs both the PyTorch reference modules (if torch + /root/reference
     are importable) and our JAX stack on identical random inputs,
  3. reports max |diff| for the feature map, raw embedding and rectified
     embedding (BASELINE.json requires fp32-tolerance equivalence),
  4. optionally runs the full LFW verification when an aligned LFW tree is
     given, reporting (acc, acc_new) at ocl 0/1/2.

    python -m ffrnet_tpu.tools.parity_check --encoder se50.pth \
        [--recnet FFRNet.pth] [--lfw_root DIR --pairs lfw_pairs.txt]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def compare_with_torch(encoder_path, recnet_path, n: int = 4, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from ffrnet_tpu.checkpoint.pth_io import load_pth
    from ffrnet_tpu.checkpoint.torch_convert import (
        backbone_from_torch, recnet_from_torch)
    from ffrnet_tpu.models import irse, recnet

    report = {}
    enc_sd = load_pth(encoder_path)
    if "state_dict" in enc_sd:
        enc_sd = enc_sd["state_dict"]
    enc_p, enc_s = backbone_from_torch(enc_sd)

    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (n, 3, 112, 112)).astype(np.float32)
    featmap, embed, _ = jax.jit(irse.apply)(
        enc_p, enc_s, jnp.asarray(x.transpose(0, 2, 3, 1)))
    report["embed_norm"] = float(jnp.linalg.norm(embed[0]))

    rec_out = None
    if recnet_path:
        payload = load_pth(recnet_path)
        rec_p, rec_s = recnet_from_torch(payload.get("RecNet", payload))
        (feat_v, _), _ = jax.jit(recnet.apply)(rec_p, rec_s, featmap)
        rec_out = feat_v

    # torch golden comparison when available
    try:
        import torch

        from ffrnet_tpu.utils.reference_compat import install_reference_stubs

        if not install_reference_stubs():
            raise RuntimeError("reference checkout not available")
        from pretrain.model_ir_se50 import Backbone

        model = Backbone(50, 0.6, "ir_se")
        model.load_state_dict(
            {k: torch.from_numpy(np.asarray(v)) for k, v in enc_sd.items()})
        model.eval()
        with torch.no_grad():
            fm_t, emb_t = model(torch.from_numpy(x))
        report["featmap_max_diff"] = float(np.abs(
            np.asarray(featmap).transpose(0, 3, 1, 2) - fm_t.numpy()).max())
        report["embed_max_diff"] = float(np.abs(
            np.asarray(embed) - emb_t.numpy()).max())
        if recnet_path:
            from models.recnet import RecNet

            rn = RecNet()
            payload = load_pth(recnet_path)
            rn.load_state_dict({k: torch.from_numpy(np.asarray(v))
                                for k, v in payload.get("RecNet", payload).items()},
                               strict=False)
            rn.eval()
            with torch.no_grad():
                fv_t, _ = rn(fm_t)
            report["rectified_max_diff"] = float(np.abs(
                np.asarray(rec_out) - fv_t.numpy()).max())
    except Exception as e:  # torch/reference unavailable
        report["torch_comparison"] = f"skipped ({e})"
    return report


def quantize_for_deployment(enc_p, enc_s, rec_p, rec_s, cal_images,
                            dtype_name="bf16"):
    """Build the int8-static deployment trees from imported float weights:
    BN-fold, cast to the compute dtype, per-out-channel int8 weights,
    calibrated static activation scales (the same pipeline
    `FFRNet.prepare(quantize_int8='all').calibrate_int8` runs).

    cal_images: (K, 112, 112, 3) normalized [-1, 1] float array."""
    import jax
    import jax.numpy as jnp

    from ffrnet_tpu.models.optimize import fold_backbone_bn
    from ffrnet_tpu.models.quantize import (
        calibrate_activation_scales, calibrate_recnet_activation_scales,
        quantize_encoder_params, quantize_recnet_params)
    from ffrnet_tpu.ops.nn import tree_cast_floats

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    fp, fs = fold_backbone_bn(enc_p, enc_s)
    fp, fs = tree_cast_floats((fp, fs), dtype)
    qrp, qrs = tree_cast_floats((rec_p, rec_s), dtype)
    xcal = jnp.asarray(np.asarray(cal_images), dtype)
    fms = []
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        q_enc = calibrate_activation_scales(
            jax.device_get(quantize_encoder_params(fp)),
            jax.device_get(fs), [xcal], capture_featmaps=fms)
        q_rec = calibrate_recnet_activation_scales(
            jax.device_get(quantize_recnet_params(qrp)),
            jax.device_get(qrs),
            [jnp.asarray(f, dtype) for f in fms])
    put = lambda t: jax.device_put(jax.tree.map(jnp.asarray, t))  # noqa: E731
    return put(q_enc), put(fs), put(q_rec), put(qrs), dtype


def run_lfw(encoder_path, recnet_path, lfw_root, pairs, batch_size=64,
            int8=False, cal_images=8):
    import jax
    import jax.numpy as jnp

    from ffrnet_tpu.checkpoint.pth_io import load_pth
    from ffrnet_tpu.checkpoint.torch_convert import (
        backbone_from_torch, recnet_from_torch)
    from ffrnet_tpu.data.datasets import LfwPairs
    from ffrnet_tpu.data.pipeline import BatchLoader
    from ffrnet_tpu.eval.runner import evaluate_pairs
    from ffrnet_tpu.models import recnet as recnet_mod

    enc_sd = load_pth(encoder_path)
    enc_p, enc_s = backbone_from_torch(
        enc_sd.get("state_dict", enc_sd) if isinstance(enc_sd, dict) else enc_sd)
    if recnet_path:
        payload = load_pth(recnet_path)
        rec_p, rec_s = recnet_from_torch(payload.get("RecNet", payload))
    else:
        rec_p, rec_s = recnet_mod.init(jax.random.PRNGKey(0))

    q_trees = None
    out = {}
    for ocl in (0, 1, 2):
        ds = LfwPairs(lfw_root, pairs, test_ocl_num=ocl, flip_prob=0.0)
        loader = BatchLoader(ds, batch_size, shuffle=False, drop_last=False)
        res_new, res_raw = evaluate_pairs(enc_p, enc_s, rec_p, rec_s,
                                          loader.epoch(0))
        out[f"ocl{ocl}"] = {"acc_new": float(res_new.mean_accuracy),
                            "acc": float(res_raw.mean_accuracy)}
        if int8:
            # int8-static deployment arm on the SAME pairs: its accuracy
            # gate is the budget table (docs/int8_budget.json — measured
            # worst |delta| at protocol granularity on trained weights);
            # the acceptance bound stays BASELINE.json's 0.1%.
            if q_trees is None:
                cal = [ds.get(i, np.random.default_rng(0))["img1"]
                       for i in range(min(cal_images, len(ds)))]
                q_trees = quantize_for_deployment(
                    enc_p, enc_s, rec_p, rec_s, np.stack(cal))
            q_enc, q_es, q_rec, q_rs, dtype = q_trees

            def cast_batches():
                for b in loader.epoch(0):
                    yield {k: (jnp.asarray(v).astype(dtype)
                               if k in ("img1", "img2", "imgs") else v)
                           for k, v in b.items()}

            rq_new, rq_raw = evaluate_pairs(q_enc, q_es, q_rec, q_rs,
                                            cast_batches())
            cell = out[f"ocl{ocl}"]
            cell["acc_new_int8"] = float(rq_new.mean_accuracy)
            cell["acc_int8"] = float(rq_raw.mean_accuracy)
            cell["d_int8"], cell["int8_within_0.1pct"] = int8_gate(
                cell["acc_new"], cell["acc"],
                cell["acc_new_int8"], cell["acc_int8"])
    return out


def int8_gate(acc_new, acc, acc_new_int8, acc_int8, budget=0.001):
    """-> (display_deltas, within_budget) for the int8 acceptance gate.

    The flag is computed from the UNROUNDED deltas: a true delta of
    0.00104 must FAIL the 0.1% budget even though it displays as 0.001
    (ADVICE r4). Rounding is display-only."""
    d_exact = [acc_new_int8 - acc_new, acc_int8 - acc]
    return ([round(d, 4) for d in d_exact],
            bool(max(abs(d) for d in d_exact) <= budget))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--encoder", required=True)
    p.add_argument("--recnet", default="")
    p.add_argument("--lfw_root", default="")
    p.add_argument("--pairs", default="")
    p.add_argument("--int8", type=int, default=0,
                   help="also gate the int8-static deployment trees: same "
                        "ocl 0/1/2 protocol, per-ocl deltas vs float, "
                        "0.1%% acceptance flag (budget allocation: "
                        "docs/int8_budget.json)")
    args = p.parse_args(argv)

    report = compare_with_torch(args.encoder, args.recnet)
    if args.lfw_root and args.pairs:
        report["lfw"] = run_lfw(args.encoder, args.recnet, args.lfw_root,
                                args.pairs, int8=bool(args.int8))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
