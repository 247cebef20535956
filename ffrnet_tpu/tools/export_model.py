"""Export the inference graph as a serialized StableHLO artifact.

`jax.export` lowers the jitted embed function (frozen IR-SE50 -> RecNet ->
raw + rectified embeddings) to portable StableHLO with the weights baked in
as constants, serialized to one file. The artifact is loadable from any
StableHLO-bearing runtime (PJRT C API, IREE, another Python without this
package) — the deployment story the PyTorch reference lacks entirely (its
only distribution format is a pickle state_dict, utils/utils.py:110-123).

The batch dimension is exported symbolically ("b") so ONE artifact serves
every batch size — the serving layer's bucket ladder and a C++ host can
share it.

    python -m ffrnet_tpu.tools.export_model --out ffrnet.stablehlo \
        [--encoder se50.pth --recnet FFRNet.pth] [--dtype bf16]

Round-trip check (deserialize + call + compare) is built in.
"""

from __future__ import annotations

import argparse
import json
import sys


def export_embed(model, *, symbolic_batch: bool = True, static_batch: int = 8,
                 platforms=None):
    """FFRNet -> jax.export.Exported for (b, 112, 112, 3) -> two (b, 512).

    symbolic_batch=False exports a fixed `static_batch` instead of 'b'.
    platforms: e.g. ('tpu', 'cpu') embeds lowerings for several targets in
    one artifact; default = the current backend only."""
    import jax
    import jax.numpy as jnp
    from jax import export as jex

    from ffrnet_tpu.models import irse, recnet

    enc_p, enc_s = model.enc_params, model.enc_state
    rec_p, rec_s = model.rec_params, model.rec_state
    cfg = model.cfg
    in_dtype = jax.tree.leaves(enc_p)[0].dtype

    def fwd(images):
        featmap, raw, _ = irse.apply(enc_p, enc_s, images, training=False)
        (rect, _), _ = recnet.apply(rec_p, rec_s, featmap, cfg=cfg,
                                    training=False)
        return raw, rect

    if symbolic_batch:
        (b,) = jex.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, 112, 112, 3), in_dtype)
    else:
        spec = jax.ShapeDtypeStruct((static_batch, 112, 112, 3), in_dtype)
    kw = {"platforms": tuple(platforms)} if platforms else {}
    return jex.export(jax.jit(fwd), **kw)(spec)


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ffrnet.stablehlo")
    ap.add_argument("--encoder", default="")
    ap.add_argument("--recnet", default="")
    ap.add_argument("--dtype", default="fp32", choices=["fp32", "bf16"])
    ap.add_argument("--static_batch", type=int, default=0,
                    help="export a fixed batch instead of symbolic 'b'")
    ap.add_argument("--platforms", default="",
                    help="comma-separated lowering targets, e.g. tpu,cpu "
                         "(default: current backend only)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np
    from jax import export as jex

    from ffrnet_tpu.api import FFRNet

    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    if args.encoder:
        model = FFRNet.from_pretrained(args.encoder, args.recnet, dtype=dtype)
    else:
        print("[export] no weights given: random init", file=sys.stderr)
        model = FFRNet.random(0, dtype=dtype)

    exp = export_embed(
        model, symbolic_batch=not args.static_batch,
        static_batch=args.static_batch or 8,
        platforms=args.platforms.split(",") if args.platforms else None)
    blob = exp.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)

    out = {
        "out": args.out,
        "bytes": len(blob),
        "in_shape": [str(d) for d in exp.in_avals[0].shape],
        "platforms": list(exp.platforms),
    }

    # round-trip: deserialize and compare against the live model — only
    # when the current backend is among the artifact's target platforms
    # (a pure cross-platform export is still valid, just not runnable here)
    import jax

    here = jax.default_backend()
    if here not in exp.platforms:
        out["roundtrip"] = f"skipped: exported for {list(exp.platforms)}, " \
                           f"running on {here!r}"
    else:
        rt = jex.deserialize(blob)
        n = args.static_batch or 4
        x = np.random.default_rng(0).uniform(
            -1, 1, (n, 112, 112, 3)).astype(np.float32)
        xin = jnp.asarray(x, jax.tree.leaves(model.enc_params)[0].dtype)
        raw_rt, rect_rt = rt.call(xin)
        raw, rect = model.embed(x)
        out["roundtrip_maxerr"] = max(
            float(jnp.max(jnp.abs(raw_rt.astype(jnp.float32)
                                  - raw.astype(jnp.float32)))),
            float(jnp.max(jnp.abs(rect_rt.astype(jnp.float32)
                                  - rect.astype(jnp.float32)))))
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    import jax  # noqa: F401  (ensure backend init before export)

    main()
