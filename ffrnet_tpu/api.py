"""High-level facade: the one-import user API.

    from ffrnet_tpu.api import FFRNet

    model = FFRNet.from_pretrained("se50.pth", "FFRNet.pth")  # or .random()
    raw_emb, rect_emb = model.embed(images_nhwc)       # [-1, 1] BGR inputs
    scores = model.verify(img1, img2)                  # rectified cosine
    acc_new, acc = model.evaluate(batches)             # full 10-fold sweep
    aligned = model.align(raw_images, landmarks)       # on-device cp2tform

Bundles the frozen IR-SE50 encoder + RecNet with jitted inference, optional
bf16 compute and BN folding — everything a user of the reference's
encoder/recnet pair needs, in one object.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp

from ffrnet_tpu.models import irse, recnet
from ffrnet_tpu.models.recnet import RecNetConfig


@dataclass
class FFRNet:
    enc_params: Any
    enc_state: Any
    rec_params: Any
    rec_state: Any
    cfg: RecNetConfig = field(default_factory=RecNetConfig)
    # set by .shard(): NamedSharding that splits the batch axis over the
    # mesh's 'data' axis; params are then replicated device arrays
    batch_sharding: Any = None

    # ------------------------------------------------------------------ init
    @classmethod
    def from_pretrained(cls, encoder_path: str, recnet_path: str = "", *,
                        cfg: RecNetConfig = RecNetConfig(),
                        fold_bn: bool = True, dtype=None) -> "FFRNet":
        """Load released .pth(.gzip) weights (torch-free)."""
        from ffrnet_tpu.checkpoint.pth_io import load_pth
        from ffrnet_tpu.checkpoint.torch_convert import (
            backbone_from_torch, recnet_from_torch)

        enc_sd = load_pth(encoder_path)
        if isinstance(enc_sd, dict) and "state_dict" in enc_sd:
            enc_sd = enc_sd["state_dict"]
        enc_p, enc_s = backbone_from_torch(enc_sd)
        if recnet_path:
            payload = load_pth(recnet_path)
            rec_p, rec_s = recnet_from_torch(payload.get("RecNet", payload), cfg)
        else:
            rec_p, rec_s = recnet.init(jax.random.PRNGKey(0), cfg)
        model = cls(enc_p, enc_s, rec_p, rec_s, cfg)
        return model.prepare(fold_bn=fold_bn, dtype=dtype)

    @classmethod
    def random(cls, seed: int = 0, *, cfg: RecNetConfig = RecNetConfig(),
               dtype=None) -> "FFRNet":
        enc_p, enc_s = irse.init(jax.random.PRNGKey(seed))
        rec_p, rec_s = recnet.init(jax.random.PRNGKey(seed + 1), cfg)
        return cls(enc_p, enc_s, rec_p, rec_s, cfg).prepare(dtype=dtype)

    def prepare(self, *, fold_bn: bool = False, dtype=None,
                quantize_int8=False) -> "FFRNet":
        """BN-fold the frozen encoder and/or cast to a compute dtype; puts
        all leaves on device. `quantize_int8` converts weight leaves to
        the int8 MXU path (models/quantize.py) — opt-in, accuracy/perf
        tradeoff measured in BASELINE.md (numbers-of-record):
          True or "encoder" — the encoder's body convs + output Linear;
          "recnet"          — RecNet's conv chains;
          "all"             — both."""
        from ffrnet_tpu.ops.nn import tree_cast_floats

        q_mode = "encoder" if quantize_int8 is True else quantize_int8
        if q_mode not in (False, "encoder", "recnet", "all"):
            raise ValueError(
                f"quantize_int8 must be False/True/'encoder'/'recnet'/'all',"
                f" got {quantize_int8!r}")
        enc_p, enc_s = self.enc_params, self.enc_state
        if fold_bn:
            from ffrnet_tpu.models.optimize import fold_backbone_bn
            from ffrnet_tpu.ops import quant

            if quant.tree_has_quantized(enc_p):
                raise ValueError(
                    "prepare(fold_bn=True) on an already-int8-quantized "
                    "encoder: BN folding rewrites float conv weights and "
                    "cannot be applied to int8 leaves. Fold BEFORE "
                    "quantizing (prepare(fold_bn=True, quantize_int8=True) "
                    "from a float model does both in the right order).")
            enc_p, enc_s = fold_backbone_bn(enc_p, enc_s)
        trees = jax.tree.map(
            jnp.asarray, (enc_p, enc_s, self.rec_params, self.rec_state))
        trees = tree_cast_floats(trees, dtype)
        if q_mode:
            from ffrnet_tpu.models.quantize import (quantize_encoder_params,
                                                    quantize_recnet_params)

            enc_p_c, enc_s_c, rec_p_c, rec_s_c = trees
            if q_mode in ("encoder", "all"):
                enc_p_c = quantize_encoder_params(enc_p_c)
            if q_mode in ("recnet", "all"):
                rec_p_c = quantize_recnet_params(rec_p_c)
            trees = (enc_p_c, enc_s_c, rec_p_c, rec_s_c)
        if self.batch_sharding is not None:
            # keep a sharded model sharded: re-replicate the rebuilt trees
            # over the same mesh instead of silently dropping to one device
            from ffrnet_tpu.parallel.mesh import replicated

            trees = jax.device_put(trees,
                                   replicated(self.batch_sharding.mesh))
        return FFRNet(*trees, self.cfg, batch_sharding=self.batch_sharding)

    def calibrate_int8(self, batches, *, margin: float = 1.0) -> "FFRNet":
        """Bake static per-tensor activation scales into the int8 trees.

        Removes the per-call dynamic amax reduce (a full activation read
        per quantized site) AND the dynamic path's batch-composition
        dependence — a sample's int8 embedding no longer varies with what
        else shares its batch. Out-of-range activations saturate at ±127
        (standard PTQ clipping; accuracy cost measured in BASELINE.md
        "Int8 encoder", tests/test_quant.py bounds the held-out cosine).

        Calibrates every quantized tree: the encoder, a RecNet quantized
        via prepare(quantize_int8="recnet"/"all") (its calibration inputs
        are the encoder feature maps of the SAME batches, captured from
        the encoder pass at no extra cost), or both.

        `batches`: iterable of (N, 112, 112, 3) host arrays in the model's
        input convention ([-1, 1] BGR). The calibration pass runs EAGERLY
        on the host CPU backend (eager dispatch on a remote TPU pays
        per-op RTT; only the baked scalar scales ship to device). Requires
        prepare(quantize_int8=...) first; call once at load time.
        """
        import numpy as np

        from ffrnet_tpu.models import irse
        from ffrnet_tpu.models.quantize import (
            calibrate_activation_scales, calibrate_recnet_activation_scales)
        from ffrnet_tpu.ops import quant

        enc_q = quant.tree_has_quantized(self.enc_params)
        rec_q = quant.tree_has_quantized(self.rec_params)
        if not (enc_q or rec_q):
            raise ValueError(
                "calibrate_int8 requires an int8-quantized tree — call "
                "prepare(quantize_int8=...) first")
        cpu = jax.devices("cpu")[0]
        host_q, host_s = jax.device_get((self.enc_params, self.enc_state))
        in_dtype = host_q["input"]["conv"]["w"].dtype  # stem stays float
        cal_enc, cal_rec = host_q, None
        with jax.default_device(cpu):
            def to_cal(b):
                a = np.asarray(b)
                if a.dtype == np.uint8:
                    # raw 0..255 pixels (the loader's default upload
                    # format, which embed() normalizes transparently)
                    # would calibrate activations ~127x too large and
                    # bake garbage scales with no error (round-5
                    # review) — apply the same [-1,1] normalization
                    from ffrnet_tpu.data.datasets import _to_unit

                    a = _to_unit(a)
                return jnp.asarray(a, in_dtype)

            xb = [to_cal(b) for b in batches]
            featmaps = []
            host_enc = jax.tree.map(jnp.asarray, host_q)
            host_es = jax.tree.map(jnp.asarray, host_s)
            if enc_q:
                cal_enc = calibrate_activation_scales(
                    host_enc, host_es, xb, margin=margin,
                    capture_featmaps=featmaps if rec_q else None)
            elif rec_q:  # float encoder still supplies the featmaps
                for x in xb:
                    fm, _, _ = irse.apply(host_enc, host_es, x,
                                          training=False)
                    featmaps.append(fm)
            if rec_q:
                host_rec, host_rs = jax.device_get(
                    (self.rec_params, self.rec_state))
                cal_rec = calibrate_recnet_activation_scales(
                    jax.tree.map(jnp.asarray, host_rec),
                    jax.tree.map(jnp.asarray, host_rs),
                    featmaps, cfg=self.cfg, margin=margin)
        trees = jax.tree.map(
            jnp.asarray,
            (jax.device_get(cal_enc), self.enc_state,
             jax.device_get(cal_rec) if cal_rec is not None
             else self.rec_params,
             self.rec_state))
        if self.batch_sharding is not None:
            from ffrnet_tpu.parallel.mesh import replicated

            trees = jax.device_put(trees,
                                   replicated(self.batch_sharding.mesh))
        else:
            trees = jax.device_put(trees)
        return FFRNet(*trees, self.cfg, batch_sharding=self.batch_sharding)

    def shard(self, mesh=None) -> "FFRNet":
        """Data-parallel inference over a device mesh.

        Replicates the weight trees over `mesh` (default: a mesh over all
        visible devices) and marks the model so every embed/verify/
        embed_files call shards its batch over the mesh's 'data' axis — XLA then runs
        each shard on its own chip with no collectives on the forward path
        (embeddings are per-sample). The reference's only inference
        parallelism is single-host nn.DataParallel around the torch modules
        (models/trainer.py:70-72); this is the same capability expressed as
        shardings, so it scales across hosts/ICI unchanged.

        Batches not divisible by the data-axis size are zero-padded for the
        dispatch and sliced back — every jitted program keeps static shapes.
        """
        from ffrnet_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                              replicated)

        if mesh is None:
            mesh = make_mesh()
        trees = jax.device_put(
            (self.enc_params, self.enc_state, self.rec_params,
             self.rec_state), replicated(mesh))
        return FFRNet(*trees, self.cfg, batch_sharding=batch_sharding(mesh))

    # ------------------------------------------------------------- inference
    def _embed(self, images):
        # module-level jitted fn with cfg static: the compile cache is
        # shared across FFRNet instances (params are traced args, so
        # instances never pin weight trees in the pjit cache)
        # inputs follow the model's compute dtype (a bf16-prepared model
        # accepts fp32/uint8-scaled hosts arrays; cast host-side = half the
        # upload bytes for bf16)
        compute_dtype = self.enc_params["input"]["conv"]["w"].dtype
        if getattr(images, "dtype", None) == jnp.uint8:
            # raw uint8 pixels: upload as-is (4x fewer bytes than fp32)
            # and normalize to [-1, 1] on device inside _embed_impl
            images = jnp.asarray(images)
        else:
            images = jnp.asarray(images, dtype=compute_dtype)
        if self.batch_sharding is not None:
            n = images.shape[0]
            n_data = self.batch_sharding.mesh.shape["data"]
            pad = -n % n_data
            if pad:
                images = jnp.concatenate(
                    [images, jnp.zeros((pad,) + images.shape[1:],
                                       images.dtype)], axis=0)
            images = jax.device_put(images, self.batch_sharding)
            out = _embed_impl(self.enc_params, self.enc_state,
                              self.rec_params, self.rec_state, images,
                              cfg=self.cfg)
            return tuple(o[:n] for o in out) if pad else out
        return _embed_impl(self.enc_params, self.enc_state, self.rec_params,
                           self.rec_state, images, cfg=self.cfg)

    def embed(self, images) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images: (N, 112, 112, 3) NHWC in [-1, 1] BGR ->
        (raw_embedding (N,512) L2-normed, rectified_embedding (N,512)).

        Host arrays go straight to _embed (which casts to the compute dtype
        BEFORE upload — a premature jnp.asarray here would ship full fp32
        bytes through the link and cast on device)."""
        raw, rect, _ = self._embed(images)
        return raw, rect

    def featurize(self, images):
        """Full outputs: (raw_embed, rectified_embed, rectified_map)."""
        return self._embed(images)

    def verify(self, img1, img2, *, rectified: bool = True) -> jnp.ndarray:
        """Per-pair cosine scores (the reference's verification distance).

        Both sides are embedded in ONE 2N-batch dispatch (the same fusion
        the eval runner uses) instead of two N-batch encoder calls."""
        import numpy as np

        from ffrnet_tpu.eval.lfw import pair_cosine

        n = np.shape(img1)[0]
        if n != np.shape(img2)[0]:
            raise ValueError(
                f"verify() needs the same number of images on each side, "
                f"got {n} vs {np.shape(img2)[0]}")
        # mixed uint8/float sides would concatenate into 0..255 floats;
        # normalize the uint8 side host-side so both speak [-1, 1]
        def _dt(x):
            d = getattr(x, "dtype", None)
            # lists/tuples have no .dtype — resolve via numpy (host data,
            # cheap); never np.asarray a jax.Array here (device fetch)
            return np.dtype(d) if d is not None else np.asarray(x).dtype

        d1, d2 = _dt(img1), _dt(img2)
        if d1 != d2 and np.uint8 in (d1.type, d2.type):
            from ffrnet_tpu.data.datasets import _to_unit
            from ffrnet_tpu.ops.nn import images_to_unit_range

            def normalize(x):
                # device arrays normalize ON DEVICE: np.asarray here would
                # be a blocking fetch + host normalize + full re-upload —
                # two transfers through a ~50ms-RTT relay for nothing
                # (round-5 review)
                if isinstance(x, jax.Array):
                    return images_to_unit_range(x)
                return _to_unit(np.asarray(x))

            if d1.type is np.uint8:
                img1 = normalize(img1)
            else:
                img2 = normalize(img2)
        if isinstance(img1, jax.Array) or isinstance(img2, jax.Array):
            both = jnp.concatenate([jnp.asarray(img1), jnp.asarray(img2)],
                                   axis=0)
        else:  # host inputs: concatenate host-side so the single upload
            # happens inside _embed at the compute dtype
            both = np.concatenate([np.asarray(img1), np.asarray(img2)],
                                  axis=0)
        raw, rect, _ = self._embed(both)
        emb = rect if rectified else raw
        return pair_cosine(emb[:n], emb[n:])

    def evaluate(self, batches: Iterable) -> Tuple[float, float]:
        """Full 10-fold protocol over {'img1','img2','label'} batches ->
        (acc_rectified, acc_raw), mirroring get_avg_accuracy."""
        from ffrnet_tpu.eval.runner import evaluate_pairs

        res_new, res_raw = evaluate_pairs(
            self.enc_params, self.enc_state, self.rec_params, self.rec_state,
            batches, cfg=self.cfg)
        return float(res_new.mean_accuracy), float(res_raw.mean_accuracy)

    def embed_files(self, paths, landmarks) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Full ingest: image files -> decode -> on-device align (auto warp)
        -> BGR [-1,1] -> (raw_embedding, rectified_embedding).

        paths: N image file paths; landmarks: (N, 5, 2) pixel (x, y) points
        in each source image. Mixed source sizes are padded to a common
        canvas (zero pixels = warp border). Alignment targets the 112x112
        ArcFace frame (reference points shifted +8 in x).
        """
        import numpy as np
        from PIL import Image

        imgs = [np.asarray(Image.open(p).convert("RGB"), dtype=np.float32)
                for p in paths]
        max_h = max(a.shape[0] for a in imgs)
        max_w = max(a.shape[1] for a in imgs)
        canvas = np.zeros((len(imgs), max_h, max_w, 3), np.float32)
        for i, a in enumerate(imgs):
            canvas[i, :a.shape[0], :a.shape[1]] = a
        from ffrnet_tpu.ops.align import ARCFACE_REF_PTS

        ref112 = ARCFACE_REF_PTS + np.asarray([8.0, 0.0], np.float32)
        aligned = self.align(canvas, np.asarray(landmarks, np.float32),
                             out_hw=(112, 112), ref_pts=ref112)
        x = (jnp.asarray(aligned)[..., ::-1] / 127.5) - 1.0  # RGB->BGR
        return self.embed(x)

    @staticmethod
    def align(images, landmarks, *, out_hw=(112, 96), ref_pts=None):
        """Batched on-device cp2tform alignment (uint8/float pixel values).

        Default crop is the canonical (H=112, W=96) frame the ARCFACE
        reference landmarks define (lfw/gen_lfw112x96.py:8-17); for a
        112x112 crop pass out_hw=(112, 112) with ref_pts shifted +8 in x
        (the usual 112x112 ArcFace convention)."""
        from ffrnet_tpu.ops.align import align_faces

        return align_faces(jnp.asarray(images), jnp.asarray(landmarks),
                           out_hw=out_hw, ref_pts=ref_pts)


@partial(jax.jit, static_argnames=("cfg",))
def _embed_impl(enc_params, enc_state, rec_params, rec_state, images, *, cfg):
    if images.dtype == jnp.uint8:  # normalize-on-device upload path
        from ffrnet_tpu.ops.nn import images_to_unit_range

        images = images_to_unit_range(images).astype(
            enc_params["input"]["conv"]["w"].dtype)
    featmap, raw, _ = irse.apply(enc_params, enc_state, images, training=False)
    (rect, rect_map), _ = recnet.apply(rec_params, rec_state, featmap,
                                       cfg=cfg, training=False)
    return raw, rect, rect_map
