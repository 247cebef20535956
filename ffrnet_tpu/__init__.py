"""ffrnet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) face-recognition framework.

A from-scratch rebuild of the capabilities of FFR-Net (haoosz/FFR-Net,
ICIP 2022, arXiv 2202.07358): a frozen IR-SE50 face encoder plus a trainable
feature-rectification network (RecNet) that rectifies 7x7x512 face features in
both spatial and channel dimensions, trained on paired clean/masked
CASIA-WebFace with a four-part objective (self-similarity, triplet, identity,
CosFace classification) and evaluated with 10-fold LFW verification under
0/1/2 masks.

Everything here is designed TPU-first: NHWC layouts feeding the MXU, fused
Pallas kernels for the self-similarity/rectification hot path, batched
on-device cp2tform alignment, a fully vectorized on-device verification sweep,
and pjit/shard_map data+tensor parallelism over a `jax.sharding.Mesh`.

Subpackages
-----------
models/      IR-SE50 backbone, RecNet, margin heads, MobileFaceNet
ops/         primitive NN ops, self-similarity, alignment, Pallas kernels
parallel/    mesh construction, sharding rules, distributed train step
data/        CASIA / LFW txt-list dataset protocol, host pipeline
training/    losses, optimizers (AdaBound), LR schedules, trainer
checkpoint/  torch-free .pth(.gzip) reader/writer, param conversion, native ckpts
eval/        on-device LFW verification protocol, attention visualization
utils/       logging, timing, image helpers
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (keeps `import ffrnet_tpu` light)
    if name == "FFRNet":
        from ffrnet_tpu.api import FFRNet

        return FFRNet
    raise AttributeError(f"module 'ffrnet_tpu' has no attribute {name!r}")
