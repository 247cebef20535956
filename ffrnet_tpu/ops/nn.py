"""Primitive neural-net ops, NHWC, PyTorch-parity semantics.

These are the building blocks the model layer is assembled from. Semantics
(epsilons, momentum direction, pooling edge behavior, broadcast axes) are
matched to the PyTorch ops the FFR-Net reference uses so that imported
`.pth` weights reproduce reference numerics to fp32 tolerance
(reference: /root/reference/pretrain/model_ir_se50.py, models/recnet.py).

Layout convention: image tensors are NHWC (TPU-native; channels on the
128-lane axis). Conv kernels are HWIO. Linear weights are kept in the
PyTorch (out_features, in_features) orientation so checkpoint import is a
straight copy; `linear` contracts accordingly.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# Initializers (PyTorch-equivalent)
# ---------------------------------------------------------------------------


def kaiming_normal(key, shape, fan_in, dtype=jnp.float32):
    """He-normal, gain for a=0 (matches torch.nn.init.kaiming_normal_ fan_in)."""
    std = math.sqrt(2.0 / fan_in)
    return std * jax.random.normal(key, shape, dtype)


def kaiming_uniform(key, shape, fan_in, a=math.sqrt(5.0), dtype=jnp.float32):
    """Torch's default Conv/Linear weight init (kaiming_uniform with a=sqrt(5))."""
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_uniform(key, shape, fan_in, fan_out, dtype=jnp.float32):
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def bias_uniform(key, shape, fan_in, dtype=jnp.float32):
    """Torch's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# ---------------------------------------------------------------------------
# Convolution / linear
# ---------------------------------------------------------------------------

_CONV_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(x, w, b=None, *, stride=1, padding=0, groups=1):
    """2-D convolution, NHWC x HWIO -> NHWC.

    padding: int (symmetric zero pad), string ('SAME'/'VALID'), or explicit
    [(lo, hi), (lo, hi)].
    """
    if isinstance(w, dict):  # int8-quantized weight leaf (ops/quant.py)
        from ffrnet_tpu.ops import quant

        return quant.conv2d_int8(x, w, b, stride=stride, padding=padding,
                                 groups=groups)
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        dimension_numbers=_CONV_DN,
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if b is not None:
        y = y + b.reshape((1, 1, 1, -1)).astype(y.dtype)
    return y


def linear(x, w, b=None):
    """Dense layer with torch-layout weight (out_features, in_features)."""
    if isinstance(w, dict):  # int8-quantized weight leaf (ops/quant.py)
        from ffrnet_tpu.ops import quant

        return quant.linear_int8(x, w, b)
    y = jnp.matmul(x, w.T, preferred_element_type=x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def reflect_pad(x, pad):
    """ReflectionPad2d on NHWC."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def batch_norm(
    x,
    scale,
    bias,
    running_mean,
    running_var,
    *,
    training: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
):
    """BatchNorm matching torch.nn.BatchNorm{1,2}d.

    Channels are the LAST axis (NHWC / NC). Returns
    (y, new_running_mean, new_running_var); running stats pass through
    unchanged in eval mode. Training normalizes with biased batch variance
    and updates running_var with the unbiased estimate (torch semantics).
    """
    c = x.shape[-1]
    reduce_axes = tuple(range(x.ndim - 1))
    if training:
        # accumulate batch statistics in fp32 (bf16 activations would lose
        # precision in the variance reduction)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=reduce_axes)
        var = jnp.var(xf, axis=reduce_axes)
        n = x.size // c
        unbiased = var * (n / max(n - 1, 1))
        rdtype = running_mean.dtype
        new_mean = ((1 - momentum) * running_mean.astype(jnp.float32)
                    + momentum * mean).astype(rdtype)
        new_var = ((1 - momentum) * running_var.astype(jnp.float32)
                   + momentum * unbiased).astype(rdtype)
    else:
        mean, var = running_mean, running_var
        new_mean, new_var = running_mean, running_var
    inv = lax.rsqrt(var.astype(jnp.float32) + eps).astype(x.dtype)
    y = (x - mean.astype(x.dtype)) * (inv * scale.astype(x.dtype)) + bias.astype(x.dtype)
    return y, new_mean, new_var


def instance_norm(x, scale, bias, *, eps: float = 1e-5):
    """InstanceNorm2d(affine=True) on NHWC (per-sample, per-channel)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    y = (x - mean) * lax.rsqrt(var + eps)
    return y * scale + bias


def group_norm(x, scale, bias, *, groups: int = 32, eps: float = 1e-5):
    """GroupNorm on NHWC."""
    n, h, w, c = x.shape
    g = groups
    xg = x.reshape(n, h, w, g, c // g)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    y = ((xg - mean) * lax.rsqrt(var + eps)).reshape(n, h, w, c)
    return y * scale + bias


def pixel_norm(x, *, eps: float = 1e-12):
    """F.normalize(p=2) over the channel (last) axis."""
    return l2_normalize(x, axis=-1, eps=eps)


def layer_norm(x, scale, bias, *, eps: float = 1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps) * scale + bias


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def prelu(x, slope, *, axis: int):
    """PReLU with per-channel slope applied along `axis` (torch: dim 1)."""
    shape = [1] * x.ndim
    shape[axis] = slope.shape[0]
    a = slope.reshape(shape).astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


def leaky_relu(x, negative_slope=0.2):
    return jnp.where(x >= 0, x, negative_slope * x)


def relu(x):
    return jnp.maximum(x, 0)


def selu(x):
    return jax.nn.selu(x)


def sigmoid(x):
    return jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# Pooling / misc
# ---------------------------------------------------------------------------


def stride_pool(x, stride):
    """torch MaxPool2d(kernel_size=1, stride=s): pure stride slicing (NHWC)."""
    if stride == 1:
        return x
    return x[:, ::stride, ::stride, :]


def global_avg_pool(x, keepdims=False):
    """AdaptiveAvgPool2d(1) on NHWC."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def avg_pool(x, window, stride=None):
    """AvgPool2d on NHWC (no padding)."""
    if isinstance(window, int):
        window = (window, window)
    stride = stride or window
    if isinstance(stride, int):
        stride = (stride, stride)
    y = lax.reduce_window(
        x, 0.0, lax.add, (1, *window, 1), (1, *stride, 1), "VALID"
    )
    return y / (window[0] * window[1])


def dropout(x, rate, *, rng=None, training=False):
    if not training or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def l2_normalize(x, axis=-1, eps: float = 1e-12):
    """F.normalize semantics: x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def l2_norm_div(x, axis=-1):
    """Reference `l2_norm`: plain x / ||x|| with no epsilon
    (pretrain/model_ir_se50.py:13-16)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / norm


def tree_cast_floats(tree, dtype):
    """Cast floating leaves of a pytree to `dtype` (mixed-precision helper);
    integer/bool leaves pass through unchanged. Int8-quantized weight dicts
    (ops/quant.py) pass through WHOLE: their f32 'scale'/'x_scale' dequant
    factors are part of the int8 numerics, and casting them to bf16 would
    silently degrade int8 accuracy (they never ride a matmul, so keeping
    them f32 costs nothing)."""
    if dtype is None:
        return tree
    from ffrnet_tpu.ops import quant

    return jax.tree.map(
        lambda x: x if quant.is_quantized(x) else (
            x.astype(dtype)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x),
        tree, is_leaf=quant.is_quantized)


def images_to_unit_range(x):
    """Device-side ToTensor+Normalize(0.5, 0.5): uint8 NHWC -> float32 in
    [-1, 1], the same IEEE ops as the host loader's _to_unit
    (data/datasets.py): bitwise-identical when dispatched eagerly; under
    jit, XLA may fuse the two divides into one multiply, shifting pixel
    values by at most 1 ulp (~6e-8) — far below every tolerance in the
    pipeline. Float inputs (already normalized on host) pass through
    unchanged — callers can accept either layout; shipping uint8 moves 4x
    fewer bytes host->device (the measured train-driver bottleneck on
    relayed hosts). Reference transform: data/dataloader.py:15-19."""
    if x.dtype == jnp.uint8:
        return (x.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    return x


def upsample_nearest_2x(x):
    """F.interpolate(scale_factor=2, mode='nearest') on NHWC."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)
