"""Pallas fused affine-warp kernel (VMEM-resident bilinear resampling).

The XLA matmul warp (ops/align.py:warp_affine_mxu) is HBM-bound: the
(block, H) weights and (block, W, C) intermediate round-trip to HBM every
block. This kernel keeps the whole per-image pipeline in VMEM:

  grid (N, n_blocks); per step:
    wy = relu(1 - |iota_y - sy|)        (block, H)   built in-register
    per channel c (unrolled, channels live on sublanes):
      t_c  = wy @ img[c]                 (block, W)   MXU
      out_c = sum_x wx * t_c             (block,)     VPU lane-reduce
  i.e. HBM traffic = source image once + final pixels once.

Coordinates are dst->src (cv2 convention); the caller pads the source to
128-multiples with zero pixels, which reproduces the zero border (weights
that reach past the true extent land on zero-valued pixels). Matches
warp_affine / cv2.warpAffine bilinear semantics.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ffrnet_tpu.ops.align import _invert_2x3


def _kernel(sx_ref, sy_ref, img_ref, out_ref, *, compute_dtype):
    sx = sx_ref[0, 0]  # (block, 1)
    sy = sy_ref[0, 0]
    block = sx.shape[0]
    h = img_ref.shape[2]
    w = img_ref.shape[3]
    c = img_ref.shape[1]

    # Mosaic iota must be integer; cast to fp32 after.
    y_tab = lax.broadcasted_iota(jnp.int32, (block, h), 1).astype(jnp.float32)
    wy = jax.nn.relu(1.0 - jnp.abs(y_tab - sy)).astype(compute_dtype)
    x_tab = lax.broadcasted_iota(jnp.int32, (block, w), 1).astype(jnp.float32)
    wx = jax.nn.relu(1.0 - jnp.abs(x_tab - sx))

    for ch in range(c):  # channels unrolled; c is tiny (3)
        t = jnp.dot(wy, img_ref[0, ch].astype(compute_dtype),
                    preferred_element_type=jnp.float32)  # (block, w)
        out_ref[0, 0, ch, :] = jnp.sum(wx * t, axis=1)


@functools.partial(jax.jit, static_argnames=("out_hw", "block", "compute_dtype"))
def warp_affine_pallas(imgs, mats, *, out_hw: Tuple[int, int],
                       block: int = 1792, compute_dtype=jnp.bfloat16):
    """Batched cv2-convention affine warp. imgs (N, H, W, C) -> (N, *out_hw, C).

    compute_dtype: matmul operand dtype (bf16 = full MXU rate, ~1e-3
    relative pixel error; fp32 for parity-critical paths).
    """
    n, h, w, c = imgs.shape
    out_h, out_w = out_hw
    p_total = out_h * out_w
    inv = _invert_2x3(mats.astype(jnp.float32))

    ys, xs = jnp.meshgrid(jnp.arange(out_h, dtype=jnp.float32),
                          jnp.arange(out_w, dtype=jnp.float32), indexing="ij")
    dst = jnp.stack([xs.ravel(), ys.ravel(), jnp.ones(p_total, jnp.float32)],
                    axis=-1)
    src = jnp.einsum("nij,pj->npi", inv, dst)  # (N, P, 2) as (x, y)
    pad_p = (-p_total) % block
    # pad with -2 (zero-weight everywhere) rather than 0 (samples pixel 0,0)
    src = jnp.pad(src, ((0, 0), (0, pad_p), (0, 0)), constant_values=-2.0)
    n_blocks = (p_total + pad_p) // block
    src = src.reshape(n, n_blocks, block, 2)
    sx = src[..., 0:1]  # (N, nb, block, 1) — trailing unit dim keeps the
    sy = src[..., 1:2]  # block spec lane/sublane-legal


    h_pad = -h % 128
    w_pad = -w % 128
    img_cyx = jnp.pad(imgs, ((0, 0), (0, h_pad), (0, w_pad), (0, 0))
                      ).transpose(0, 3, 1, 2)  # (N, C, Hp, Wp)
    hp, wp = h + h_pad, w + w_pad

    interpret = jax.devices()[0].platform != "tpu"
    out = pl.pallas_call(
        functools.partial(_kernel, compute_dtype=compute_dtype),
        grid=(n, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, block, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, hp, wp), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, c, block), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n_blocks, c, block), jnp.float32),
        interpret=interpret,
    )(sx, sy, img_cyx)

    out = out.transpose(0, 2, 1, 3).reshape(n, c, n_blocks * block)
    out = out[:, :, :p_total].reshape(n, c, out_h, out_w)
    return out.transpose(0, 2, 3, 1).astype(imgs.dtype)
