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


# ---------------------------------------------------------------------------
# Column-band fused warp: the production kernel
# ---------------------------------------------------------------------------


def _band_kernel(inv_ref, img_ref, out_ref, *, out_h, bw, cw, hp, wp):
    """One (image, output-column-band) step, fully VMEM-resident.

    Channels are folded into lanes (img row layout = x-major * 4), so the
    y-interpolation is ONE well-shaped MXU matmul (M=out_h*bw, K=hp,
    N=cw*4) and the x-interpolation a VPU multiply + 4 masked lane
    reductions. Coordinates are computed in-kernel from the inverse
    transform scalars in true fp32 (elementwise — never rounded through
    the MXU), which makes this kernel MORE coordinate-accurate than the
    einsum-based XLA paths were before ops/align._src_coords.
    """
    tp = out_h * bw
    cw4 = cw * 4
    j = pl.program_id(1)
    i00, i01, i02 = inv_ref[0, 0, 0], inv_ref[0, 0, 1], inv_ref[0, 0, 2]
    i10, i11, i12 = inv_ref[0, 0, 3], inv_ref[0, 0, 4], inv_ref[0, 0, 5]
    pix = lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
    yy = (pix // bw).astype(jnp.float32)
    xx = (pix % bw + j * bw).astype(jnp.float32)
    sx = i00 * xx + i01 * yy + i02  # (tp, 1)
    sy = i10 * xx + i11 * yy + i12
    # window start: cover min(sx)-1, quantized to 32 px (=128 lanes) so the
    # dynamic lane slice is provably tile-aligned
    x0 = jnp.floor(jnp.min(sx)).astype(jnp.int32) - 1
    x0 = jnp.clip((x0 // 32) * 32, 0, wp - cw)
    win = img_ref[0, :, pl.ds(pl.multiple_of(x0 * 4, 128), cw4)]  # (hp, cw4)
    yg = lax.broadcasted_iota(jnp.int32, (1, hp), 1).astype(jnp.float32)
    wy = jnp.maximum(1.0 - jnp.abs(yg - sy), 0.0)  # (tp, hp) 2-tap rows
    t = jnp.dot(wy.astype(win.dtype), win,
                preferred_element_type=jnp.float32)  # (tp, cw4)  MXU
    lane = lax.broadcasted_iota(jnp.int32, (1, cw4), 1)
    xg = (lane // 4).astype(jnp.float32) + x0.astype(jnp.float32)
    wx = jnp.maximum(1.0 - jnp.abs(xg - sx), 0.0)  # (tp, cw4)
    prod = t * wx
    cols = [jnp.sum(jnp.where(lane % 4 == ch, prod, 0.0), axis=1,
                    keepdims=True) for ch in range(4)]
    out_ref[0, 0] = jnp.concatenate(cols, axis=1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_hw", "band_w", "crop_w"))
def warp_affine_pallas_band(imgs, mats, *, out_hw: Tuple[int, int],
                            band_w: int = 16, crop_w: int = 64):
    """Fused column-band warp (the fast path; ~3x the XLA column-band warp).

    imgs (N, H, W, C<=4) -> (N, *out_hw, C); cv2 dst->src convention.

    CORRECTNESS BOUND: each band of `band_w` output columns must draw from
    at most `crop_w - 32` source columns (32 = window-quantization slack):
    |sc|*(band_w-1) + |ss|*(out_h-1) + 3 + 32 <= crop_w, with (sc, ss) the
    dst->src linear coefficients. Use ops.align.auto_band_crop_w to pick
    crop_w from concrete transforms, or the unconditional kernels when the
    bound fails. crop_w must be a multiple of 32.
    """
    n, h, w, c = imgs.shape
    out_h, out_w = out_hw
    if crop_w % 32:
        raise ValueError("crop_w must be a multiple of 32")
    hp, wp = h + (-h % 8), w + (-w % 32)
    wp = max(wp, crop_w)
    imgs_p = jnp.pad(imgs, ((0, 0), (0, hp - h), (0, wp - w), (0, 4 - c)))
    img_flat = imgs_p.reshape(n, hp, wp * 4)
    inv = _invert_2x3(mats.astype(jnp.float32))
    inv_flat = jnp.pad(inv.reshape(n, 6), ((0, 0), (0, 2))).reshape(n, 1, 8)
    nb = -(-out_w // band_w)
    tp = out_h * band_w

    interpret = jax.devices()[0].platform != "tpu"
    out = pl.pallas_call(
        functools.partial(_band_kernel, out_h=out_h, bw=band_w, cw=crop_w,
                          hp=hp, wp=wp),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hp, wp * 4), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tp, 4), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, nb, tp, 4), imgs.dtype),
        interpret=interpret,
    )(inv_flat, img_flat)
    out = out.reshape(n, nb, out_h, band_w, 4).transpose(0, 2, 1, 3, 4)
    return out.reshape(n, out_h, nb * band_w, 4)[:, :, :out_w, :c]
