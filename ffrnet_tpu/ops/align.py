"""Batched on-device face alignment: cp2tform similarity solve + affine warp.

The reference aligns faces on CPU, one at a time: a NumPy port of MATLAB
cp2tform solves a 4-unknown least-squares system per face
(lfw/matlab_cp2tform.py:223-432) and cv2.warpAffine crops to 96x112
(lfw/gen_lfw112x96.py:6-17). Here the whole pipeline is batched jnp running
on device, feeding the encoder directly:

  * `similarity_transform` solves the nonreflective system in closed form
    from the 4x4 normal equations (the reference's lstsq on the structured
    (2K, 4) matrix reduces exactly to this), evaluates the Y-reflected
    variant too, and picks the lower-residual solution per batch element
    (<= prefers nonreflective, matching findSimilarity,
    lfw/matlab_cp2tform.py:340-432).
  * `warp_affine` applies the resulting 2x3 matrices with bilinear sampling
    and constant-zero borders, matching cv2.warpAffine's default
    dst->src inverse mapping semantics.

ARCFACE_REF_PTS are the canonical 5-point destination landmarks for the
96x112 crop (lfw/gen_lfw112x96.py:8-9).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Canonical ArcFace reference landmarks for a (W=96, H=112) crop.
ARCFACE_REF_PTS = np.array(
    [[30.2946, 51.6963], [65.5318, 51.5014], [48.0252, 71.7366],
     [33.5493, 92.3655], [62.7299, 92.2041]], dtype=np.float32)


def _solve_nonreflective(uv, xy):
    """Closed-form nonreflective similarity fit, batched.

    Solves for r = (sc, ss, tx, ty) minimizing ||X r - U||^2 where X is the
    stacked [x y 1 0; y -x 0 1] system (lfw/matlab_cp2tform.py:297-312);
    returns the 3x3 matrix trans mapping uv -> xy row-vectors
    ([x, y, 1] = [u, v, 1] @ trans).

    uv, xy: (..., K, 2).
    """
    x, y = xy[..., 0], xy[..., 1]
    u, v = uv[..., 0], uv[..., 1]
    k = jnp.asarray(x.shape[-1], x.dtype)

    sxx = jnp.sum(x * x + y * y, axis=-1)
    sx = jnp.sum(x, axis=-1)
    sy = jnp.sum(y, axis=-1)
    zero = jnp.zeros_like(sx)
    kk = jnp.broadcast_to(k, sx.shape)
    # X^T X  (4x4, structured)
    xtx = jnp.stack([
        jnp.stack([sxx, zero, sx, sy], axis=-1),
        jnp.stack([zero, sxx, sy, -sx], axis=-1),
        jnp.stack([sx, sy, kk, zero], axis=-1),
        jnp.stack([sy, -sx, zero, kk], axis=-1),
    ], axis=-2)
    # X^T U
    xtu = jnp.stack([
        jnp.sum(x * u + y * v, axis=-1),
        jnp.sum(y * u - x * v, axis=-1),
        jnp.sum(u, axis=-1),
        jnp.sum(v, axis=-1),
    ], axis=-1)
    r = jnp.linalg.solve(xtx, xtu[..., None])[..., 0]
    sc, ss, tx, ty = r[..., 0], r[..., 1], r[..., 2], r[..., 3]

    # Tinv maps xy -> uv; trans = inv(Tinv) with last column [0, 0, 1]
    # (lfw/matlab_cp2tform.py:320-335). Invert the 2x2 + translation directly.
    det = sc * sc + ss * ss
    a = sc / det
    b = -ss / det  # inv([[sc, -ss], [ss, sc]]) = [[sc, ss], [-ss, sc]] / det
    # trans linear part L satisfies Linv @ L = I with Linv = [[sc,-ss],[ss,sc]]
    # (row-vector convention); translation row solves [tx ty] @ L + t = 0.
    l00, l01 = a, -b
    l10, l11 = b, a
    t0 = -(tx * l00 + ty * l10)
    t1 = -(tx * l01 + ty * l11)
    zero = jnp.zeros_like(a)
    one = jnp.ones_like(a)
    trans = jnp.stack([
        jnp.stack([l00, l01, zero], axis=-1),
        jnp.stack([l10, l11, zero], axis=-1),
        jnp.stack([t0, t1, one], axis=-1),
    ], axis=-2)
    return trans


def _tformfwd(trans, uv):
    """Apply row-vector transform: (..., K, 2) @ (..., 3, 3) -> (..., K, 2)."""
    ones = jnp.ones(uv.shape[:-1] + (1,), uv.dtype)
    homo = jnp.concatenate([uv, ones], axis=-1)
    # HIGHEST: keep fp32 accuracy on TPU (default precision would round
    # point coordinates to bf16 through the MXU)
    out = jnp.einsum("...ki,...ij->...kj", homo, trans,
                     precision=jax.lax.Precision.HIGHEST)
    return out[..., :2]


def similarity_transform(src_pts, dst_pts, *, reflective: bool = True):
    """Batched cp2tform: returns 3x3 trans mapping src -> dst (row vectors).

    src_pts, dst_pts: (..., K, 2). With reflective=True both the direct and
    Y-reflected fits are evaluated and the lower-residual one returned
    (ties keep the nonreflective fit, lfw/matlab_cp2tform.py:425-430).
    """
    trans1 = _solve_nonreflective(src_pts, dst_pts)
    if not reflective:
        return trans1

    reflect = jnp.asarray(
        [[-1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], src_pts.dtype)
    xy_r = dst_pts * jnp.asarray([-1.0, 1.0], src_pts.dtype)
    trans2 = _solve_nonreflective(src_pts, xy_r) @ reflect

    norm1 = jnp.linalg.norm(
        (_tformfwd(trans1, src_pts) - dst_pts).reshape(*src_pts.shape[:-2], -1),
        axis=-1)
    norm2 = jnp.linalg.norm(
        (_tformfwd(trans2, src_pts) - dst_pts).reshape(*src_pts.shape[:-2], -1),
        axis=-1)
    pick1 = (norm1 <= norm2)[..., None, None]
    return jnp.where(pick1, trans1, trans2)


def cv2_transform(src_pts, dst_pts, *, reflective: bool = True):
    """2x3 matrices for column-vector convention:
    [x, y]^T = M @ [u, v, 1]^T  (get_similarity_transform_for_cv2,
    lfw/matlab_cp2tform.py:503-537)."""
    trans = similarity_transform(src_pts, dst_pts, reflective=reflective)
    return jnp.swapaxes(trans[..., :, 0:2], -1, -2)


def _invert_2x3(m):
    """Invert (N, 2, 3) affine matrices (dst->src for sampling)."""
    a = m[..., :2]  # (N, 2, 2)
    t = m[..., 2]  # (N, 2)
    det = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    inv00 = a[..., 1, 1] / det
    inv01 = -a[..., 0, 1] / det
    inv10 = -a[..., 1, 0] / det
    inv11 = a[..., 0, 0] / det
    ainv = jnp.stack([
        jnp.stack([inv00, inv01], axis=-1),
        jnp.stack([inv10, inv11], axis=-1),
    ], axis=-2)
    tinv = -jnp.einsum("...ij,...j->...i", ainv, t,
                       precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([ainv, tinv[..., None]], axis=-1)


def _src_coords(inv, xs, ys):
    """dst->src pixel coordinates, elementwise on the VPU.

    Deliberately NOT an einsum/matmul: a coordinate transform lowered to
    the MXU rounds its fp32 operands to bf16 at JAX's default matmul
    precision, which costs ~0.5px of coordinate accuracy at src coords
    ~200 (bf16 ulp at 165 is 1.0) — measured on v5e while validating the
    Pallas band-warp kernel. Elementwise multiply-adds stay true fp32.

    inv: (N, 2, 3); xs, ys: any shape. Returns (sx, sy) of (N, *xs.shape).
    """
    expand = (slice(None),) + (None,) * xs.ndim

    def row(r):
        return (inv[:, r, 0][expand] * xs + inv[:, r, 1][expand] * ys
                + inv[:, r, 2][expand])

    return row(0), row(1)


@partial(jax.jit, static_argnames=("out_hw", "block", "crop_rows"))
def warp_affine_mxu(imgs, mats, *, out_hw: Tuple[int, int], block: int = 1792,
                    crop_rows: int = 0):
    """Gather-free bilinear affine warp that runs on the MXU.

    TPUs do dense math fast and random gathers slowly. Bilinear weights
    factorize per output pixel p as w(p, y, x) = wy(p, y) * wx(p, x) with
    only two taps each, so the warp becomes

        t[p, x, c]  = sum_y wy[p, y] * img[y, x, c]     (batched matmul, MXU)
        out[p, c]   = sum_x wx[p, x] * t[p, x, c]       (fused mul+reduce, VPU)

    with wy/wx built on the fly from iota: relu(1 - |grid - src_coord|) is
    exactly the 2-tap linear-interpolation kernel, and out-of-range
    coordinates get zero weight = cv2's constant-zero border. Output pixels
    are processed in `block`-sized chunks (lax.map) to bound the (B, block,
    H_in) weight / (B, block, W_in, C) intermediate footprint.

    crop_rows > 0 contracts only a `crop_rows`-tall source band per pixel
    block (selected by dynamic slice from the block's min source-y) —
    halves the matmul for typical face-alignment transforms. CORRECTNESS
    BOUND: the band must cover the block's full source-y extent
    (block/out_w output rows x scale + rotation shear); use
    `warp_rows_needed(mats, out_hw, block)` to check, or leave 0 for the
    exact unconditional path.

    Same semantics as `warp_affine` (cv2 dst->src inverse mapping).
    """
    if not jnp.issubdtype(imgs.dtype, jnp.floating):
        # integer images: the bilinear weights below are cast to the image
        # dtype for MXU rate — on uint8 that truncates every fractional
        # weight in [0,1) to 0 and corrupts the crop (measured 231/255 max
        # pixel error; round-5 review). Compute in f32; the output is then
        # float, matching warp_affine_tiled's behavior on integer input.
        imgs = imgs.astype(jnp.float32)
    n, h, w, c = imgs.shape
    out_h, out_w = out_hw
    p_total = out_h * out_w
    inv = _invert_2x3(mats.astype(jnp.float32))

    ys, xs = jnp.meshgrid(
        jnp.arange(out_h, dtype=jnp.float32),
        jnp.arange(out_w, dtype=jnp.float32), indexing="ij")
    sx, sy = _src_coords(inv, xs.ravel(), ys.ravel())  # (N, P) each
    src = jnp.stack([sx, sy], axis=-1)  # (N, P, 2): (x, y)

    pad = (-p_total) % block
    # pad coords with a huge positive value: zero interpolation weight AND
    # never the block min (a 0 pad would drag min(sy) down and anchor the
    # crop_rows band away from the real pixels in a partially-padded block)
    src = jnp.pad(src, ((0, 0), (0, pad), (0, 0)), constant_values=1e6)
    src_blocks = src.reshape(n, -1, block, 2).transpose(1, 0, 2, 3)

    # Pad source dims to lane multiples — unaligned K/N tile badly on the
    # MXU. Padded rows/cols are zero pixels, which matches the zero border
    # (weights beyond the original extent hit zero-valued pixels).
    h_pad = -h % 128
    w_pad = -w % 128
    if h_pad or w_pad:
        imgs = jnp.pad(imgs, ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))
    hp, wp = h + h_pad, w + w_pad
    y_grid = jnp.arange(hp, dtype=jnp.float32)
    x_grid = jnp.arange(wp, dtype=jnp.float32)
    img_flat = imgs.reshape(n, hp, wp * c)
    h, w = hp, wp

    def one_block(src_b):  # (N, block, 2)
        sx, sy = src_b[..., 0], src_b[..., 1]
        if crop_rows:
            start = jnp.clip(jnp.floor(jnp.min(sy, axis=1)).astype(jnp.int32) - 1,
                             0, h - crop_rows)  # (N,)
            band = jax.vmap(
                lambda img, s: jax.lax.dynamic_slice(
                    img, (s, 0), (crop_rows, img.shape[1])))(img_flat, start)
            y_rel = jnp.arange(crop_rows, dtype=jnp.float32)
            wy = jax.nn.relu(1.0 - jnp.abs(
                y_rel[None, None, :] + start[:, None, None].astype(jnp.float32)
                - sy[..., None]))
            t = jnp.einsum("npy,nyf->npf", wy.astype(imgs.dtype), band,
                           preferred_element_type=jnp.float32)
        else:
            wy = jax.nn.relu(1.0 - jnp.abs(y_grid[None, None, :] - sy[..., None]))
            # matmul in the image dtype (bf16 -> full MXU rate), fp32 accum
            t = jnp.einsum("npy,nyf->npf", wy.astype(imgs.dtype), img_flat,
                           preferred_element_type=jnp.float32)
        # keep the big (N, block, W, C) intermediate in the image dtype —
        # this stage is HBM-bandwidth-bound
        t = t.astype(imgs.dtype).reshape(n, block, w, c)
        wx = jax.nn.relu(1.0 - jnp.abs(x_grid[None, None, :] - sx[..., None]))
        # broadcast-mul + reduce (fuses on the VPU; an einsum here would
        # lower to n*block tiny batched dots and tile pathologically)
        return jnp.sum(wx.astype(imgs.dtype)[..., None] * t, axis=2,
                       dtype=jnp.float32)

    out = jax.lax.map(one_block, src_blocks)  # (nblk, N, block, C)
    out = out.transpose(1, 0, 2, 3).reshape(n, p_total + pad, c)[:, :p_total]
    return out.reshape(n, out_h, out_w, c).astype(imgs.dtype)


@partial(jax.jit, static_argnames=("out_hw", "tile", "crop", "serial",
                                   "compute_dtype", "y_int8"))
def warp_affine_tiled(imgs, mats, *, out_hw: Tuple[int, int],
                      tile: Tuple[int, int] = (56, 16),
                      crop: Tuple[int, int] = (128, 128),
                      serial: bool = True,
                      compute_dtype=None, y_int8: bool = False):
    """2-D tiled MXU warp: crops BOTH source axes per output tile.

    Processes the output in (tile_h, tile_w) tiles; each tile dynamically
    slices a (crop_h, crop_w) source window (from the tile's min source
    coords) and runs the same matmul + fused-reduce bilinear scheme as
    warp_affine_mxu inside the window — halving both the contraction and
    the x-interp intermediates vs row-only cropping.

    serial=True runs tiles sequentially (lax.map: bounds the live
    intermediate footprint to one tile). serial=False stacks every tile's
    window and runs ONE batched einsum over (N, n_tiles) — more live
    memory, no sequential dispatch. MEASURED OUTCOME (tools/bench_warp.py,
    BASELINE.md round 4): serial full-height column bands win everywhere;
    batched is uniformly ~1.3-3x slower and short tiles lose in both
    modes (XLA fuses the iota-built y-weights into the einsum, so
    shrinking crop_h saves nothing while per-tile window re-reads grow).
    serial=False is kept as the documented rejected branch.

    CORRECTNESS BOUND: each tile's source extent must fit `crop`; for a
    tile of (th, tw) that is |inv11|*(th-1) + |inv10|*(tw-1) + 3 source
    rows and |inv00|*(tw-1) + |inv01|*(th-1) + 3 cols. The defaults cover
    250->112 face alignment with modest rotation; use warp_rows_needed-style
    checks for unusual transforms, or warp_affine_mxu(crop_rows=0) for the
    unconditional path.

    Integer sources (the loader's raw uint8 pixels, 0..255): pass the
    uint8 array directly and set `compute_dtype` (e.g. jnp.bfloat16) —
    the source then lives in HBM at 1 byte/pixel (4x less read traffic
    than the reference-parity float path; the tiled windows re-read the
    source once per overlapping band) and each tile's window casts to
    `compute_dtype` in-register. Bit-identical to warping the same
    values pre-cast to `compute_dtype`. Output is `compute_dtype` pixels
    (still 0..255 — callers normalize), never quantized back to uint8.

    `y_int8=True` additionally runs the y-interp contraction — the MXU
    leg — in int8: pixels center to int8 (p-128), y-weights quantize to
    round(127*wy), the einsum accumulates in int32 (2x MXU rate vs
    bf16), and the exact identity sum_y (wq/127)(p-128) + 128*(sum wq)/127
    = sum_y (wq/127) p reconstructs pixels in float before the (exact,
    float) x-stage. PIXEL-ERROR BOUND: bilinear has <=2 taps/row with
    weights summing to 1, each quantized within 0.5/127 — worst-case
    |err| <= 2 * (0.5/127) * 255 = 2.01 pixel LSB, and the convex
    x-stage cannot amplify it (tests/test_warp_int8.py measures ~<=1.6
    observed). Requires pixel values on the 0..255 integer grid (uint8,
    or a float array holding integers) and serial=True.
    """
    n, h, w, c = imgs.shape
    if compute_dtype is not None:
        cdtype = jnp.dtype(compute_dtype)
    elif jnp.issubdtype(imgs.dtype, jnp.floating):
        cdtype = imgs.dtype
    else:
        cdtype = jnp.dtype(jnp.float32)
    if y_int8 and not serial:
        raise ValueError("y_int8 warp requires serial=True")
    out_h, out_w = out_hw
    th, tw = tile
    crop_h, crop_w = crop
    pad_h = (-out_h) % th
    pad_w = (-out_w) % tw
    oh, ow = out_h + pad_h, out_w + pad_w
    nty, ntx = oh // th, ow // tw
    inv = _invert_2x3(mats.astype(jnp.float32))

    ys, xs = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32),
                          jnp.arange(ow, dtype=jnp.float32), indexing="ij")
    valid = (ys < out_h) & (xs < out_w)
    sx, sy = _src_coords(inv, xs, ys)
    src = jnp.stack([sx, sy], axis=-1)  # (N, oh, ow, 2)
    # out-of-frame padding pixels: push coords far positive (zero weight,
    # never the tile min)
    src = jnp.where(valid[None, :, :, None], src, 1e6)
    # -> (N, nty, ntx, th*tw, 2)
    src = src.reshape(n, nty, th, ntx, tw, 2).transpose(0, 1, 3, 2, 4, 5)
    src = src.reshape(n, nty * ntx, th * tw, 2)

    # pad source to crop-sliceable extent with zero pixels
    h_pad = max(-h % 128, crop_h - h if crop_h > h else 0)
    w_pad = max(-w % 128, crop_w - w if crop_w > w else 0)
    imgs_p = jnp.pad(imgs, ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))
    hp, wp = h + h_pad, w + w_pad

    tp = th * tw

    def one_tile(src_t):  # (N, tp, 2)
        sx, sy = src_t[..., 0], src_t[..., 1]
        # full-extent axes skip the per-image dynamic_slice entirely (the
        # column-band configuration auto_warp_config picks has
        # crop_h == padded height, making the y window the whole image —
        # measured ~3x faster than square tiles on v5e, BASELINE.md)
        if crop_h >= hp:
            sy_start = jnp.zeros((n,), jnp.int32)
        else:
            sy_start = jnp.clip(
                jnp.floor(jnp.min(sy, axis=1)).astype(jnp.int32) - 1,
                0, hp - crop_h)  # (N,)
        if crop_w >= wp:
            sx_start = jnp.zeros((n,), jnp.int32)
        else:
            sx_start = jnp.clip(
                jnp.floor(jnp.min(sx, axis=1)).astype(jnp.int32) - 1,
                0, wp - crop_w)
        if crop_h >= hp and crop_w >= wp:
            window = imgs_p
        elif crop_h >= hp:
            window = jax.vmap(
                lambda img, x0: jax.lax.dynamic_slice(
                    img, (0, x0, 0), (crop_h, crop_w, c))
            )(imgs_p, sx_start)
        else:
            window = jax.vmap(
                lambda img, y0, x0: jax.lax.dynamic_slice(
                    img, (y0, x0, 0), (crop_h, crop_w, c))
            )(imgs_p, sy_start, sx_start)  # (N, crop_h, crop_w, c)
        y_rel = jnp.arange(crop_h, dtype=jnp.float32)
        wy = jax.nn.relu(1.0 - jnp.abs(
            y_rel[None, None, :] + sy_start[:, None, None].astype(jnp.float32)
            - sy[..., None]))
        if y_int8:
            wq = jnp.round(wy * 127.0).astype(jnp.int8)  # (N, tp, crop_h)
            wi8 = (window.astype(jnp.int16) - 128).astype(jnp.int8)
            t32 = jnp.einsum("npy,nyf->npf", wq,
                             wi8.reshape(n, crop_h, crop_w * c),
                             preferred_element_type=jnp.int32)
            wsum = jnp.sum(wq.astype(jnp.int32), axis=-1)  # (N, tp)
            t = ((t32.astype(jnp.float32)
                  + 128.0 * wsum[..., None].astype(jnp.float32))
                 * jnp.float32(1.0 / 127.0))
        else:
            win_flat = window.astype(cdtype).reshape(n, crop_h, crop_w * c)
            t = jnp.einsum("npy,nyf->npf", wy.astype(cdtype), win_flat,
                           preferred_element_type=jnp.float32)
        t = t.astype(cdtype).reshape(n, tp, crop_w, c)
        x_rel = jnp.arange(crop_w, dtype=jnp.float32)
        wx = jax.nn.relu(1.0 - jnp.abs(
            x_rel[None, None, :] + sx_start[:, None, None].astype(jnp.float32)
            - sx[..., None]))
        return jnp.sum(wx.astype(cdtype)[..., None] * t, axis=2,
                       dtype=jnp.float32)  # (N, tp, c)

    if serial:
        # (ntiles, N, tp, c) -> (N, ntiles, tp, c)
        out = jax.lax.map(one_tile, src.transpose(1, 0, 2, 3))
        out = out.transpose(1, 0, 2, 3)
    else:
        sxa, sya = src[..., 0], src[..., 1]  # (N, T, tp)
        n_tiles = src.shape[1]
        if crop_h >= hp:
            sy_start = jnp.zeros((n, n_tiles), jnp.int32)
        else:
            sy_start = jnp.clip(
                jnp.floor(jnp.min(sya, axis=2)).astype(jnp.int32) - 1,
                0, hp - crop_h)
        if crop_w >= wp:
            sx_start = jnp.zeros((n, n_tiles), jnp.int32)
        else:
            sx_start = jnp.clip(
                jnp.floor(jnp.min(sxa, axis=2)).astype(jnp.int32) - 1,
                0, wp - crop_w)
        window = jax.vmap(lambda img, y0s, x0s: jax.vmap(
            lambda y0, x0: jax.lax.dynamic_slice(
                img, (y0, x0, 0), (crop_h, crop_w, c)))(y0s, x0s))(
            imgs_p, sy_start, sx_start)  # (N, T, crop_h, crop_w, c)
        win_flat = window.astype(cdtype).reshape(n, n_tiles, crop_h,
                                                 crop_w * c)
        y_rel = jnp.arange(crop_h, dtype=jnp.float32)
        wy = jax.nn.relu(1.0 - jnp.abs(
            y_rel[None, None, None, :]
            + sy_start[..., None, None].astype(jnp.float32)
            - sya[..., None]))  # (N, T, tp, crop_h)
        t = jnp.einsum("ntpy,ntyf->ntpf", wy.astype(cdtype), win_flat,
                       preferred_element_type=jnp.float32)
        t = t.astype(cdtype).reshape(n, n_tiles, tp, crop_w, c)
        x_rel = jnp.arange(crop_w, dtype=jnp.float32)
        wx = jax.nn.relu(1.0 - jnp.abs(
            x_rel[None, None, None, :]
            + sx_start[..., None, None].astype(jnp.float32)
            - sxa[..., None]))  # (N, T, tp, crop_w)
        out = jnp.sum(wx.astype(cdtype)[..., None] * t, axis=3,
                      dtype=jnp.float32)  # (N, T, tp, c)
    out = out.reshape(n, nty, ntx, th, tw, c)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, oh, ow, c)
    return out[:, :out_h, :out_w].astype(cdtype)


def _invert_2x3_np(mats) -> np.ndarray:
    """Host-side (numpy) twin of _invert_2x3 for cheap guard checks —
    keeps guard math off the device (a device round-trip costs ~50ms
    through this image's TPU relay)."""
    m = np.asarray(mats, np.float64)
    a, t = m[..., :2], m[..., 2]
    det = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    ainv = np.stack([
        np.stack([a[..., 1, 1], -a[..., 0, 1]], axis=-1),
        np.stack([-a[..., 1, 0], a[..., 0, 0]], axis=-1),
    ], axis=-2) / det[..., None, None]
    tinv = -np.einsum("...ij,...j->...i", ainv, t)
    return np.concatenate([ainv, tinv[..., None]], axis=-1)


def warp_tile_extent(mats, tile: Tuple[int, int]) -> Tuple[int, int]:
    """Max (rows, cols) of source window any (tile_h, tile_w) output tile
    can touch under `mats` — the bound warp_affine_tiled's `crop` must
    satisfy. Host-side numpy; see warp_tile_bound_ok."""
    inv = _invert_2x3_np(mats)
    th, tw = tile
    # src_y = inv10*x + inv11*y + ty ; src_x = inv00*x + inv01*y + tx
    rows = np.abs(inv[..., 1, 1]) * (th - 1) + np.abs(inv[..., 1, 0]) * (tw - 1)
    cols = np.abs(inv[..., 0, 0]) * (tw - 1) + np.abs(inv[..., 0, 1]) * (th - 1)
    # +3: floor(min)-1 window anchor, +1 bilinear tap past max, +1 rounding
    return int(np.ceil(rows.max())) + 3, int(np.ceil(cols.max())) + 3


def warp_tile_bound_ok(mats, tile: Tuple[int, int],
                       crop: Tuple[int, int]) -> bool:
    """True iff every tile's source extent under `mats` fits `crop` —
    the precondition under which warp_affine_tiled is exact."""
    rows, cols = warp_tile_extent(mats, tile)
    return rows <= crop[0] and cols <= crop[1]


def _selected_inv_abs_np(src_pts, dst_pts, *, tie_rel: float = 1e-3,
                         tie_abs: float = 1e-2):
    """(|sc|, |ss|) of the dst->src linear map of the fit findSimilarity
    actually SELECTS — the residual comparison mirrored host-side in
    float64 (lfw/matlab_cp2tform.py:425-430 picks the lower-residual of
    the direct and Y-reflected fits). Tighter than a max-over-both bound:
    for near-upright faces the reflected fit's larger |ss| inflates the
    column-band crop bound by a whole bucket.

    Divergence safety: the DEVICE comparison (similarity_transform) runs
    its normal-equation solve and residual norm in float32 on pixel-scale
    coordinates, so its pick can differ from the float64 mirror when the
    two residuals are close. Whenever |n1 - n2| <= tie_abs + tie_rel *
    max(n1, n2) — far wider than any plausible f32 noise on O(100)-pixel
    coordinates — the max over BOTH fits is used, so the bound covers
    whichever fit the device picks. For real faces the reflected fit's
    residual is enormously worse (a mirrored face), so the conservative
    branch only engages on degenerate/symmetric landmark sets.
    """
    src = np.asarray(src_pts, np.float64)
    dst = np.asarray(dst_pts, np.float64)

    def fit(uv, xy):
        x, y = xy[..., 0], xy[..., 1]
        u, v = uv[..., 0], uv[..., 1]
        k = x.shape[-1]
        sxx = (x * x + y * y).sum(-1)
        sx, sy = x.sum(-1), y.sum(-1)
        zero, kk = np.zeros_like(sx), np.full_like(sx, float(k))
        xtx = np.stack([
            np.stack([sxx, zero, sx, sy], axis=-1),
            np.stack([zero, sxx, sy, -sx], axis=-1),
            np.stack([sx, sy, kk, zero], axis=-1),
            np.stack([sy, -sx, zero, kk], axis=-1),
        ], axis=-2)
        xtu = np.stack([(x * u + y * v).sum(-1), (y * u - x * v).sum(-1),
                        u.sum(-1), v.sum(-1)], axis=-1)
        return np.linalg.solve(xtx, xtu[..., None])[..., 0]

    def residual(r, reflected):
        """||src->dst fit applied to src - dst|| (numpy twin of the device
        norm comparison in similarity_transform)."""
        sc, ss, tx, ty = (r[..., i] for i in range(4))
        det = sc * sc + ss * ss
        l00 = sc / det
        l01 = ss / det
        l10 = -ss / det
        l11 = sc / det
        t0 = -(tx * l00 + ty * l10)
        t1 = -(tx * l01 + ty * l11)
        u, v = src[..., 0], src[..., 1]
        px = u * l00[..., None] + v * l10[..., None] + t0[..., None]
        py = u * l01[..., None] + v * l11[..., None] + t1[..., None]
        if reflected:
            px = -px
        dx, dy = px - dst[..., 0], py - dst[..., 1]
        return np.sqrt((dx * dx + dy * dy).sum(-1))

    r1 = fit(src, dst)
    r2 = fit(src, dst * np.asarray([-1.0, 1.0]))
    n1 = residual(r1, reflected=False)
    n2 = residual(r2, reflected=True)
    sc1, ss1 = np.abs(r1[..., 0]), np.abs(r1[..., 1])
    sc2, ss2 = np.abs(r2[..., 0]), np.abs(r2[..., 1])
    pick1 = n1 <= n2
    tie = np.abs(n1 - n2) <= tie_abs + tie_rel * np.maximum(n1, n2)
    sc = np.where(tie, np.maximum(sc1, sc2), np.where(pick1, sc1, sc2))
    ss = np.where(tie, np.maximum(ss1, ss2), np.where(pick1, ss1, ss2))
    return sc, ss


_CROP_W_CHOICES = (32, 36, 40, 48, 64, 80, 96, 128, 160, 192, 256)


def auto_warp_config(landmarks, ref_pts, src_hw: Tuple[int, int],
                     out_hw: Tuple[int, int], *, tw: int = 8):
    """Pick a provably-exact (tile, crop) for warp_affine_tiled from the
    concrete transforms, host-side.

    Uses the column-band scheme: tiles span the full output height and the
    source window spans the full (padded) source height, so the y-extent
    bound holds by construction and only the per-band source-x extent needs
    a crop. The v5e sweep (tools/bench_warp.py, BASELINE.md round 4) found
    (a) full-height bands dominate every shorter-tile shape — the bilinear
    y-weight tensor is fused into the einsum, so crop_h costs nothing and
    per-tile window re-reads dominate instead; (b) the x-interp
    intermediate (∝ crop_w·C lanes) is the binding cost: crop_w ≤ 40
    (120 lanes ≤ the 128-lane register) measures 5.4-5.8 ms at batch 256
    while 42-48 jumps to ~7.5 and the old (16-wide, 64-crop) config sits
    at 10. Hence tw=8 bands with the smallest covering crop_w.

    Returns ((tile_h, tile_w), (crop_h, crop_w)), or None when no
    column-band config is exact (extreme scale/rotation) — callers fall
    back to warp_affine_mxu.
    """
    h, w = src_hw
    out_h, out_w = out_hw
    hp = h + (-h % 128)
    wp = w + (-w % 128)
    sc, ss = _selected_inv_abs_np(landmarks, ref_pts)
    cols = float((sc * (tw - 1) + ss * (out_h - 1)).max()) + 3
    for cw in _CROP_W_CHOICES:
        if cols <= cw <= wp:
            return (out_h, tw), (hp, cw)
    if cols <= wp:
        return (out_h, tw), (hp, wp)
    return None


def auto_band_crop_w(landmarks, ref_pts, src_hw: Tuple[int, int],
                     out_h: int, *, band_w: int = 16):
    """Smallest exact crop_w for warp_affine_pallas_band, host-side.

    Bound: |sc|*(band_w-1) + |ss|*(out_h-1) + 3 taps + 32 window-quant
    slack, rounded up to a multiple of 32. None when it exceeds the padded
    source width (extreme scale/rotation -> use an unconditional warp).
    """
    h, w = src_hw
    wp = max(w + (-w % 32), 64)
    sc, ss = _selected_inv_abs_np(landmarks, ref_pts)
    need = float((sc * (band_w - 1) + ss * (out_h - 1)).max()) + 3 + 32
    cw = max(-int(-need // 32) * 32, 64)
    return cw if cw <= wp else None


def align_tile_bound_ok(landmarks, ref_pts, tile: Tuple[int, int],
                        crop: Tuple[int, int]) -> bool:
    """Host-side guard for align_faces(impl='tiled'): True iff the tiled
    warp's per-tile source window provably covers every transform the
    batch's landmarks induce. src_y spans |sc|*(th-1) + |ss|*(tw-1) over a
    (th, tw) tile (and transposed for src_x); +3 covers the window anchor
    and bilinear taps (see warp_tile_extent)."""
    sc, ss = _selected_inv_abs_np(landmarks, ref_pts)
    th, tw = tile
    rows = float((sc * (th - 1) + ss * (tw - 1)).max()) + 3
    cols = float((sc * (tw - 1) + ss * (th - 1)).max()) + 3
    return rows <= crop[0] and cols <= crop[1]


def warp_rows_needed(mats, out_hw: Tuple[int, int], block: int = 1792) -> int:
    """Max source-y extent (rows) any pixel block needs under `mats` —
    pick crop_rows >= this (plus the function pads the band by 2)."""
    inv = _invert_2x3_np(mats)
    out_h, out_w = out_hw
    # a block of `block` pixels can straddle row boundaries: it spans up to
    # ceil(block/out_w) + 1 output rows when block % out_w != 0
    rows_spanned = -(-block // out_w) + (1 if block % out_w else 0)
    # y_src = inv[1,0]*x + inv[1,1]*y + inv[1,2]
    dy_x = np.abs(inv[:, 1, 0]) * (out_w - 1)
    dy_y = np.abs(inv[:, 1, 1]) * max(rows_spanned - 1, 0)
    return int(np.ceil((dy_x + dy_y).max())) + 3


@partial(jax.jit, static_argnames=("out_hw",))
def warp_affine(imgs, mats, *, out_hw: Tuple[int, int]):
    """Batched cv2.warpAffine-equivalent bilinear warp, zero border.

    imgs: (N, H, W, C); mats: (N, 2, 3) forward (src->dst) matrices in the
    cv2 column-vector convention. out_hw: (H_out, W_out). cv2 inverts the
    matrix internally (no WARP_INVERSE_MAP); we do the same.
    """
    if not jnp.issubdtype(imgs.dtype, jnp.floating):
        # integer images would truncate the fractional w00..w11 weights
        # below to 0 (round-5 review) — compute in f32, return float
        imgs = imgs.astype(jnp.float32)
    n, h, w, c = imgs.shape
    out_h, out_w = out_hw
    inv = _invert_2x3(mats.astype(jnp.float32))

    ys, xs = jnp.meshgrid(
        jnp.arange(out_h, dtype=jnp.float32),
        jnp.arange(out_w, dtype=jnp.float32), indexing="ij")
    sx, sy = _src_coords(inv, xs.ravel(), ys.ravel())  # (N, P) each

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        flat = imgs.reshape(n, h * w, c)
        idx = yc * w + xc  # (N, P)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (N, P, C)
        return vals * valid[..., None].astype(imgs.dtype)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)

    w00 = ((1 - fy) * (1 - fx))[..., None].astype(imgs.dtype)
    w01 = ((1 - fy) * fx)[..., None].astype(imgs.dtype)
    w10 = (fy * (1 - fx))[..., None].astype(imgs.dtype)
    w11 = (fy * fx)[..., None].astype(imgs.dtype)

    out = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
    return out.reshape(n, out_h, out_w, c)


def align_faces(imgs, landmarks, *, out_hw: Tuple[int, int] = (112, 96),
                ref_pts=None, impl: str = "auto", check_bound: bool = True):
    """End-to-end batched alignment: landmarks -> cp2tform -> warp.

    imgs: (N, H, W, C); landmarks: (N, 5, 2) as (x, y).
    Returns (N, out_h, out_w, C) aligned crops (the on-device equivalent of
    gen_lfw112x96.align, lfw/gen_lfw112x96.py:6-17).

    impl:
      'auto'        — fastest provably-exact path: the XLA column-band
                      warp at the swept-optimal config when its bound
                      holds (v5e batch 256, 250->112: 5.4-5.8 ms with
                      8-wide bands + crop_w 40 — now FASTER than the
                      fused Pallas band kernel's 6.5 ms, and immune to
                      the relay's intermittent pallas block); else the
                      unconditional MXU warp (38 ms).
      'pallas_band' — force the Pallas kernel (bound-checked, mxu
                      fallback); requires pallas execution to work on
                      this host — probe first (tools/pallas_probe.py)
      'tiled'       — force the XLA column-band warp (same fallback)
      'mxu'         — unconditional matmul warp
      'gather'      — XLA gather reference

    check_bound: verify extent bounds on the host from the concrete
    transforms (numpy cp2tform twin — microseconds, no device round-trip)
    so no input can silently produce corrupted pixels. Hot loops with a
    known-safe fixed config may disable it (uses each warp's defaults).
    """
    if ref_pts is None:
        ref_pts = ARCFACE_REF_PTS
    ref = jnp.broadcast_to(jnp.asarray(ref_pts, jnp.float32),
                           landmarks.shape[:-2] + (5, 2))
    mats = cv2_transform(landmarks.astype(jnp.float32), ref)
    if impl == "auto":
        # round-4 sweep: the XLA band at (8-wide, crop 40) beats the pallas
        # band kernel outright — pallas stays available via impl=
        impl = "tiled"
    kwargs = {}
    if impl == "pallas_band" and check_bound:
        lmk_np, ref_np = np.asarray(landmarks), np.asarray(ref_pts)
        cw = auto_band_crop_w(lmk_np, ref_np, imgs.shape[1:3], out_hw[0])
        if cw is None:
            impl = "mxu"
        else:
            kwargs = {"crop_w": cw}
    elif impl == "tiled" and check_bound:
        # numpy-only guard (landmarks arrive as host arrays on every real
        # ingest path; if they are device arrays this is one small fetch)
        config = auto_warp_config(np.asarray(landmarks), np.asarray(ref_pts),
                                  imgs.shape[1:3], out_hw)
        if config is None:
            impl = "mxu"
        else:
            kwargs = {"tile": config[0], "crop": config[1]}
    if impl == "pallas_band":
        from ffrnet_tpu.ops.pallas.warp import warp_affine_pallas_band

        return warp_affine_pallas_band(imgs, mats, out_hw=out_hw, **kwargs)
    warp = {"mxu": warp_affine_mxu, "tiled": warp_affine_tiled,
            "gather": warp_affine}[impl]
    return warp(imgs, mats, out_hw=out_hw, **kwargs)
