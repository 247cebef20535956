"""uint8-storage and int8-MXU arms of warp_affine_tiled (ops/align.py).

The serving warp's source traffic dominates its cost at batch 256
(BASELINE.md round-4 sweep); these arms keep the raw pixels in HBM at
1 byte (reference parity path: float32 via cv2.warpAffine on the host,
lfw/gen_lfw112x96.py:16) and optionally run the y-interp contraction on
the int8 MXU. Tests pin (a) the uint8-storage path bit-equivalent to
pre-cast floats, (b) the documented <=2.01-pixel-LSB error bound of the
int8 y-stage, (c) exactness on integer translations, (d) guard rails.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffrnet_tpu.ops.align import warp_affine_tiled

OUT_HW = (32, 32)
TILE = (32, 8)
CROP = (128, 24)  # crop_h >= padded source height -> column-band config


def _mats(n, seed=0):
    """dst->src similarity transforms ~2x scale + small rotation/shift,
    well inside the (TILE, CROP) correctness bound."""
    rng = np.random.default_rng(seed)
    mats = []
    for _ in range(n):
        s = 1.8 + rng.uniform(-0.1, 0.1)
        th = rng.uniform(-0.05, 0.05)
        cs, sn = s * np.cos(th), s * np.sin(th)
        tx, ty = rng.uniform(0, 3, 2)
        # forward src->dst convention of warp_affine_tiled's `mats`
        # argument is dst->src after _invert_2x3; pass src->dst here
        mats.append([[1 / cs, sn / (cs * cs + sn * sn), -tx],
                     [-sn / (cs * cs + sn * sn), 1 / cs, -ty]])
    return jnp.asarray(np.array(mats, np.float32))


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (3, 64, 64, 3)).astype(np.uint8)
    return jnp.asarray(imgs), _mats(3)


def _warp(imgs, mats, **kw):
    return np.asarray(warp_affine_tiled(imgs, mats, out_hw=OUT_HW,
                                        tile=TILE, crop=CROP, **kw))


def test_uint8_storage_matches_precast_float(data):
    imgs_u8, mats = data
    a = _warp(imgs_u8, mats, compute_dtype=jnp.float32)
    b = _warp(imgs_u8.astype(jnp.float32), mats)
    assert a.dtype == np.float32  # never quantized back to uint8
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_uint8_storage_nonserial_matches_serial(data):
    imgs_u8, mats = data
    a = _warp(imgs_u8, mats, compute_dtype=jnp.float32, serial=False)
    b = _warp(imgs_u8, mats, compute_dtype=jnp.float32, serial=True)
    # serial and non-serial differ by f32 accumulation order alone
    # (pre-existing, ~2e-3 max on 0..255 pixels)
    np.testing.assert_allclose(a, b, atol=1e-2)


def test_y_int8_pixel_error_bound(data):
    """|err| <= 2*(0.5/127)*255 = 2.01 pixel LSB (docstring bound); the
    convex float x-stage cannot amplify it."""
    imgs_u8, mats = data
    ref = _warp(imgs_u8.astype(jnp.float32), mats)
    q = _warp(imgs_u8, mats, compute_dtype=jnp.float32, y_int8=True)
    err = np.abs(q - ref)
    assert err.max() <= 2.02, err.max()
    assert err.mean() <= 0.5, err.mean()


def test_y_int8_bf16_compute(data):
    """bf16 x-stage on top of the int8 y-stage: the serving configuration
    (pipeline normalizes to bf16 right after). bf16 rounding adds <=1
    pixel LSB on 0..255 values."""
    imgs_u8, mats = data
    ref = _warp(imgs_u8.astype(jnp.float32), mats)
    q = _warp(imgs_u8, mats, compute_dtype=jnp.bfloat16, y_int8=True)
    assert q.dtype == jnp.bfloat16
    assert np.abs(q.astype(np.float32) - ref).max() <= 3.1


def test_y_int8_exact_on_integer_translation():
    """Integer src coords -> one-hot wy -> wq = 127 exactly -> the int8
    path reconstructs the gather exactly."""
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.integers(0, 256, (2, 64, 64, 3)), jnp.uint8)
    mats = jnp.asarray(np.tile(np.array([[1.0, 0.0, -4.0],
                                         [0.0, 1.0, -6.0]], np.float32),
                               (2, 1, 1)))
    ref = _warp(imgs.astype(jnp.float32), mats)
    q = _warp(imgs, mats, compute_dtype=jnp.float32, y_int8=True)
    np.testing.assert_allclose(q, ref, atol=1e-3)


def test_y_int8_requires_serial(data):
    imgs_u8, mats = data
    with pytest.raises(ValueError, match="serial"):
        warp_affine_tiled(imgs_u8, mats, out_hw=OUT_HW, tile=TILE,
                          crop=CROP, y_int8=True, serial=False)


def test_float_path_unchanged_defaults(data):
    """compute_dtype=None on float input: untouched pre-round-4 behavior
    (output dtype == input dtype)."""
    _, mats = data
    imgs = jnp.asarray(
        np.random.default_rng(3).uniform(0, 255, (2, 64, 64, 3)),
        jnp.bfloat16)
    out = warp_affine_tiled(imgs, mats[:2], out_hw=OUT_HW, tile=TILE,
                            crop=CROP)
    assert out.dtype == jnp.bfloat16
