"""Native host-prep library vs the PIL reference transforms."""

import io

import numpy as np
import pytest

from ffrnet_tpu.data import native

pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason="native library not built")


def test_prep_batch_matches_python_112():
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (112, 112, 3), dtype=np.uint8)
            for _ in range(5)]
    out = native.prep_batch(imgs, (112, 112), bgr=True,
                            flips=[False, True, False, True, False])
    assert out.shape == (5, 112, 112, 3)
    for i, img in enumerate(imgs):
        expected = img[:, :, ::-1].astype(np.float32)
        if i % 2 == 1:
            expected = expected[:, ::-1]
        expected = (expected / 255.0 - 0.5) / 0.5
        np.testing.assert_allclose(out[i], expected, atol=1e-6, err_msg=str(i))


def test_prep_batch_resize_matches_pil():
    from PIL import Image

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (200, 160, 3), dtype=np.uint8)
    out = native.prep_batch([img], (112, 112), bgr=False)
    pil = np.asarray(Image.fromarray(img).resize((112, 112), Image.BICUBIC),
                     dtype=np.float32)
    expected = (pil / 255.0 - 0.5) / 0.5
    # PIL uses 8-bit fixed-point coefficients; allow a couple of LSB.
    diff = np.abs(out[0] - expected) * 127.5  # back to pixel units
    assert np.quantile(diff, 0.99) <= 2.0, np.quantile(diff, 0.99)
    assert diff.mean() < 0.5


def test_decode_prep_batch_roundtrip():
    from PIL import Image

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (112, 112, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    out = native.decode_prep_batch([buf.getvalue()], (112, 112), bgr=True)
    # decode must match PIL's decode of the same buffer
    pil = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    expected = (pil[:, :, ::-1].astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out[0], expected, atol=3e-2)  # codec variance


def test_decode_bad_jpeg_fails_cleanly():
    with pytest.raises(RuntimeError):
        native.decode_prep_batch([b"not a jpeg"], (112, 112))


def test_prep_batch_rejects_non_hwc3():
    # prep_one reads h*w*3 bytes: a grayscale array would read out of
    # bounds in native code — must be rejected host-side
    with pytest.raises(ValueError, match="3 channels"):
        native.prep_batch([np.zeros((112, 112), np.uint8)])
    with pytest.raises(ValueError, match="3 channels"):
        native.prep_batch([np.zeros((112, 112, 4), np.uint8)])
