"""Visualization + logger + timer smoke/shape tests."""

import numpy as np

from ffrnet_tpu.utils.image import batch_numpy_to_image, normalization
from ffrnet_tpu.utils.logger import Logger
from ffrnet_tpu.utils.timer import Timer


def test_normalization_matches_reference_formula():
    rng = np.random.default_rng(0)
    maps = rng.standard_normal((4, 9, 9))
    out = normalization(maps)
    assert out.min() >= 0 and out.max() <= 1
    for i in range(4):
        expected = (maps[i] - maps[i].min()) / (maps[i].max() - maps[i].min())
        np.testing.assert_allclose(out[i], expected)


def test_batch_numpy_to_image_shapes():
    rng = np.random.default_rng(1)
    arr = rng.uniform(0, 255, (3, 1, 7, 7))
    out = batch_numpy_to_image(arr, size=(112, 112))
    assert out.shape == (3, 112, 112, 3)
    assert out.min() >= 0 and out.max() <= 255


def test_attention_panel():
    from ffrnet_tpu.eval.visualize import attention_panel

    rng = np.random.default_rng(2)
    n = 3
    imgs = rng.uniform(-1, 1, (n, 112, 112, 3)).astype(np.float32)
    m_space = rng.uniform(0, 1, (n, 49, 49)).astype(np.float32)
    m_channel = rng.uniform(0, 1, (n, 512, 512)).astype(np.float32)
    fm = rng.standard_normal((n, 7, 7, 512)).astype(np.float32)
    panel = attention_panel(imgs, m_space, m_channel, fm, n_rows=2)
    assert panel.shape == (2 * 112, 4 * 112, 3)
    assert panel.dtype == np.uint8


def test_logger_scalars_and_json(tmp_path):
    logger = Logger(str(tmp_path), "run1")
    logger.set_current_iter(1, 0)
    logger.record_scalar({"loss": 1.5}, "train")
    logger.set_current_iter(2, 0)
    logger.record_scalar({"loss": 1.2}, "train")
    timer = Timer()
    timer.update_time("DataTime")
    timer.update_time("Step")
    msg = logger.print_iter_summary(10, 1, timer)
    assert "loss" in msg
    logger.close()
    import json
    import os

    data = json.load(open(os.path.join(logger.log_dir, "all_scalars.json")))
    assert data["train/loss"]["values"] == [1.5, 1.2]
    assert os.path.exists(os.path.join(logger.log_dir, "log_train"))


def test_maybe_trace_noop():
    from ffrnet_tpu.utils.profiling import annotate, maybe_trace

    with maybe_trace(None):
        with annotate("x"):
            pass


def test_select_yx_matches_torch_semantics():
    import pytest

    torch = pytest.importorskip("torch")
    from ffrnet_tpu.utils.image import select_yx

    rng = np.random.default_rng(3)
    fm = rng.standard_normal((2, 7, 7, 5)).astype(np.float32)
    y = rng.integers(-1, 9, (2, 5))
    x = rng.integers(-1, 9, (2, 5))

    # reference semantics (utils/utils.py:59-75), NCHW gather
    fm_t = torch.from_numpy(fm.transpose(0, 3, 1, 2))
    yt = torch.from_numpy(np.clip(y, 0, 6))
    xt = torch.from_numpy(np.clip(x, 0, 6))
    b, c, h, w = fm_t.shape
    yy = yt.view(b, c, 1, 1).repeat(1, 1, 1, w)
    g = torch.gather(fm_t, -2, yy.long())
    xx = xt.view(b, c, 1, 1)
    expected = torch.gather(g, -1, xx.long()).squeeze(-1).squeeze(-1).numpy()

    np.testing.assert_allclose(select_yx(fm, y, x), expected)


def test_img_to_array(tmp_path):
    from PIL import Image

    from ffrnet_tpu.utils.image import img_to_array

    rng = np.random.default_rng(4)
    arr = rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)
    p = tmp_path / "x.png"
    Image.fromarray(arr).save(p)
    out = img_to_array(str(p), mode="bgr")
    assert out.shape == (1, 20, 30, 3)
    np.testing.assert_allclose(
        out[0], arr[..., ::-1].astype(np.float32) / 255 * 2 - 1, atol=1e-6)


def test_timer_sections_and_eta():
    """Timer: scoped + mark-style recording on an injected clock."""
    import pytest as _pytest

    t = [0.0]
    timer = Timer(clock=lambda: t[0])
    with timer.section("Forward"):
        t[0] += 2.0
    t[0] += 1.0
    timer.update_time("Backward")  # mark-style: since section exit
    assert timer.iter_total == _pytest.approx(3.0)
    assert timer.eta(10) == _pytest.approx(30.0)
    assert timer.elapsed == _pytest.approx(3.0)
    msg = timer.to_string(10)
    assert "Forward|Backward" in msg and "IterTotal: 3.00s" in msg
    # latest-value semantics: re-recording a section replaces, not accumulates
    with timer.section("Forward"):
        t[0] += 0.5
    assert timer.iter_total == _pytest.approx(1.5)
    timer.reset_timer()
    assert timer.iter_total == 0.0
