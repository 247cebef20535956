"""uint8 upload path: ship raw pixels, normalize on device.

The train driver through a relayed TPU is input-upload-bound
(BASELINE.md "Driver-loop reality"): float32 batches move 4x the bytes of
the uint8 pixels they were derived from. These tests pin the contract that
host_normalize=0 loaders + ops.nn.images_to_unit_range reproduce the
reference's host transform (data/dataloader.py:15-19) exactly.
"""

import numpy as np
import pytest

from ffrnet_tpu.data.datasets import (
    CasiaPairs, LfwPairs, SyntheticPairs, _listdir_cached, _to_unit)

from tests.test_data import tiny_lfw_tree  # noqa: F401  (fixture reuse)


def test_device_normalize_matches_host_bitwise():
    import jax.numpy as jnp

    from ffrnet_tpu.ops.nn import images_to_unit_range

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (4, 7, 5, 3), dtype=np.uint8)
    host = _to_unit(u8)
    dev = np.asarray(images_to_unit_range(jnp.asarray(u8)))
    assert dev.dtype == np.float32
    np.testing.assert_array_equal(dev, host)  # bitwise
    # float input passes through untouched
    f = rng.standard_normal((2, 3, 3, 3)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(images_to_unit_range(
        jnp.asarray(f))), f)


def test_lfw_pairs_uint8_matches_float(tiny_lfw_tree):  # noqa: F811
    root, pairs = tiny_lfw_tree
    _listdir_cached.cache_clear()
    ds_f = LfwPairs(str(root), str(pairs), flip_prob=0.5)
    ds_u = LfwPairs(str(root), str(pairs), flip_prob=0.5,
                    host_normalize=False)
    for i in range(len(ds_f)):
        a = ds_f.get(i, np.random.default_rng((7, i)))
        b = ds_u.get(i, np.random.default_rng((7, i)))
        assert b["img1"].dtype == np.uint8
        np.testing.assert_array_equal(_to_unit(b["img1"]), a["img1"])
        np.testing.assert_array_equal(_to_unit(b["img2"]), a["img2"])
        assert a["label"] == b["label"]


def test_casia_pairs_uint8_matches_float(tiny_lfw_tree, tmp_path):  # noqa: F811
    root, _ = tiny_lfw_tree
    _listdir_cached.cache_clear()
    lst = tmp_path / "list.txt"
    lst.write_text("Alice_A/Alice_A_0001.jpg 0\nBob_B/Bob_B_0002.jpg 1\n")
    for use_native in (False, "auto"):
        ds_f = CasiaPairs(str(root), str(lst), num_classes=2,
                          use_native=use_native)
        ds_u = CasiaPairs(str(root), str(lst), num_classes=2,
                          use_native=use_native, host_normalize=False)
        for i in range(len(ds_f)):
            a = ds_f.get(i, np.random.default_rng((3, i)))
            b = ds_u.get(i, np.random.default_rng((3, i)))
            assert b["img_non"].dtype == np.uint8
            np.testing.assert_array_equal(_to_unit(b["img_non"]),
                                          a["img_non"])
            np.testing.assert_array_equal(_to_unit(b["img_ocl"]),
                                          a["img_ocl"])


def test_native_u8_entry_points_match_float():
    from ffrnet_tpu.data import native

    if not native.is_available():
        pytest.skip("native host library unavailable")
    assert native.has_u8()
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for h, w in ((112, 112), (150, 130), (90, 200))]
    flips = [False, True, False]
    f = native.prep_batch(imgs, (112, 112), flips=flips)
    u = native.prep_batch(imgs, (112, 112), flips=flips, out_u8=True)
    assert u.dtype == np.uint8
    np.testing.assert_array_equal(_to_unit(u), f)


def test_train_step_uint8_equals_float():
    import jax
    import jax.numpy as jnp

    from ffrnet_tpu.models import irse
    from ffrnet_tpu.models.recnet import RecNetConfig
    from ffrnet_tpu.training.trainer import (
        TrainerConfig, create_train_state, train_step)

    cfg = TrainerConfig(optimizer="adam", lr=1e-3,
                        recnet=RecNetConfig(num_classes=8))
    enc_p, enc_s = irse.init(jax.random.PRNGKey(0))
    state_f = create_train_state(jax.random.PRNGKey(1), cfg)
    state_u = create_train_state(jax.random.PRNGKey(1), cfg)

    rng = np.random.default_rng(2)
    u8 = {k: rng.integers(0, 256, (4, 112, 112, 3), dtype=np.uint8)
          for k in ("img_non", "img_ocl")}
    labels = rng.integers(0, 8, (4,)).astype(np.int32)
    batch_f = {"img_non": jnp.asarray(_to_unit(u8["img_non"])),
               "img_ocl": jnp.asarray(_to_unit(u8["img_ocl"])),
               "label": jnp.asarray(labels)}
    batch_u = {"img_non": jnp.asarray(u8["img_non"]),
               "img_ocl": jnp.asarray(u8["img_ocl"]),
               "label": jnp.asarray(labels)}

    sf, mf = train_step(enc_p, enc_s, state_f, batch_f, cfg=cfg)
    su, mu = train_step(enc_p, enc_s, state_u, batch_u, cfg=cfg)
    # jit may fuse the device normalize into one multiply (<=1 ulp on
    # pixel values), so cross-path agreement is tight-tolerance, not exact
    for k in mf:
        np.testing.assert_allclose(np.asarray(mf[k]), np.asarray(mu[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        sf.params, su.params)


def test_eval_score_fn_accepts_uint8():
    import jax
    import jax.numpy as jnp

    from ffrnet_tpu.eval.runner import make_pair_score_fn
    from ffrnet_tpu.models import irse, recnet
    from ffrnet_tpu.models.recnet import RecNetConfig

    cfg = RecNetConfig(num_classes=8)
    enc_p, enc_s = irse.init(jax.random.PRNGKey(0))
    rec_p, rec_s = recnet.init(jax.random.PRNGKey(1), cfg)
    score = make_pair_score_fn(cfg)

    rng = np.random.default_rng(3)
    u1 = rng.integers(0, 256, (2, 112, 112, 3), dtype=np.uint8)
    u2 = rng.integers(0, 256, (2, 112, 112, 3), dtype=np.uint8)
    raw_f, new_f = score(enc_p, enc_s, rec_p, rec_s,
                         jnp.asarray(_to_unit(u1)), jnp.asarray(_to_unit(u2)))
    raw_u, new_u = score(enc_p, enc_s, rec_p, rec_s,
                         jnp.asarray(u1), jnp.asarray(u2))
    # <=1-ulp input perturbation from jit fusion of the normalize
    np.testing.assert_allclose(np.asarray(raw_f), np.asarray(raw_u),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_f), np.asarray(new_u),
                               atol=1e-4)


def test_api_embed_and_verify_uint8():
    from ffrnet_tpu.api import FFRNet

    model = FFRNet.random(seed=0)
    rng = np.random.default_rng(4)
    u8 = rng.integers(0, 256, (3, 112, 112, 3), dtype=np.uint8)
    raw_f, rect_f = model.embed(_to_unit(u8))
    raw_u, rect_u = model.embed(u8)
    # <=1-ulp input perturbation from jit fusion of the normalize
    np.testing.assert_allclose(np.asarray(raw_f), np.asarray(raw_u),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(rect_f), np.asarray(rect_u),
                               atol=1e-4)
    # mixed uint8/float verify: the uint8 side is normalized, not
    # concatenated as 0..255 floats
    other = _to_unit(rng.integers(0, 256, (3, 112, 112, 3), dtype=np.uint8))
    s_mixed = np.asarray(model.verify(u8, other))
    s_float = np.asarray(model.verify(_to_unit(u8), other))
    np.testing.assert_allclose(s_mixed, s_float, atol=1e-6)
    # a python LIST of uint8 frames has no .dtype — must still be detected
    # as uint8, not silently concatenated as 0..255 floats
    s_list = np.asarray(model.verify(list(u8), other))
    np.testing.assert_allclose(s_list, s_float, atol=1e-6)


def test_synthetic_pairs_uint8_mode():
    ds = SyntheticPairs(num_identities=4, host_normalize=False)
    s = ds.get(0, np.random.default_rng(0))
    assert s["img_non"].dtype == np.uint8
    assert s["img_ocl"].dtype == np.uint8


def test_save_wrong_images_uint8_dataset(tiny_lfw_tree, tmp_path):  # noqa: F811
    root, pairs = tiny_lfw_tree
    _listdir_cached.cache_clear()
    from PIL import Image

    from ffrnet_tpu.eval.runner import save_wrong_images

    ds = LfwPairs(str(root), str(pairs), flip_prob=0.0, host_normalize=False)
    out = tmp_path / "wrong"
    n = save_wrong_images(ds, [0], str(out))
    assert n == 2
    dumped = np.asarray(Image.open(out / "0000_1.png"))
    sample = ds.get(0, np.random.default_rng(0))
    np.testing.assert_array_equal(dumped, sample["img1"][:, :, ::-1])
