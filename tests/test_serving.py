"""Serving layer + data-parallel inference sharding.

The reference has no serving or inference-parallelism surface beyond
nn.DataParallel (models/trainer.py:70-72); these tests cover the TPU-native
equivalents: FFRNet.shard (mesh data parallelism) and EmbeddingService
(dynamic micro-batching).
"""

import json
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ffrnet_tpu.api import FFRNet
from ffrnet_tpu.parallel.mesh import make_mesh
from ffrnet_tpu.serving import EmbeddingService


@pytest.fixture(scope="module")
def model():
    return FFRNet.random(0)


def _faces(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, (n, 112, 112, 3)).astype(np.float32)


# ---------------------------------------------------------------- sharding


def test_sharded_embed_matches_single_device(model):
    mesh = make_mesh()  # 8 virtual CPU devices (conftest)
    sharded = model.shard(mesh)
    x = _faces(16)
    raw0, rect0 = model.embed(x)
    raw1, rect1 = sharded.embed(x)
    np.testing.assert_allclose(np.asarray(raw0), np.asarray(raw1),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(rect0), np.asarray(rect1),
                               atol=2e-5, rtol=2e-5)
    # the dispatch really was sharded over 'data'
    y = jax.device_put(jnp.asarray(x), sharded.batch_sharding)
    assert len(y.sharding.device_set) == mesh.devices.size


def test_sharded_embed_pads_indivisible_batch(model):
    sharded = model.shard(make_mesh())
    x = _faces(11, seed=3)  # not divisible by 8 -> padded to 16, sliced back
    raw0, rect0 = model.embed(x)
    raw1, rect1 = sharded.embed(x)
    assert raw1.shape == (11, 512) and rect1.shape == (11, 512)
    np.testing.assert_allclose(np.asarray(raw0), np.asarray(raw1),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(rect0), np.asarray(rect1),
                               atol=2e-5, rtol=2e-5)


def test_prepare_preserves_sharding(model):
    # .shard().prepare(...) must stay sharded (regression: prepare used to
    # rebuild without the batch_sharding field)
    sharded = model.shard(make_mesh()).prepare(dtype=jnp.bfloat16)
    assert sharded.batch_sharding is not None
    raw, _ = sharded.embed(_faces(8, seed=4))
    assert raw.shape == (8, 512) and raw.dtype == jnp.bfloat16


def test_sharded_verify(model):
    sharded = model.shard(make_mesh())
    a, b = _faces(6, seed=1), _faces(6, seed=2)
    s0 = np.asarray(model.verify(a, b))
    s1 = np.asarray(sharded.verify(a, b))
    np.testing.assert_allclose(s0, s1, atol=2e-5, rtol=2e-5)


# ----------------------------------------------------------------- serving


def test_service_matches_direct_embed(model):
    x = _faces(9, seed=5)
    raw0, rect0 = model.embed(x)
    with EmbeddingService(model, max_batch=16, max_delay_s=0.01) as svc:
        futs = [svc.submit(x[i]) for i in range(9)]
        outs = [f.result(timeout=60) for f in futs]
    for i, (raw, rect) in enumerate(outs):
        assert raw.shape == (1, 512)
        np.testing.assert_allclose(np.asarray(raw[0]), np.asarray(raw0[i]),
                                   atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(rect[0]), np.asarray(rect0[i]),
                                   atol=2e-5, rtol=2e-5)


def test_service_group_submit_and_padding(model):
    x = _faces(5, seed=7)  # 5 pads to the 8-bucket; result must be exact
    raw0, rect0 = model.embed(x)
    with EmbeddingService(model, max_batch=8, max_delay_s=0.0) as svc:
        raw, rect = svc.submit(x).result(timeout=60)
    assert raw.shape == (5, 512)
    np.testing.assert_allclose(np.asarray(raw), np.asarray(raw0),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(rect), np.asarray(rect0),
                               atol=2e-5, rtol=2e-5)
    assert svc.stats.batches == 1
    assert svc.stats.padded_faces == 3


def test_service_coalesces_concurrent_submits(model):
    x = _faces(24, seed=9)
    svc = EmbeddingService(model, max_batch=32, max_delay_s=0.05)
    svc.warmup()
    barrier = threading.Barrier(8)
    futs = [None] * 8

    def client(i):
        barrier.wait()
        futs[i] = svc.submit(x[3 * i:3 * i + 3])

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    outs = [f.result(timeout=60) for f in futs]
    svc.close()
    raw0, _ = model.embed(x)
    for i, (raw, _) in enumerate(outs):
        np.testing.assert_allclose(np.asarray(raw),
                                   np.asarray(raw0[3 * i:3 * i + 3]),
                                   atol=2e-5, rtol=2e-5)
    # 24 faces over >=1 dispatch, strictly fewer dispatches than requests
    assert svc.stats.faces == 24
    assert svc.stats.batches < 8
    assert svc.stats.mean_batch > 3.0


def test_bf16_model_accepts_fp32_inputs():
    # serving always feeds fp32 host arrays; a bf16-prepared model must
    # cast rather than fail the conv dtype check (regression: bench_serving)
    m = FFRNet.random(0, dtype=jnp.bfloat16)
    raw, rect = m.embed(_faces(3, seed=13))
    assert raw.dtype == jnp.bfloat16 and raw.shape == (3, 512)


def test_service_rejects_bad_shapes_and_closed(model):
    svc = EmbeddingService(model, max_batch=4)
    with pytest.raises(ValueError):
        svc.submit(np.zeros((50, 50, 3), np.float32))
    with pytest.raises(ValueError):
        svc.submit(np.zeros((5, 112, 112, 3), np.float32))  # > max_batch
    svc.close()
    with pytest.raises(RuntimeError):
        svc.submit(np.zeros((112, 112, 3), np.float32))


@pytest.mark.slow
def test_service_over_sharded_model(model):
    # the full production stack: mesh-DP model behind the batching service
    sharded = model.shard(make_mesh())
    x = _faces(10, seed=17)
    raw0, _ = model.embed(x)
    with EmbeddingService(sharded, max_batch=16, max_delay_s=0.01) as svc:
        futs = [svc.submit(x[i]) for i in range(10)]
        outs = [f.result(timeout=120) for f in futs]
    for i, (raw, _) in enumerate(outs):
        np.testing.assert_allclose(np.asarray(raw[0]), np.asarray(raw0[i]),
                                   atol=2e-5, rtol=2e-5)


def test_http_server_embed_verify_stats(model):
    import urllib.request

    from ffrnet_tpu.serving import EmbeddingHTTPServer

    x = _faces(6, seed=21)
    raw0, rect0 = model.embed(x)
    svc = EmbeddingService(model, max_batch=8, max_delay_s=0.0)
    with EmbeddingHTTPServer(svc) as srv:
        base = f"http://127.0.0.1:{srv.port}"
        # healthz
        assert urllib.request.urlopen(base + "/healthz").read() == b"ok"
        # embed
        body = np.ascontiguousarray(x, "<f4").tobytes()
        out = urllib.request.urlopen(
            urllib.request.Request(base + "/embed", data=body,
                                   method="POST")).read()
        emb = np.frombuffer(out, "<f4").reshape(2, 6, 512)
        np.testing.assert_allclose(emb[0], np.asarray(raw0, np.float32),
                                   atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(emb[1], np.asarray(rect0, np.float32),
                                   atol=2e-5, rtol=2e-5)
        # verify (3 pairs) vs the facade's scores
        s0 = np.asarray(model.verify(x[:3], x[3:]), np.float32)
        out = urllib.request.urlopen(
            urllib.request.Request(base + "/verify", data=body,
                                   method="POST")).read()
        np.testing.assert_allclose(np.frombuffer(out, "<f4"), s0,
                                   atol=2e-4, rtol=2e-4)
        # stats
        stats = json.loads(
            urllib.request.urlopen(base + "/stats").read())
        assert stats["faces"] >= 12 and stats["errors"] == 0
        # malformed body -> 400
        try:
            urllib.request.urlopen(urllib.request.Request(
                base + "/embed", data=b"xx", method="POST"))
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    svc.close()


def test_http_enroll_identify(model):
    import urllib.error
    import urllib.request

    from ffrnet_tpu.serving import EmbeddingHTTPServer

    x = _faces(10, seed=31)
    svc = EmbeddingService(model, max_batch=16, max_delay_s=0.0)
    with EmbeddingHTTPServer(svc) as srv:
        base = f"http://127.0.0.1:{srv.port}"

        def post(path, arr, headers=None):
            req = urllib.request.Request(
                base + path, data=np.ascontiguousarray(arr, "<f4").tobytes(),
                method="POST", headers=headers or {})
            return urllib.request.urlopen(req)

        # identify before any enrollment -> 409
        try:
            post("/identify", x[:1])
            assert False, "expected 409"
        except urllib.error.HTTPError as e:
            assert e.code == 409

        # enroll in two batches (capacity crosses the 8 -> 16 doubling)
        r = json.loads(post("/enroll", x[:6], {
            "X-Labels": ",".join(f"id{i}" for i in range(6))}).read())
        assert r == {"enrolled": 6, "gallery_size": 6}
        r = json.loads(post("/enroll", x[6:], {
            "X-Labels": "id6,id7,id8,id9"}).read())
        assert r == {"enrolled": 4, "gallery_size": 10}

        # probing with enrolled faces: rank-1 self-match, k=2
        r = json.loads(post("/identify", x[2:5],
                            {"X-Top-K": "2"}).read())
        assert [row[0] for row in r["labels"]] == ["id2", "id3", "id4"]
        assert all(abs(s[0] - 1.0) < 1e-3 for s in r["scores"])

        # label-count mismatch -> 400
        try:
            post("/enroll", x[:2], {"X-Labels": "only_one"})
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # malformed X-Top-K -> 400 (not a 500 server fault)
        try:
            post("/identify", x[:1], {"X-Top-K": "two"})
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # oversize POST (> max_batch=16) is chunked server-side, not a 500
        big = np.concatenate([x, x], axis=0)  # 20 faces
        out = urllib.request.urlopen(urllib.request.Request(
            base + "/embed", data=np.ascontiguousarray(big, "<f4").tobytes(),
            method="POST")).read()
        assert np.frombuffer(out, "<f4").reshape(2, 20, 512).shape == (2, 20, 512)

        exported = srv.gallery()
    svc.close()

    # warm-start a fresh server from the exported gallery: identify works
    # without re-enrolling
    assert len(exported.labels) == 10
    svc2 = EmbeddingService(model, max_batch=16, max_delay_s=0.0)
    with EmbeddingHTTPServer(svc2, gallery=exported) as srv2:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv2.port}/identify",
            data=np.ascontiguousarray(x[7:9], "<f4").tobytes(),
            method="POST")
        r = json.loads(urllib.request.urlopen(req).read())
        assert [row[0] for row in r["labels"]] == ["id7", "id8"]
    svc2.close()


def test_service_submit_uint8(model):
    """submit() normalizes uint8 pixels instead of casting 0..255 floats."""
    rng = np.random.default_rng(29)
    u8 = rng.integers(0, 256, (3, 112, 112, 3), dtype=np.uint8)
    xf = (u8.astype(np.float32) / 255.0 - 0.5) / 0.5
    svc = EmbeddingService(model, max_batch=8, max_delay_s=0.0)
    try:
        raw_u, rect_u = svc.submit(u8).result(timeout=60)
        raw_f, rect_f = svc.submit(xf).result(timeout=60)
        np.testing.assert_allclose(np.asarray(rect_u), np.asarray(rect_f),
                                   atol=1e-5, rtol=1e-5)
    finally:
        svc.close()


def test_http_uint8_body(model):
    """X-Input-Dtype: uint8 bodies (4x smaller) match the float32 path."""
    import urllib.error
    import urllib.request

    from ffrnet_tpu.serving import EmbeddingHTTPServer

    rng = np.random.default_rng(31)
    u8 = rng.integers(0, 256, (4, 112, 112, 3), dtype=np.uint8)
    xf = (u8.astype(np.float32) / 255.0 - 0.5) / 0.5
    svc = EmbeddingService(model, max_batch=8, max_delay_s=0.0)
    with EmbeddingHTTPServer(svc) as srv:
        base = f"http://127.0.0.1:{srv.port}"

        def post(path, body, headers):
            return urllib.request.urlopen(urllib.request.Request(
                base + path, data=body, method="POST",
                headers=headers)).read()

        out_f = post("/embed", np.ascontiguousarray(xf, "<f4").tobytes(), {})
        out_u = post("/embed", u8.tobytes(), {"X-Input-Dtype": "uint8"})
        ef = np.frombuffer(out_f, "<f4").reshape(2, 4, 512)
        eu = np.frombuffer(out_u, "<f4").reshape(2, 4, 512)
        np.testing.assert_allclose(eu, ef, atol=1e-5, rtol=1e-5)
        # wrong payload size for the declared dtype -> 400
        try:
            post("/embed", u8.tobytes()[:-1], {"X-Input-Dtype": "uint8"})
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # unknown dtype -> 400
        try:
            post("/embed", u8.tobytes(), {"X-Input-Dtype": "int16"})
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    svc.close()


@pytest.mark.slow
def test_bench_serving_tool_smoke(capsys):
    from ffrnet_tpu.tools import bench_serving

    out = bench_serving.main([
        "--clients", "2", "--group", "2", "--seconds", "0.5",
        "--max_batch", "4", "--buckets", "4", "--dtype", "fp32"])
    assert out["metric"] == "served_faces_per_sec"
    assert out["value"] > 0 and out["dispatches"] >= 1
    assert out["latency_ms_p50"] is not None
    out_u8 = bench_serving.main([
        "--clients", "2", "--group", "2", "--seconds", "0.5",
        "--max_batch", "4", "--buckets", "4", "--dtype", "fp32",
        "--wire", "uint8"])
    assert out_u8["wire"] == "uint8" and out_u8["value"] > 0
    assert out_u8["client_errors"] == 0


def test_service_drains_queue_on_close(model):
    x = _faces(6, seed=11)
    svc = EmbeddingService(model, max_batch=2, max_delay_s=0.0)
    futs = [svc.submit(x[i]) for i in range(6)]
    svc.close()  # must resolve everything already accepted
    for i, f in enumerate(futs):
        raw, _ = f.result(timeout=60)
        assert raw.shape == (1, 512)


def test_http_hardening_and_submit_copy(model):
    """Round-1 advisor findings: request-size cap (413 before reading),
    X-Labels-Json for comma/unicode labels, X-Labels mismatch messaging,
    api.verify length validation, submit() buffer-copy semantics."""
    import urllib.error
    import urllib.request

    from ffrnet_tpu.serving import EmbeddingHTTPServer

    x = _faces(4, seed=41)

    # api.verify: mismatched sides must raise, not mis-pair silently
    with pytest.raises(ValueError, match="same number"):
        model.verify(x[:1], x[1:4])

    svc = EmbeddingService(model, max_batch=8, max_delay_s=0.0)

    # submit(): mutating the caller's buffer after submit must not corrupt
    # the batched result (the service copies on ingestion)
    buf = x.copy()
    expected = np.asarray(model.embed(buf)[1], np.float32)
    fut = svc.submit(buf)
    buf[:] = 0.0
    got = np.asarray(fut.result()[1], np.float32)
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)

    with EmbeddingHTTPServer(svc, max_request_faces=2) as srv:
        base = f"http://127.0.0.1:{srv.port}"

        def post(path, data, headers=None):
            return urllib.request.urlopen(urllib.request.Request(
                base + path, data=data, method="POST",
                headers=headers or {}))

        body3 = np.ascontiguousarray(x[:3], "<f4").tobytes()
        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/embed", body3)
        assert ei.value.code == 413

        # enroll with labels a comma protocol cannot carry
        labels = ["smith, jane", "unicode ü"]
        body2 = np.ascontiguousarray(x[:2], "<f4").tobytes()
        r = json.loads(post("/enroll", body2, {
            "X-Labels-Json": json.dumps(labels)}).read())
        assert r["enrolled"] == 2
        out = json.loads(post("/identify", np.ascontiguousarray(
            x[:1], "<f4").tobytes()).read())
        assert out["labels"][0][0] == "smith, jane"

        # comma-split mismatch stays a loud 400 pointing at X-Labels-Json
        body1 = np.ascontiguousarray(x[:1], "<f4").tobytes()
        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/enroll", body1, {"X-Labels": "smith, jane"})
        assert ei.value.code == 400
        assert b"X-Labels-Json" in ei.value.read()

        # malformed X-Labels-Json -> 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/enroll", body2, {"X-Labels-Json": "{notalist}"})
        assert ei.value.code == 400
    svc.close()


@pytest.mark.slow  # int8 CPU emulation + the eager calibration pass ~4 min
def test_service_int8_static_same_api_and_close_embeddings(model):
    """VERDICT r2 #5: an int8-prepared (calibrated static-scale) model
    behaves identically through EmbeddingService — same API, same shapes,
    embeddings cosine-close to the float model's."""
    x = _faces(4, seed=21)
    m8 = model.prepare(quantize_int8=True).calibrate_int8([_faces(2, seed=22)])
    raw_f, rect_f = model.embed(x)
    with EmbeddingService(m8, max_batch=4, max_delay_s=0.0,
                          buckets=(4,)) as svc:
        raw, rect = svc.submit(x).result(timeout=300)
    assert raw.shape == (4, 512) and rect.shape == (4, 512)

    def cos(a, b):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        return (a * b).sum(1) / np.maximum(
            np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1), 1e-12)

    assert cos(raw, raw_f).min() > 0.99   # held-out vs calibration batch
    assert cos(rect, rect_f).min() > 0.99
    # (batch-composition determinism of static scales is unit-covered in
    # tests/test_quant.py; re-checking here would cost a batch-1 compile)


def test_calibrate_int8_requires_quantized(model):
    with pytest.raises(ValueError, match="quantize_int8"):
        model.calibrate_int8([_faces(2)])


def test_http_round5_hardening(model):
    """Round-5 review findings: malformed Content-Length answers 400
    instead of dropping the connection; a chunked body (no length) gets
    400 AND a closed connection (its unread body would desync pipelined
    requests); close() before start() must not deadlock; an empty submit
    group resolves immediately without a padded dispatch."""
    import socket
    import time as _time

    from ffrnet_tpu.serving import EmbeddingHTTPServer

    svc = EmbeddingService(model, max_batch=8, max_delay_s=0.0)

    # close() before start(): stdlib shutdown() waits on an event only
    # serve_forever() sets — this used to hang forever
    srv0 = EmbeddingHTTPServer(svc)
    t0 = _time.time()
    srv0.close()
    assert _time.time() - t0 < 5.0

    # empty group: immediate empty result, no collector dispatch
    raw, rect = svc.submit(
        np.zeros((0, 112, 112, 3), np.float32)).result(timeout=5)
    assert raw.shape == (0, 512) and rect.shape == (0, 512)

    with EmbeddingHTTPServer(svc) as srv:

        def raw_request(req_bytes):
            with socket.create_connection(("127.0.0.1", srv.port),
                                          timeout=10) as s:
                s.sendall(req_bytes)
                s.settimeout(10)
                data = b""
                while True:
                    chunk = s.recv(4096)
                    if not chunk:
                        break
                    data += chunk
                return data

        resp = raw_request(b"POST /embed HTTP/1.1\r\nHost: x\r\n"
                           b"Content-Length: abc\r\n\r\n")
        assert resp.split(b"\r\n", 1)[0].split()[1] == b"400", resp[:100]

        resp = raw_request(
            b"POST /embed HTTP/1.1\r\nHost: x\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n5\r\nhello\r\n0\r\n\r\n")
        assert resp.split(b"\r\n", 1)[0].split()[1] == b"400", resp[:100]
        # exactly ONE response then the socket closed: the chunked bytes
        # were never parsed as a second request
        assert resp.count(b"HTTP/1.") == 1
    svc.close()
