"""Smoke-run every examples/ quickstart in-process (runpy as __main__,
CPU via conftest), locking the documented user journeys against bit-rot.
The reference repo ships no runnable examples at all — its quickstart is
prose in README.md:22-41."""

import os
import runpy
import sys

import pytest

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")


def _run(name, argv):
    old_argv = sys.argv
    sys.argv = [name] + argv
    try:
        runpy.run_path(os.path.join(EXAMPLES, name), run_name="__main__")
    finally:
        sys.argv = old_argv


def test_embed_and_verify_example(capsys):
    _run("embed_and_verify.py", [])
    out = capsys.readouterr().out
    assert "raw embeddings (8, 512)" in out
    assert "pair scores:" in out


@pytest.fixture
def tiny_service(monkeypatch):
    """Shrink the service bucket ladder for the serving examples: the
    examples use max_batch=256, whose warmup compiles the full encoder +
    RecNet once per bucket — tens of minutes on this 1-core CPU. One
    16-bucket keeps the exact code path (pad -> dispatch -> unpad) at
    smoke-test cost; the full ladder is covered by tests/test_serving.py."""
    from ffrnet_tpu.serving import service as svc_mod

    orig = svc_mod.EmbeddingService.__init__

    def tiny(self, model, max_batch=256, **kw):
        kw.pop("buckets", None)
        orig(self, model, max_batch=16, buckets=(16,), **kw)

    monkeypatch.setattr(svc_mod.EmbeddingService, "__init__", tiny)


@pytest.mark.slow
def test_train_synthetic_example(capsys):
    _run("train_synthetic.py", ["2"])
    out = capsys.readouterr().out
    assert "total=" in out and "acc=" in out


@pytest.mark.slow
def test_int8_serving_example(tiny_service, capsys):
    _run("int8_serving.py", [])
    out = capsys.readouterr().out
    assert "int8 embeddings: raw (16, 512) rectified (16, 512)" in out


@pytest.mark.slow
def test_serve_http_example(tiny_service, monkeypatch, capsys):
    # the example blocks in time.sleep until Ctrl-C; simulate the Ctrl-C
    # so the test exercises startup (shard + warmup + HTTP bind on an
    # ephemeral port) and the clean shutdown path. Live request/response
    # traffic is covered by tests/test_serving.py.
    import time as time_mod

    def fake_sleep(_):
        raise KeyboardInterrupt

    monkeypatch.setattr(time_mod, "sleep", fake_sleep)
    _run("serve_http.py", ["0"])
    out = capsys.readouterr().out
    assert "serving on :" in out
    assert "served" in out  # stats line after clean shutdown
