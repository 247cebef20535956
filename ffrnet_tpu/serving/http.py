"""Minimal production HTTP front for EmbeddingService (stdlib-only).

A threaded `http.server` wrapper so non-Python clients can hit the
micro-batching service; each HTTP worker thread blocks on its request's
Future while the collector coalesces across connections — concurrency maps
straight onto the service's batching. No web framework is required (and
none ships in this image); the wire format is raw little-endian bytes to
keep client code trivial.

Endpoints:
  POST /embed     body = float32 LE bytes of (N, 112, 112, 3) in [-1,1] BGR
                  (N inferred from content length)
                  -> 200, body = float32 LE bytes of (2, N, 512):
                     [raw_embedding, rectified_embedding]
  POST /verify    body = float32 LE bytes of (2*N, 112, 112, 3) — first N =
                  img1, last N = img2 -> float32 LE bytes of (N,) cosine
                  scores (rectified embeddings)
  GET  /healthz   -> 200 "ok" once the service is up
  GET  /stats     -> 200 JSON ServiceStats snapshot

The reference repo has no network surface at all; this is deployment-side
infrastructure on top of the rebuilt models (lfw/lfw_eval.py is its closest
analog: offline, whole-dataset, in-process).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple

import numpy as np

FACE_SHAPE = (112, 112, 3)
_FACE_BYTES = int(np.prod(FACE_SHAPE)) * 4


class EmbeddingHTTPServer:
    """Serve an EmbeddingService over HTTP. Start with .start(); stop with
    .close(). `addr` is (host, port); port 0 picks a free port (see
    .port after start)."""

    def __init__(self, service, addr: Tuple[str, int] = ("127.0.0.1", 0)):
        self._service = service
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet: stats live at /stats
                pass

            def _reply(self, code: int, body: bytes,
                       ctype: str = "application/octet-stream"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply(200, b"ok", "text/plain")
                elif self.path == "/stats":
                    s = outer._service.stats
                    self._reply(200, json.dumps({
                        "requests": s.requests, "faces": s.faces,
                        "batches": s.batches, "errors": s.errors,
                        "padded_faces": s.padded_faces,
                        "mean_batch": s.mean_batch,
                    }).encode(), "application/json")
                else:
                    self._reply(404, b"not found", "text/plain")

            def _read_faces(self) -> Optional[np.ndarray]:
                n_bytes = int(self.headers.get("Content-Length", 0))
                if n_bytes <= 0 or n_bytes % _FACE_BYTES:
                    self._reply(400, b"body must be float32 LE (N,112,112,3)",
                                "text/plain")
                    return None
                raw = self.rfile.read(n_bytes)
                n = n_bytes // _FACE_BYTES
                return np.frombuffer(raw, "<f4").reshape((n,) + FACE_SHAPE)

            def do_POST(self):
                faces = self._read_faces()
                if faces is None:
                    return
                try:
                    if self.path == "/embed":
                        raw, rect = outer._service.submit(faces).result()
                        out = np.stack([np.asarray(raw, np.float32),
                                        np.asarray(rect, np.float32)])
                        self._reply(200, out.astype("<f4").tobytes())
                    elif self.path == "/verify":
                        n = faces.shape[0]
                        if n % 2:
                            self._reply(400, b"verify needs an even count",
                                        "text/plain")
                            return
                        _, rect = outer._service.submit(faces).result()
                        rect = np.asarray(rect, np.float32)
                        a, b = rect[: n // 2], rect[n // 2:]
                        a = a / np.linalg.norm(a, axis=1, keepdims=True)
                        b = b / np.linalg.norm(b, axis=1, keepdims=True)
                        scores = np.sum(a * b, axis=1)
                        self._reply(200, scores.astype("<f4").tobytes())
                    else:
                        self._reply(404, b"not found", "text/plain")
                except Exception as e:  # noqa: BLE001 — HTTP error, not a crash
                    self._reply(500, repr(e).encode(), "text/plain")

        self._httpd = ThreadingHTTPServer(addr, Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True,
                                        name="ffrnet-http-server")

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "EmbeddingHTTPServer":
        self._thread.start()
        return self

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=10)

    def __enter__(self) -> "EmbeddingHTTPServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.close()
