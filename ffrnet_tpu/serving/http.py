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
                  All face-body endpoints also accept raw uint8 pixels
                  (0..255 BGR, 4x smaller requests) with header
                  X-Input-Dtype: uint8; the server applies the standard
                  (x/255 - 0.5)/0.5 normalization before batching.
  POST /verify    body = float32 LE bytes of (2*N, 112, 112, 3) — first N =
                  img1, last N = img2 -> float32 LE bytes of (N,) cosine
                  scores (rectified embeddings)
  POST /enroll    1:N gallery enrollment. Labels via ONE of:
                    X-Labels:      comma-separated N labels — labels must
                                   not contain ',' and must be Latin-1
                                   (HTTP header charset); or
                    X-Labels-Json: JSON array of N strings, ASCII-encoded
                                   (json.dumps default ensure_ascii \\u
                                   escapes make any unicode label
                                   header-safe)
                  body = N faces as above -> JSON {"enrolled": N,
                  "gallery_size": G}
  POST /identify  Header X-Top-K (default 1); body = P faces -> JSON
                  {"labels": [[...k per probe]], "scores": [[...]]}
  GET  /healthz   -> 200 "ok" once the service is up
  GET  /stats     -> 200 JSON ServiceStats snapshot

All POST bodies are capped at `max_request_faces` faces (default 4096,
~616 MB; constructor arg): larger Content-Lengths get 413 BEFORE the body
is read, so one client cannot exhaust host memory on a public bind.

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
_FACE_PIXELS = int(np.prod(FACE_SHAPE))
_FACE_BYTES = _FACE_PIXELS * 4


def _scatter_rows(g, emb, off):
    """Write emb into rows [off, off+len(emb)) of g with a TRACED offset:
    one compiled program per (capacity, chunk) shape pair, reused across
    every enroll offset (a static .at[off:...] would recompile per offset)."""
    global _SCATTER
    if _SCATTER is None:
        import jax
        from jax import lax

        _SCATTER = jax.jit(
            lambda g_, e_, o_: lax.dynamic_update_slice(g_, e_, (o_, 0)))
    return _SCATTER(g, emb, off)


_SCATTER = None  # module-level cache: ONE jit wrapper (a fresh jax.jit per
# call would re-trace every enroll and defeat the reuse this exists for)


class EmbeddingHTTPServer:
    """Serve an EmbeddingService over HTTP. Start with .start(); stop with
    .close(). `addr` is (host, port); port 0 picks a free port (see
    .port after start)."""

    def __init__(self, service, addr: Tuple[str, int] = ("127.0.0.1", 0),
                 gallery=None, max_request_faces: int = 4096):
        self._service = service
        self._max_request_faces = int(max_request_faces)
        # 1:N gallery state for /enroll + /identify (embeddings stacked on
        # device, labels host-side); guarded — enrolls can race identifies
        self._gallery_lock = threading.Lock()
        self._gallery_emb = None      # (cap, 512) jnp array or None
        self._gallery_labels: list = []
        self._gallery_valid = None    # device scalar = live row count
        if gallery is not None:       # warm start from eval.search.Gallery
            self._enroll(gallery.embeddings, list(gallery.labels))
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
                dtype = self.headers.get("X-Input-Dtype", "float32").lower()
                if dtype not in ("float32", "uint8"):
                    self.close_connection = True
                    self._reply(400, b"X-Input-Dtype must be float32 or "
                                b"uint8", "text/plain")
                    return None
                face_bytes = _FACE_PIXELS if dtype == "uint8" else _FACE_BYTES
                try:
                    n_bytes = int(self.headers.get("Content-Length", 0))
                except (TypeError, ValueError):
                    # malformed header: answer 400 instead of letting the
                    # ValueError escape into socketserver (which drops the
                    # connection with a traceback and no HTTP reply)
                    self.close_connection = True
                    self._reply(400, b"malformed Content-Length",
                                "text/plain")
                    return None
                limit = outer._max_request_faces * face_bytes
                if n_bytes > limit:
                    # refuse BEFORE reading: draining a multi-GB body would
                    # be the memory exhaustion this cap exists to prevent
                    self.close_connection = True
                    self._reply(
                        413,
                        f"body exceeds max_request_faces="
                        f"{outer._max_request_faces} faces "
                        f"({limit} bytes)".encode(), "text/plain")
                    return None
                if n_bytes <= 0 or n_bytes % face_bytes:
                    if n_bytes <= 0:
                        # no declared length (e.g. Transfer-Encoding:
                        # chunked): the body CANNOT be drained, so the
                        # connection must close or its unread bytes desync
                        # every pipelined request on this socket
                        self.close_connection = True
                    # drain the declared body first: leaving it unread would
                    # desync the next request on a keep-alive connection
                    remaining = n_bytes
                    while remaining > 0:
                        chunk = self.rfile.read(min(remaining, 1 << 20))
                        if not chunk:
                            break
                        remaining -= len(chunk)
                    self._reply(400, b"body must be %s LE (N,112,112,3)"
                                % dtype.encode(), "text/plain")
                    return None
                raw = self.rfile.read(n_bytes)
                n = n_bytes // face_bytes
                if dtype == "uint8":
                    from ffrnet_tpu.data.datasets import _to_unit

                    return _to_unit(np.frombuffer(raw, np.uint8).reshape(
                        (n,) + FACE_SHAPE))
                return np.frombuffer(raw, "<f4").reshape((n,) + FACE_SHAPE)

            def _embed_chunked(self, faces):
                """submit() in max_batch chunks so a large POST (e.g. a bulk
                /enroll) is served instead of erroring; returns
                (raw, rect) as float32 numpy arrays."""
                mb = outer._service.max_batch
                raws, rects = [], []
                futs = [outer._service.submit(faces[i:i + mb])
                        for i in range(0, faces.shape[0], mb)]
                for f in futs:
                    raw, rect = f.result()
                    raws.append(np.asarray(raw, np.float32))
                    rects.append(np.asarray(rect, np.float32))
                return np.concatenate(raws), np.concatenate(rects)

            def do_POST(self):
                faces = self._read_faces()
                if faces is None:
                    return
                try:
                    if self.path == "/embed":
                        raw, rect = self._embed_chunked(faces)
                        out = np.stack([raw, rect])
                        # copy=False: astype would otherwise copy the
                        # already-f4-LE array just before tobytes copies it
                        # again (~17MB of waste on a 4096-face request)
                        self._reply(200,
                                    out.astype("<f4", copy=False).tobytes())
                    elif self.path == "/verify":
                        n = faces.shape[0]
                        if n % 2:
                            self._reply(400, b"verify needs an even count",
                                        "text/plain")
                            return
                        _, rect = self._embed_chunked(faces)
                        a, b = rect[: n // 2], rect[n // 2:]
                        # same epsilon semantics as the in-process scorer
                        # (eval.lfw.pair_cosine): a zero-norm embedding
                        # yields 0.0, never NaN
                        scores = np.sum(a * b, axis=1) / (
                            np.linalg.norm(a, axis=1)
                            * np.linalg.norm(b, axis=1) + 1e-8)
                        self._reply(200, scores.astype(
                            "<f4", copy=False).tobytes())
                    elif self.path == "/enroll":
                        labels_json = self.headers.get("X-Labels-Json")
                        if labels_json is not None:
                            # explicit checks, not assert: asserts vanish
                            # under python -O and this is input validation
                            try:
                                labels = json.loads(labels_json)
                            except ValueError:
                                labels = None
                            if not (isinstance(labels, list) and all(
                                    isinstance(s, str) for s in labels)):
                                self._reply(
                                    400, b"X-Labels-Json must be a JSON "
                                    b"array of strings", "text/plain")
                                return
                        else:
                            labels = [s for s in
                                      self.headers.get("X-Labels",
                                                       "").split(",")
                                      if s]
                        if len(labels) != faces.shape[0]:
                            self._reply(
                                400, b"label count != face count (labels "
                                b"with ',' need X-Labels-Json)", "text/plain")
                            return
                        _, rect = self._embed_chunked(faces)
                        g = outer._enroll(rect, labels)
                        self._reply(200, json.dumps(
                            {"enrolled": len(labels),
                             "gallery_size": g}).encode(),
                            "application/json")
                    elif self.path == "/identify":
                        try:
                            k = int(self.headers.get("X-Top-K", "1"))
                        except ValueError:
                            self._reply(400, b"X-Top-K must be an integer",
                                        "text/plain")
                            return
                        _, rect = self._embed_chunked(faces)
                        res = outer._identify(rect, k)
                        if res is None:
                            self._reply(409, b"gallery is empty or k too "
                                        b"large; POST /enroll first",
                                        "text/plain")
                            return
                        self._reply(200, json.dumps(res).encode(),
                                    "application/json")
                    else:
                        self._reply(404, b"not found", "text/plain")
                except Exception as e:  # noqa: BLE001 — HTTP error, not a crash
                    self._reply(500, repr(e).encode(), "text/plain")

        self._httpd = ThreadingHTTPServer(addr, Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True,
                                        name="ffrnet-http-server")

    # --------------------------------------------------------- 1:N gallery
    # The gallery array is kept at power-of-two CAPACITY (zero rows beyond
    # the live count are masked out at search time via the traced `valid`),
    # and rows are written with a TRACED offset — so per-face enrolls reuse
    # one compiled update program and one compiled search program until
    # capacity doubles. The live count is cached as a device scalar so
    # /identify ships no host leaf through the relay per call.
    def _enroll(self, rect_emb, labels) -> int:
        import jax.numpy as jnp

        emb = jnp.asarray(rect_emb, jnp.float32)
        with self._gallery_lock:
            off = len(self._gallery_labels)
            n_new = off + emb.shape[0]
            cap = max(8, 1 << (n_new - 1).bit_length())
            g = self._gallery_emb
            if g is None:
                g = jnp.zeros((cap, emb.shape[1]), jnp.float32)
            elif g.shape[0] < cap:
                g = jnp.concatenate(
                    [g, jnp.zeros((cap - g.shape[0], g.shape[1]),
                                  jnp.float32)], axis=0)
            self._gallery_emb = _scatter_rows(g, emb, off)
            self._gallery_labels.extend(labels)
            self._gallery_valid = jnp.asarray(n_new, jnp.int32)
            return n_new

    def gallery(self):
        """Snapshot the live rows as an eval.search.Gallery (persist with
        its .save(); warm-start a new server via the `gallery=` ctor arg)."""
        from ffrnet_tpu.eval.search import Gallery

        with self._gallery_lock:
            if self._gallery_emb is None:
                return Gallery(np.zeros((0, 512), np.float32), [])
            n = len(self._gallery_labels)
            return Gallery(self._gallery_emb[:n], list(self._gallery_labels))

    def _identify(self, rect_emb, k: int):
        import jax.numpy as jnp

        from ffrnet_tpu.eval.search import top_k_identify

        with self._gallery_lock:
            gal, valid = self._gallery_emb, self._gallery_valid
            labels = list(self._gallery_labels)
        if gal is None or k < 1 or k > len(labels):
            return None
        # pad probes to a multiple of 8 so arbitrary request sizes reuse a
        # few compiled programs (valid is traced: no recompile per count)
        p = rect_emb.shape[0]
        pp = -(-p // 8) * 8
        rect = jnp.asarray(rect_emb)
        if pp != p:
            rect = jnp.pad(rect, ((0, pp - p), (0, 0)))
        scores, idx = top_k_identify(rect, gal, k=k, valid=valid)
        scores, idx = scores[:p], idx[:p]
        idx = np.asarray(idx)
        return {"labels": [[labels[j] for j in row] for row in idx],
                "scores": np.asarray(scores, np.float32).round(6).tolist()}

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "EmbeddingHTTPServer":
        self._thread.start()
        return self

    def close(self) -> None:
        # shutdown() blocks on an event only serve_forever() sets — calling
        # it when start() never ran would deadlock forever (stdlib
        # contract); a started-then-exited thread has the event set, so
        # shutdown() returns immediately there
        if self._thread.is_alive():
            self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread.is_alive():
            self._thread.join(timeout=10)

    def __enter__(self) -> "EmbeddingHTTPServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.close()
