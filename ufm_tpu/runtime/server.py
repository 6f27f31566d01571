"""HTTP serving daemon for UFM-TPU.

The reference has no deployment story at all — its demo reloads the module
tree from the HuggingFace hub per process (reference gradio_demo.py:29-56).
This daemon completes ours: a stdlib-only HTTP front end over
:class:`~ufm_tpu.runtime.batcher.ServingRuntime` (C++ continuous batcher)
serving either a live model or a compiled ``.ufmx`` artifact
(:func:`~ufm_tpu.runtime.export.load_artifact_model`) — the production
layout being *artifact in, flows out* with zero flax/checkpoint machinery
in the serving process.

Endpoints
---------
``GET /healthz``
    JSON: model class, native resolution, backend, uptime.
``GET /stats``
    JSON: batcher counters (submitted/completed/batches) per shape lane.
``POST /v1/predict``
    Request body: an ``.npz`` with ``source``/``target`` uint8 HWC arrays,
    or JSON ``{"source_png_b64": ..., "target_png_b64": ...}``.
    Response: an ``.npz`` stream with ``flow`` (2,H,W) float32 at the input
    resolution, ``covisibility`` (H,W), and ``keypoint_confidence`` (H,W)
    when the model produces it.

Requests are grouped into per-input-shape lanes; each lane owns one
``ServingRuntime`` so the device always sees one static batch shape per
lane (one compile, reused forever).
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Tuple

import numpy as np

from ufm_tpu.runtime.batcher import ServingRuntime

__all__ = ["UFMServer", "serve"]


def _decode_request(body: bytes, content_type: str) -> Tuple[np.ndarray, np.ndarray]:
    if content_type.startswith("application/json"):
        import base64

        import cv2

        payload = json.loads(body.decode("utf-8"))
        out = []
        for key in ("source_png_b64", "target_png_b64"):
            if key not in payload:
                raise ValueError(f"JSON request missing {key!r}")
            raw = np.frombuffer(base64.b64decode(payload[key]), dtype=np.uint8)
            bgr = cv2.imdecode(raw, cv2.IMREAD_COLOR)
            if bgr is None:
                raise ValueError(f"{key}: not a decodable image")
            out.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
        return out[0], out[1]

    with np.load(io.BytesIO(body)) as z:
        if "source" not in z or "target" not in z:
            raise ValueError("npz request must contain 'source' and 'target' arrays")
        return np.asarray(z["source"]), np.asarray(z["target"])


def _encode_result(result: Dict[str, np.ndarray]) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **result)
    return buf.getvalue()


class UFMServer:
    """Serving daemon: per-shape continuous-batching lanes over one model."""

    def __init__(
        self,
        model,
        host: str = "127.0.0.1",
        port: int = 8000,
        max_batch: int = 1,
        max_delay_ms: float = 3.0,
    ):
        self.model = model
        self.host = host
        self.port = port
        self.max_batch = int(max_batch)
        self.max_delay_ms = float(max_delay_ms)
        self._lanes: Dict[Tuple[int, ...], ServingRuntime] = {}
        self._lane_lock = threading.Lock()
        self._started = time.time()
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None

    # -- model plumbing ----------------------------------------------------
    def _predict_batch(self, src: np.ndarray, tgt: np.ndarray) -> list:
        res = self.model.predict_correspondences_batched(src, tgt)
        flow = np.asarray(res.flow.flow_output, dtype=np.float32)
        covis = np.asarray(res.covisibility.mask, dtype=np.float32)
        conf = (
            np.asarray(res.keypoint_confidence, dtype=np.float32)
            if getattr(res, "keypoint_confidence", None) is not None
            else None
        )
        out = []
        for i in range(flow.shape[0]):
            rec = {"flow": flow[i], "covisibility": covis[i]}
            if conf is not None:
                rec["keypoint_confidence"] = conf[i]
            out.append(rec)
        return out

    def _lane(self, shape: Tuple[int, ...]) -> ServingRuntime:
        with self._lane_lock:
            lane = self._lanes.get(shape)
            if lane is None:
                lane = ServingRuntime(
                    self._predict_batch,
                    max_batch=self.max_batch,
                    max_delay_ms=self.max_delay_ms,
                )
                self._lanes[shape] = lane
            return lane

    def predict(self, source: np.ndarray, target: np.ndarray) -> Dict[str, np.ndarray]:
        for name, img in (("source", source), ("target", target)):
            if img.ndim != 3 or img.shape[-1] != 3:
                raise ValueError(f"expected HWC RGB {name} image, got shape {img.shape}")
        # source and target may differ in resolution (the reference's real
        # bike pair is 1080x1080 vs 607x1080): each view is resized to the
        # model grid independently, so lanes are keyed by the shape PAIR —
        # one static batch shape per lane either way
        key = tuple(source.shape) + tuple(target.shape)
        fut = self._lane(key).infer(source, target)
        return fut.result(timeout=300.0)

    # -- HTTP --------------------------------------------------------------
    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt, *a):  # quiet by default
                pass

            def _send(self, code: int, body: bytes, ctype: str) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _send_json(self, code: int, obj) -> None:
                self._send(code, json.dumps(obj).encode("utf-8"), "application/json")

            def do_GET(self):
                if self.path == "/healthz":
                    import jax

                    w, h = server.model.inference_resolution[0]
                    self._send_json(
                        200,
                        {
                            "status": "ok",
                            "model_class": type(server.model).__name__,
                            "resolution_wh": [w, h],
                            "backend": jax.default_backend(),
                            "uptime_s": round(time.time() - server._started, 1),
                            "lanes": len(server._lanes),
                        },
                    )
                elif self.path == "/stats":
                    with server._lane_lock:
                        stats = {
                            "x".join(map(str, shape)): lane.stats()
                            for shape, lane in server._lanes.items()
                        }
                    self._send_json(200, stats)
                else:
                    self._send_json(404, {"error": f"unknown path {self.path}"})

            def do_POST(self):
                if self.path != "/v1/predict":
                    self._send_json(404, {"error": f"unknown path {self.path}"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    body = self.rfile.read(length)
                    src, tgt = _decode_request(body, self.headers.get("Content-Type", ""))
                    result = server.predict(src, tgt)
                except ValueError as e:
                    self._send_json(400, {"error": str(e)})
                    return
                except Exception as e:  # noqa: BLE001 — wire errors back, keep serving
                    self._send_json(500, {"error": f"{type(e).__name__}: {e}"})
                    return
                self._send(200, _encode_result(result), "application/x-npz")

        return Handler

    def start(self) -> None:
        self._httpd = ThreadingHTTPServer((self.host, self.port), self._make_handler())
        self.port = self._httpd.server_address[1]  # resolve port 0
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="ufm-http", daemon=True
        )
        self._thread.start()

    def serve_forever(self) -> None:
        self.start()
        assert self._thread is not None
        self._thread.join()

    def close(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        with self._lane_lock:
            for lane in self._lanes.values():
                lane.close()
            self._lanes.clear()


def serve(model, host: str = "127.0.0.1", port: int = 8000, **kw) -> UFMServer:
    """Start a daemon (non-blocking) and return it; ``.close()`` to stop."""
    server = UFMServer(model, host=host, port=port, **kw)
    server.start()
    return server
