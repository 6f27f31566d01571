"""HTTP serving daemon: wire formats, batching lanes, error paths.

The daemon (runtime/server.py) is the deployment story the reference lacks
(its demo reloads the module tree from the hub per process,
reference gradio_demo.py:29-56): artifact/model in, flows over HTTP out,
continuous batching per input shape. These tests run the real HTTP stack
on a loopback port against a tiny random-init model.
"""

import base64
import io
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from ufm_tpu.models import UniFlowMatchConfidence, ufm_tiny_config
from ufm_tpu.runtime.server import UFMServer

# live-daemon heavyweights: excluded from the quick lane (pytest -m "not slow")
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def server():
    model = UniFlowMatchConfidence.from_config(ufm_tiny_config())
    srv = UFMServer(model, port=0, max_batch=2, max_delay_ms=1.0)
    srv.start()
    yield srv
    srv.close()


def _url(server, path):
    return f"http://{server.host}:{server.port}{path}"


def _post(server, body, content_type):
    req = urllib.request.Request(
        _url(server, "/v1/predict"), data=body, headers={"Content-Type": content_type}
    )
    return urllib.request.urlopen(req, timeout=300)


def _npz_body(src, tgt):
    buf = io.BytesIO()
    np.savez(buf, source=src, target=tgt)
    return buf.getvalue()


def test_healthz(server):
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=30) as r:
        info = json.loads(r.read())
    assert info["status"] == "ok"
    assert info["model_class"] == "UniFlowMatchConfidence"
    assert len(info["resolution_wh"]) == 2


def test_predict_npz_roundtrip(server, rng):
    src = np.asarray(rng.integers(0, 255, (96, 128, 3)), dtype=np.uint8)
    tgt = np.asarray(rng.integers(0, 255, (96, 128, 3)), dtype=np.uint8)
    with _post(server, _npz_body(src, tgt), "application/x-npz") as r:
        assert r.headers["Content-Type"] == "application/x-npz"
        out = np.load(io.BytesIO(r.read()))
    assert out["flow"].shape == (2, 96, 128)
    assert out["covisibility"].shape == (96, 128)
    assert np.isfinite(out["flow"]).all()

    # The lane pads short batches to max_batch (static shape for the compile
    # cache; runtime/batcher.py:152-155), so the exact twin is a direct
    # predict on the same padded batch-2 input — row 0 must be bitwise equal.
    res = server.model.predict_correspondences_batched(np.stack([src, src]), np.stack([tgt, tgt]))
    np.testing.assert_array_equal(out["flow"], np.asarray(res.flow.flow_output[0]))
    np.testing.assert_array_equal(out["covisibility"], np.asarray(res.covisibility.mask[0]))
    # and the batch-1 program agrees to float tolerance
    res1 = server.model.predict_correspondences_batched(src, tgt)
    np.testing.assert_allclose(
        out["flow"], np.asarray(res1.flow.flow_output[0]), atol=1e-4, rtol=1e-3
    )


def test_predict_json_png(server, rng):
    cv2 = pytest.importorskip("cv2")
    src = np.asarray(rng.integers(0, 255, (64, 80, 3)), dtype=np.uint8)
    tgt = np.asarray(rng.integers(0, 255, (64, 80, 3)), dtype=np.uint8)
    body = json.dumps(
        {
            "source_png_b64": base64.b64encode(
                cv2.imencode(".png", cv2.cvtColor(src, cv2.COLOR_RGB2BGR))[1]
            ).decode(),
            "target_png_b64": base64.b64encode(
                cv2.imencode(".png", cv2.cvtColor(tgt, cv2.COLOR_RGB2BGR))[1]
            ).decode(),
        }
    ).encode()
    with _post(server, body, "application/json") as r:
        out = np.load(io.BytesIO(r.read()))
    assert out["flow"].shape == (2, 64, 80)


def test_concurrent_requests_batched(server, rng):
    """Multiple in-flight same-shape requests ride one batching lane and all
    complete with per-request results."""
    from concurrent.futures import ThreadPoolExecutor

    srcs = [np.asarray(rng.integers(0, 255, (96, 128, 3)), dtype=np.uint8) for _ in range(4)]
    tgts = [np.asarray(rng.integers(0, 255, (96, 128, 3)), dtype=np.uint8) for _ in range(4)]

    def call(i):
        with _post(server, _npz_body(srcs[i], tgts[i]), "application/x-npz") as r:
            return np.load(io.BytesIO(r.read()))["flow"]

    with ThreadPoolExecutor(4) as pool:
        flows = list(pool.map(call, range(4)))
    assert all(f.shape == (2, 96, 128) for f in flows)
    # distinct inputs give distinct flows (per-request demux is correct)
    assert np.abs(flows[0] - flows[1]).max() > 0


def test_predict_per_view_shapes(server, rng):
    """Source and target may differ in resolution (the reference's real bike
    pair is 1080x1080 vs 607x1080): each view resizes to the model grid
    independently and the lane is keyed by the shape PAIR. Outputs stay in
    the SOURCE frame."""
    src = np.asarray(rng.integers(0, 255, (96, 96, 3)), dtype=np.uint8)
    tgt = np.asarray(rng.integers(0, 255, (64, 112, 3)), dtype=np.uint8)
    with _post(server, _npz_body(src, tgt), "application/x-npz") as r:
        out = np.load(io.BytesIO(r.read()))
    assert out["flow"].shape == (2, 96, 96)
    assert out["covisibility"].shape == (96, 96)
    assert np.isfinite(out["flow"]).all()


def test_error_paths(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, b"not an npz", "application/x-npz")
    assert e.value.code in (400, 500)

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, _npz_body(np.zeros((4, 4), np.uint8), np.zeros((5, 4, 3), np.uint8)), "application/x-npz")
    assert e.value.code == 400
    assert "HWC" in json.loads(e.value.read())["error"]

    with urllib.request.urlopen(_url(server, "/stats"), timeout=30) as r:
        stats = json.loads(r.read())
    assert stats  # at least one lane exists by now


