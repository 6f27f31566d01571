"""Serving-path benchmarks on the real TPU (round-3; VERDICT r2 #8, #9).

Modes:
  stream     — the double-buffered streaming driver (ufm_tpu/runtime/
               streaming.py) feeding the flagship base-model forward at
               560x420: sustained wall-clock pairs/s over a synthetic pair
               stream. Through this session's tunnel every dispatch pays
               ~30-36 ms round trip, so the sustained rate here is a LOWER
               bound; on a directly-attached TPU host the driver overlaps
               host work with device compute and tracks the forward rate.
  refine_e2e — the refine variant's full public predict pipeline
               (uint8 pair -> normalize -> resize -> staged backbone+tail ->
               unmap), timed per call at batch 1 and 4.

Writes bench_serving.json incrementally.
"""

import json
import os
import sys
import time

import numpy as np

from bench_record import load_rec, save_rec

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "bench_serving.json")


def _load_rec():
    return load_rec(OUT)


def _save_rec(rec):
    save_rec(OUT, rec)


def bench_stream():
    import jax
    import jax.numpy as jnp

    from ufm_tpu.models import UFMNet, ufm_base_config
    from ufm_tpu.runtime.streaming import stream_predict

    batch = int(os.environ.get("UFM_BENCH_BATCH", "8"))
    n_batches = int(os.environ.get("UFM_BENCH_ITERS", "12"))
    h, w = 420, 560

    cfg = ufm_base_config()
    net = UFMNet(cfg)
    img = jnp.zeros((batch, h, w, 3), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), img, img)["params"]

    @jax.jit
    def fwd(p, s, t):
        out = net.apply({"params": p}, s, t)
        return {"flow": out["flow"], "covis": out["covis_mask"]}

    def forward(s, t):
        return fwd(params, jnp.asarray(s), jnp.asarray(t))

    rng = np.random.default_rng(0)
    pairs_np = [
        (rng.standard_normal((h, w, 3)).astype(np.float32),
         rng.standard_normal((h, w, 3)).astype(np.float32))
        for _ in range(batch * 2)
    ]

    def pair_iter(n):
        for i in range(n * batch):
            yield pairs_np[i % len(pairs_np)]

    # warm-up / compile
    for out in stream_predict(forward, pair_iter(2), batch):
        _ = float(np.asarray(out["flow"])[0, 0, 0, 0])

    t0 = time.perf_counter()
    consumed = 0
    for out in stream_predict(forward, pair_iter(n_batches), batch):
        _ = float(np.asarray(out["flow"])[0, 0, 0, 0])  # consume (sync) each batch
        consumed += batch
    dt = time.perf_counter() - t0
    rate = consumed / dt

    rec = _load_rec()
    rec["stream"] = {
        "batch": batch,
        "batches": n_batches,
        "pairs_per_sec_sustained": round(rate, 2),
        "note": "wall-clock through the session tunnel (~30-36 ms/dispatch); lower bound",
        "device": str(jax.devices()[0]),
    }
    _save_rec(rec)
    print(json.dumps(rec["stream"]), flush=True)


def bench_stream_device():
    """Sustained dispatch throughput with device-resident inputs.

    The full-transfer ``stream`` mode is bound by the session tunnel moving
    ~18 MB of images+outputs per batch over HTTP; on a directly-attached TPU
    host that traffic rides PCIe and overlaps with compute. This mode
    measures what the driver sustains when transfer is off the critical
    path: inputs pre-staged in a device-resident ring, each batch synced by
    fetching a single output scalar (4 bytes). This is the number to compare
    against the forward rate.
    """
    import jax
    import jax.numpy as jnp

    from ufm_tpu.models import UFMNet, ufm_base_config

    batch = int(os.environ.get("UFM_BENCH_BATCH", "8"))
    n_batches = int(os.environ.get("UFM_BENCH_ITERS", "24"))
    depth = int(os.environ.get("UFM_BENCH_PIPELINE", "2"))
    ring = 4
    h, w = 420, 560

    cfg = ufm_base_config()
    net = UFMNet(cfg)
    img = jnp.zeros((batch, h, w, 3), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), img, img)["params"]

    @jax.jit
    def fwd(p, s, t):
        out = net.apply({"params": p}, s, t)
        return {"flow": out["flow"], "covis": out["covis_mask"]}

    rng = np.random.default_rng(0)
    src_d = [jax.device_put(rng.standard_normal((batch, h, w, 3)).astype(np.float32)) for _ in range(ring)]
    tgt_d = [jax.device_put(rng.standard_normal((batch, h, w, 3)).astype(np.float32)) for _ in range(ring)]

    def sync(out):
        return float(jax.device_get(out["flow"][0, 0, 0, 0]))

    # warm-up / compile (forward + the scalar-slice fetch program)
    sync(fwd(params, src_d[0], tgt_d[0]))

    # depth-D pipeline: sync the batch D behind the freshest dispatch, so the
    # per-batch sync lands on work that already finished — the fetch round
    # trip rides on top of device compute instead of serializing with it.
    from collections import deque

    t0 = time.perf_counter()
    window: "deque" = deque()
    for i in range(n_batches):
        window.append(fwd(params, src_d[i % ring], tgt_d[i % ring]))
        if len(window) > depth:
            sync(window.popleft())
    while window:
        sync(window.popleft())
    dt = time.perf_counter() - t0
    rate = n_batches * batch / dt

    rec = _load_rec()
    rec["stream_device"] = {
        "batch": batch,
        "batches": n_batches,
        "pipeline_depth": depth,
        "pairs_per_sec_sustained": round(rate, 2),
        "note": "device-resident input ring, scalar-slice sync; transfer off critical path",
        "device": str(jax.devices()[0]),
    }
    _save_rec(rec)
    print(json.dumps(rec["stream_device"]), flush=True)


def bench_stream_device_refine():
    """Refine-variant sustained serving rate with device-resident inputs.

    The staged two-dispatch production path (UFMNet.backbone +
    UFMNet.refine_tail, intermediates device-resident — the same programs
    models/base.py dispatches), fed from a pre-staged input ring and synced
    by a single scalar fetch per batch: the portable refine serving figure
    (VERDICT r3 #3 — the tunnel-inclusive refine_e2e rows vary by multiples
    between measurement windows and are not portable)."""
    import jax
    import jax.numpy as jnp

    from ufm_tpu.models import UFMNet, ufm_refine_config

    batch = int(os.environ.get("UFM_BENCH_BATCH", "4"))
    n_batches = int(os.environ.get("UFM_BENCH_ITERS", "24"))
    depth = int(os.environ.get("UFM_BENCH_PIPELINE", "2"))
    ring = 4
    h, w = 420, 560

    cfg = ufm_refine_config()
    net = UFMNet(cfg)
    img = jnp.zeros((batch, h, w, 3), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), img, img)["params"]

    # params as ARGUMENTS (closing over the pytree balloons the remote
    # compile request — bench_refine_modes.py note)
    @jax.jit
    def bb(p, s, t):
        out = net.apply({"params": p}, s, t, method="backbone")
        return out["flow"], out["cls_in_0"], out["cls_in_1"]

    @jax.jit
    def tl(p, s, t, fl, c0, c1):
        out = net.apply({"params": p}, s, t, fl, c0, c1, method="refine_tail")
        return {"flow": out["flow"]}

    rng = np.random.default_rng(0)
    src_d = [jax.device_put(rng.standard_normal((batch, h, w, 3)).astype(np.float32)) for _ in range(ring)]
    tgt_d = [jax.device_put(rng.standard_normal((batch, h, w, 3)).astype(np.float32)) for _ in range(ring)]

    def sync(out):
        return float(jax.device_get(out["flow"][0, 0, 0, 0]))

    def staged(s, t):
        fl, c0, c1 = bb(params, s, t)
        return tl(params, s, t, fl, c0, c1)

    sync(staged(src_d[0], tgt_d[0]))  # compile both programs + fetch

    from collections import deque

    t0 = time.perf_counter()
    window: "deque" = deque()
    for i in range(n_batches):
        window.append(staged(src_d[i % ring], tgt_d[i % ring]))
        if len(window) > depth:
            sync(window.popleft())  # depth-D pipeline across the two-dispatch boundary
    while window:
        sync(window.popleft())
    dt = time.perf_counter() - t0
    rate = n_batches * batch / dt

    from bench_refine_modes import refine_config_hash

    rec = _load_rec()
    rec["stream_device_refine"] = {
        "batch": batch,
        "batches": n_batches,
        "pipeline_depth": depth,
        "pairs_per_sec_sustained": round(rate, 2),
        "config_hash": refine_config_hash(cfg),
        "note": (
            "staged backbone+refine_tail, device-resident input ring + "
            "device-resident intermediates, scalar-slice sync"
        ),
        "device": str(jax.devices()[0]),
    }
    _save_rec(rec)
    print(json.dumps(rec["stream_device_refine"]), flush=True)


def bench_refine_e2e():
    import jax

    from ufm_tpu.models import UniFlowMatchClassificationRefinement, ufm_refine_config

    model = UniFlowMatchClassificationRefinement.from_config(ufm_refine_config())
    rng = np.random.default_rng(0)
    rec = _load_rec()
    rec.setdefault("refine_e2e", {})

    for batch in (1, 4):
        src = rng.integers(0, 255, (batch, 3, 420, 560), dtype=np.uint8)
        tgt = rng.integers(0, 255, (batch, 3, 420, 560), dtype=np.uint8)

        def run():
            r = model.predict_correspondences_batched(source_image=src, target_image=tgt)
            return float(np.asarray(r.flow.flow_output)[0, 0, 0, 0])

        run()  # compile
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        p50 = float(np.median(times))
        rec["refine_e2e"][f"b{batch}"] = {
            "p50_ms_per_call": round(p50 * 1e3, 1),
            "pairs_per_sec": round(batch / p50, 2),
            "note": "staged two-dispatch path; includes tunnel + host<->device transfers",
        }
        _save_rec(rec)
        print(f"refine e2e b{batch}: {p50*1e3:.1f} ms/call = {batch/p50:.2f} pairs/s", flush=True)

    print(json.dumps(rec["refine_e2e"]), flush=True)


def bench_server_http():
    """The HTTP daemon under concurrent load (VERDICT r4 #4).

    N threaded clients posting npz pairs at `ufm serve`'s /v1/predict with
    max_batch=4 lanes: sustained pairs/s, per-request HTTP p50, and the C++
    continuous batcher's mean batch occupancy from /stats — the coalescing
    path demonstrated end-to-end rather than only via in-process drivers.
    Comparand: the full-transfer `stream` record (both move ~18 MB of
    images per batch through the session tunnel; the device-staged records
    measure the chip with transfer off the critical path)."""
    import http.client
    import io
    import threading

    from ufm_tpu.models import UniFlowMatch, ufm_base_config
    from ufm_tpu.runtime.server import UFMServer

    clients = int(os.environ.get("UFM_BENCH_CLIENTS", "8"))
    reqs_each = int(os.environ.get("UFM_BENCH_REQS", "8"))
    max_batch = int(os.environ.get("UFM_BENCH_MAXBATCH", "4"))
    h, w = 420, 560

    if os.environ.get("UFM_BENCH_TINY"):  # harness smoke on CPU — not a record
        from ufm_tpu.models import ufm_tiny_config

        model = UniFlowMatch.from_config(ufm_tiny_config())
    else:
        model = UniFlowMatch.from_config(ufm_base_config())
    # one lane (single input-shape pair); max_delay long enough that a lane
    # dispatch under tunnel latency (~30 ms RTT) can coalesce queued peers
    srv = UFMServer(model, port=0, max_batch=max_batch, max_delay_ms=15.0)
    srv.start()

    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    np.savez(
        buf,
        source=rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
        target=rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
    )
    body = buf.getvalue()

    def post_one(conn):
        conn.request("POST", "/v1/predict", body=body, headers={"Content-Type": "application/x-npz"})
        resp = conn.getresponse()
        data = resp.read()
        assert resp.status == 200, data[:200]
        with np.load(io.BytesIO(data)) as z:
            assert z["flow"].shape == (2, h, w)

    try:
        # compile the lane's single padded-batch program off the clock
        warm = http.client.HTTPConnection(srv.host, srv.port, timeout=600)
        post_one(warm)
        warm.close()

        latencies = []
        lat_lock = threading.Lock()
        errors = []

        def client_loop():
            try:
                conn = http.client.HTTPConnection(srv.host, srv.port, timeout=600)
                for _ in range(reqs_each):
                    t0 = time.perf_counter()
                    post_one(conn)
                    dt = time.perf_counter() - t0
                    with lat_lock:
                        latencies.append(dt)
                conn.close()
            except Exception as e:  # noqa: BLE001 — surface in the record
                errors.append(f"{type(e).__name__}: {e}")

        threads = [threading.Thread(target=client_loop) for _ in range(clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        assert not errors, errors[:3]

        stats = json.loads(
            _get_json(srv.host, srv.port, "/stats")
        )
        lane_stats = next(iter(stats.values())) if stats else {}
        done = len(latencies)
        rec = {} if os.environ.get("UFM_BENCH_TINY") else _load_rec()
        rec["server_http"] = {
            "clients": clients,
            "requests": done,
            "max_batch": max_batch,
            "pairs_per_sec_sustained": round(done / wall, 2),
            "p50_ms_http": round(float(np.median(latencies)) * 1e3, 1),
            "p90_ms_http": round(float(np.percentile(latencies, 90)) * 1e3, 1),
            "mean_batch_occupancy": round(float(lane_stats.get("mean_batch_size", 0.0)), 2),
            "batches": lane_stats.get("batches"),
            "note": (
                "threaded clients -> stdlib HTTP -> C++ continuous batcher -> "
                "full predict pipeline; tunnel-inclusive like the `stream` record"
            ),
            "device": _device_str(),
        }
        if not os.environ.get("UFM_BENCH_TINY"):
            _save_rec(rec)
        print(json.dumps(rec["server_http"]), flush=True)
    finally:
        srv.close()


def _get_json(host: str, port: int, path: str) -> str:
    import http.client

    conn = http.client.HTTPConnection(host, port, timeout=60)
    conn.request("GET", path)
    out = conn.getresponse().read().decode("utf-8")
    conn.close()
    return out


def _device_str() -> str:
    import jax

    return str(jax.devices()[0])


def main():
    if os.environ.get("UFM_BENCH_TINY"):
        # harness smoke: force CPU before any backend is created (env vars
        # alone cannot override the session's pinned TPU platform)
        import jax

        jax.config.update("jax_platforms", "cpu")
    from bench import enable_compile_cache

    enable_compile_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("stream", "all"):
        bench_stream()
    if which in ("stream_device", "all"):
        bench_stream_device()
    if which in ("stream_device_refine", "all"):
        bench_stream_device_refine()
    if which in ("refine_e2e", "all"):
        bench_refine_e2e()
    if which in ("server_http", "all"):
        bench_server_http()


if __name__ == "__main__":
    main()
