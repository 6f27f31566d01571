"""Native continuous-batching runtime tests (builds the C++ library)."""

import shutil
import threading
import time

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")


def test_batcher_full_batch_release():
    from ufm_tpu.runtime import NativeBatcher

    b = NativeBatcher(max_batch=4, max_delay_ms=1000.0)
    for i in range(4):
        b.submit(i)
    ids = b.next_batch(timeout_s=0.5)
    assert ids == [0, 1, 2, 3], ids
    b.close()


def test_batcher_delay_release():
    from ufm_tpu.runtime import NativeBatcher

    b = NativeBatcher(max_batch=8, max_delay_ms=30.0)
    b.submit(42)
    t0 = time.perf_counter()
    ids = b.next_batch(timeout_s=2.0)
    waited = time.perf_counter() - t0
    assert ids == [42]
    assert 0.02 <= waited < 1.0, f"delay release took {waited:.3f}s"
    stats = b.stats()
    assert stats["batches"] == 1 and stats["dispatched"] == 1
    b.close()


def test_batcher_timeout_empty():
    from ufm_tpu.runtime import NativeBatcher

    b = NativeBatcher(max_batch=2, max_delay_ms=1.0)
    assert b.next_batch(timeout_s=0.05) == []
    b.close()


def test_serving_runtime_end_to_end():
    from ufm_tpu.runtime import ServingRuntime

    calls = []

    def predict(src, tgt):
        calls.append(src.shape[0])
        return [float(src[i].mean() + tgt[i].mean()) for i in range(src.shape[0])]

    rt = ServingRuntime(predict, max_batch=4, max_delay_ms=20.0)
    imgs = [np.full((8, 8, 3), i, dtype=np.float32) for i in range(10)]

    futures = [rt.infer(imgs[i], imgs[i]) for i in range(10)]
    results = [f.result(timeout=5.0) for f in futures]
    assert results == [2.0 * i for i in range(10)]

    stats = rt.stats()
    assert stats["submitted"] == 10 and stats["dispatched"] == 10
    assert all(c == 4 for c in calls), f"padded static batches expected, got {calls}"
    rt.close()


def test_serving_runtime_concurrent_submitters():
    from ufm_tpu.runtime import ServingRuntime

    def predict(src, tgt):
        return [float(src[i, 0, 0, 0]) for i in range(src.shape[0])]

    rt = ServingRuntime(predict, max_batch=8, max_delay_ms=5.0)
    results = {}

    def worker(k):
        img = np.full((4, 4, 3), k, dtype=np.float32)
        results[k] = rt.infer(img, img).result(timeout=5.0)

    threads = [threading.Thread(target=worker, args=(k,)) for k in range(32)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == {k: float(k) for k in range(32)}
    rt.close()


def test_stream_predict_order_and_padding():
    import jax.numpy as jnp

    from ufm_tpu.runtime.streaming import stream_predict

    def forward(src, tgt):
        return {"mean": jnp.mean(src.reshape(src.shape[0], -1), axis=1)}

    pairs = [(np.full((4, 4, 3), i, np.float32), np.zeros((4, 4, 3), np.float32)) for i in range(7)]
    outs = list(stream_predict(forward, pairs, batch_size=3))
    values = np.concatenate([np.asarray(o["mean"]) for o in outs])
    np.testing.assert_allclose(values, np.arange(7, dtype=np.float32))
