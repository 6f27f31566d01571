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


def test_stream_predict_staged_matches_monolithic():
    """The two-dispatch staged driver (refine serving shape) must yield the
    same per-pair outputs in order with device-resident intermediates."""
    import jax.numpy as jnp

    from ufm_tpu.runtime.streaming import stream_predict_staged

    def stage1(src, tgt):
        # intermediates: a tuple, as UFMNet.backbone returns several tensors
        return src * 2.0, tgt + 1.0

    def stage2(a, b):
        return {"mean": jnp.mean((a + b).reshape(a.shape[0], -1), axis=1)}

    pairs = [(np.full((4, 4, 3), i, np.float32), np.full((4, 4, 3), -i, np.float32)) for i in range(7)]
    outs = list(stream_predict_staged(stage1, stage2, pairs, batch_size=3))
    values = np.concatenate([np.asarray(o["mean"]) for o in outs])
    # 2i + (-i + 1) = i + 1
    np.testing.assert_allclose(values, np.arange(7, dtype=np.float32) + 1.0)


@pytest.mark.slow
def test_stream_predict_staged_on_tiny_refine_model(rng):
    """End-to-end: the tiny refine variant's real staged programs through the
    staged streaming driver equal the monolithic forward per pair."""
    import jax
    import jax.numpy as jnp

    from ufm_tpu.models import UFMNet, ufm_tiny_config

    cfg = ufm_tiny_config(has_classification_head=True, refinement_impl="xla")
    net = UFMNet(cfg)
    h, w = 42, 56
    img = jnp.zeros((2, h, w, 3))
    params = net.init(jax.random.PRNGKey(0), img, img)["params"]

    from ufm_tpu.runtime.streaming import stream_predict_staged

    @jax.jit
    def stage1(s, t):
        out = net.apply({"params": params}, s, t, method="backbone")
        return s, t, out["flow"], out["cls_in_0"], out["cls_in_1"]

    @jax.jit
    def stage2(s, t, fl, c0, c1):
        out = net.apply({"params": params}, s, t, fl, c0, c1, method="refine_tail")
        return {"flow": out["flow"]}

    pairs = [
        (rng.standard_normal((h, w, 3)).astype(np.float32),
         rng.standard_normal((h, w, 3)).astype(np.float32))
        for _ in range(5)
    ]
    outs = list(stream_predict_staged(stage1, stage2, pairs, batch_size=2))
    staged_flows = np.concatenate([np.asarray(o["flow"]) for o in outs])

    src = jnp.asarray(np.stack([p[0] for p in pairs]))
    tgt = jnp.asarray(np.stack([p[1] for p in pairs]))
    mono = net.apply({"params": params}, src, tgt)
    np.testing.assert_allclose(staged_flows, np.asarray(mono["flow"]), rtol=1e-5, atol=1e-5)


def test_native_loader_decodes_pairs(tmp_path, rng):
    pytest.importorskip("cv2")
    import cv2

    from ufm_tpu.runtime.loader import NativeImageLoader, iter_decoded_pairs

    paths = []
    imgs = []
    for i in range(3):
        img = rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
        p = str(tmp_path / f"img{i}.png")
        cv2.imwrite(p, img[:, :, ::-1])  # BGR on disk -> loader gives RGB
        paths.append(p)
        imgs.append(img)
    ys, xs = np.mgrid[0:32, 0:40]
    smooth = np.stack([ys * 4, xs * 4, (ys + xs) * 2], axis=-1).astype(np.uint8)
    jp = str(tmp_path / "img_j.jpg")
    cv2.imwrite(jp, smooth[:, :, ::-1])

    # direct poll API (exact size -> lossless for PNG)
    loader = NativeImageLoader((32, 40), num_threads=2)
    loader.submit(7, paths[1])
    rid, frame = loader.poll()
    assert rid == 7
    np.testing.assert_array_equal(frame, imgs[1])
    # jpeg decodes (lossy -> approximate on smooth content)
    loader.submit(8, jp)
    rid, frame = loader.poll()
    assert rid == 8 and frame is not None
    assert np.abs(frame.astype(int) - smooth.astype(int)).mean() < 6
    # resize path
    loader2 = NativeImageLoader((16, 20), num_threads=1)
    loader2.submit(1, paths[0])
    rid, frame = loader2.poll()
    assert frame.shape == (16, 20, 3)
    loader2.close()
    loader.close()

    # ordered pair iterator
    pairs = list(iter_decoded_pairs([(paths[0], paths[1]), (paths[2], paths[0])], (32, 40)))
    assert len(pairs) == 2
    np.testing.assert_array_equal(pairs[0][0], imgs[0])
    np.testing.assert_array_equal(pairs[1][1], imgs[0])


def test_native_loader_decode_error(tmp_path):
    from ufm_tpu.runtime.loader import NativeImageLoader

    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not an image")
    loader = NativeImageLoader((8, 8), num_threads=1)
    loader.submit(3, str(bad))
    rid, frame = loader.poll()
    assert rid == 3 and frame is None
    loader.close()
