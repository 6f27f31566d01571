"""Serving runtime: native continuous batching + TPU dispatch loop.

The C++ scheduler (native/ufm_runtime.cc) forms batches from asynchronous
requests — release on "batch full OR oldest request waited max_delay" — off
the GIL. This module binds it via ctypes and runs the dispatch loop: gather
payloads for the batch ids, pad to a bucketed batch size (static shapes for
the compile cache), run the jitted forward, resolve per-request futures.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from concurrent.futures import Future
from typing import Callable, Dict, Optional

import numpy as np

__all__ = ["build_native_library", "NativeBatcher", "ServingRuntime"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libufm_runtime.so")


def build_native_library(force: bool = False) -> str:
    """Build native/libufm_runtime.so if needed; returns its path."""
    src = os.path.join(_NATIVE_DIR, "ufm_runtime.cc")
    if force or not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    return _LIB_PATH


def _load_lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(build_native_library())
    lib.ufm_batcher_create.restype = ctypes.c_void_p
    lib.ufm_batcher_create.argtypes = [ctypes.c_int, ctypes.c_int64, ctypes.c_int]
    lib.ufm_batcher_destroy.argtypes = [ctypes.c_void_p]
    lib.ufm_batcher_submit.restype = ctypes.c_int
    lib.ufm_batcher_submit.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int64]
    lib.ufm_batcher_next_batch.restype = ctypes.c_int
    lib.ufm_batcher_next_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int64,
    ]
    lib.ufm_batcher_stats.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64)]
    return lib


class NativeBatcher:
    """Thin ctypes wrapper over the C++ scheduler."""

    def __init__(self, max_batch: int = 8, max_delay_ms: float = 5.0, capacity: int = 256):
        self._lib = _load_lib()
        self._handle = self._lib.ufm_batcher_create(max_batch, int(max_delay_ms * 1000), capacity)
        if not self._handle:
            raise ValueError("invalid batcher parameters")
        self.max_batch = max_batch
        self._ids_buf = (ctypes.c_uint64 * max_batch)()
        self._closed = False

    def submit(self, request_id: int, timeout_s: float = 10.0) -> None:
        rc = self._lib.ufm_batcher_submit(self._handle, request_id, int(timeout_s * 1e6))
        if rc == -1:
            raise RuntimeError("batcher is shut down")
        if rc == -2:
            raise TimeoutError("batcher queue full")

    def next_batch(self, timeout_s: float = 1.0) -> Optional[list]:
        """Blocks up to timeout; returns ids, [] on timeout, None on shutdown."""
        n = self._lib.ufm_batcher_next_batch(self._handle, self._ids_buf, int(timeout_s * 1e6))
        if n == -1:
            return None
        return [self._ids_buf[i] for i in range(n)]

    def stats(self) -> Dict[str, float]:
        buf = (ctypes.c_uint64 * 6)()
        self._lib.ufm_batcher_stats(self._handle, buf)
        submitted, dispatched, batches, sum_bs, sum_wait, pending = (buf[i] for i in range(6))
        return {
            "submitted": submitted,
            "dispatched": dispatched,
            "batches": batches,
            "mean_batch_size": sum_bs / batches if batches else 0.0,
            "mean_wait_ms": sum_wait / dispatched / 1000 if dispatched else 0.0,
            "pending": pending,
        }

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            self._lib.ufm_batcher_destroy(self._handle)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class ServingRuntime:
    """Continuous-batching inference server around a batched predict fn.

    ``predict_fn(src_batch, tgt_batch) -> per-request results list``; inputs
    are stacked numpy arrays. Requests enter via :meth:`infer` (returns a
    Future). Short batches are padded to ``max_batch`` so the TPU sees one
    static shape (one compile).
    """

    def __init__(
        self,
        predict_fn: Callable[[np.ndarray, np.ndarray], list],
        max_batch: int = 8,
        max_delay_ms: float = 5.0,
    ):
        self._predict = predict_fn
        self._batcher = NativeBatcher(max_batch=max_batch, max_delay_ms=max_delay_ms)
        self._payloads: Dict[int, tuple] = {}
        self._futures: Dict[int, Future] = {}
        self._lock = threading.Lock()
        self._next_id = 0
        self._running = True
        self._thread = threading.Thread(target=self._loop, name="ufm-serving", daemon=True)
        self._thread.start()

    def infer(self, source_image: np.ndarray, target_image: np.ndarray) -> Future:
        with self._lock:
            rid = self._next_id
            self._next_id += 1
            fut: Future = Future()
            self._payloads[rid] = (source_image, target_image)
            self._futures[rid] = fut
        self._batcher.submit(rid)
        return fut

    def _loop(self) -> None:
        while self._running:
            ids = self._batcher.next_batch(timeout_s=0.25)
            if ids is None:
                break
            if not ids:
                continue
            with self._lock:
                pairs = [self._payloads.pop(i) for i in ids]
                futs = [self._futures.pop(i) for i in ids]
            try:
                n = len(pairs)
                src = np.stack([p[0] for p in pairs])
                tgt = np.stack([p[1] for p in pairs])
                pad = self._batcher.max_batch - n
                if pad:  # static batch shape for the compile cache
                    src = np.concatenate([src, np.repeat(src[-1:], pad, axis=0)])
                    tgt = np.concatenate([tgt, np.repeat(tgt[-1:], pad, axis=0)])
                results = self._predict(src, tgt)
                for fut, res in zip(futs, results[:n]):
                    fut.set_result(res)
            except Exception as e:
                for fut in futs:
                    if not fut.done():
                        fut.set_exception(e)

    def stats(self) -> Dict[str, float]:
        return self._batcher.stats()

    def close(self) -> None:
        self._running = False
        self._batcher.close()
        self._thread.join(timeout=2.0)
