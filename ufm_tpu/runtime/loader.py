"""Native image-pair loader: threaded libjpeg/libpng decode off the GIL.

Binds native/ufm_loader.cc. Feeds fixed-size uint8 RGB frames (decoded and,
if needed, bilinearly resized in C) into the streaming pipeline without
occupying the Python thread — the host core stays free for dispatch.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterable, Iterator, Optional, Tuple

import numpy as np

__all__ = ["NativeImageLoader", "iter_decoded_pairs"]

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libufm_loader.so")


def _build() -> str:
    src = os.path.join(_NATIVE_DIR, "ufm_loader.cc")
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
        subprocess.run(["make", "-C", _NATIVE_DIR, "libufm_loader.so"], check=True, capture_output=True)
    return _LIB_PATH


class NativeImageLoader:
    """Decode images on C threads; poll fixed-size (H, W, 3) uint8 frames."""

    def __init__(self, out_hw: Tuple[int, int], num_threads: int = 2):
        lib = ctypes.CDLL(_build())
        lib.ufm_loader_create.restype = ctypes.c_void_p
        lib.ufm_loader_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.ufm_loader_submit.restype = ctypes.c_int
        lib.ufm_loader_submit.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_char_p]
        lib.ufm_loader_poll.restype = ctypes.c_int
        lib.ufm_loader_poll.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ]
        lib.ufm_loader_destroy.argtypes = [ctypes.c_void_p]
        self._lib = lib
        self.out_hw = (int(out_hw[0]), int(out_hw[1]))
        self._handle = lib.ufm_loader_create(num_threads, self.out_hw[0], self.out_hw[1])
        if not self._handle:
            raise ValueError("invalid loader parameters")
        self._closed = False

    def submit(self, request_id: int, path: str) -> None:
        rc = self._lib.ufm_loader_submit(self._handle, request_id, path.encode())
        if rc != 0:
            raise RuntimeError("loader is shut down")

    def poll(self, timeout_s: float = 5.0) -> Optional[Tuple[int, Optional[np.ndarray]]]:
        """Returns (id, frame) for a completed decode, (id, None) on decode
        failure, or None on timeout."""
        h, w = self.out_hw
        buf = np.empty((h, w, 3), dtype=np.uint8)
        rid = ctypes.c_uint64()
        rc = self._lib.ufm_loader_poll(
            self._handle,
            ctypes.byref(rid),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            int(timeout_s * 1e6),
        )
        if rc == 0:
            return None
        if rc == -2:
            return int(rid.value), None
        return int(rid.value), buf

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            self._lib.ufm_loader_destroy(self._handle)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def iter_decoded_pairs(
    pair_paths: Iterable[Tuple[str, str]],
    out_hw: Tuple[int, int],
    num_threads: int = 2,
    window: int = 8,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Decode (source, target) path pairs with bounded lookahead; yields
    frame pairs in submission order (drop-in producer for
    runtime.streaming.stream_predict)."""
    loader = NativeImageLoader(out_hw, num_threads)
    try:
        paths = list(pair_paths)
        frames: Dict[int, np.ndarray] = {}
        next_submit = 0
        next_yield = 0

        def submit_upto(limit):
            nonlocal next_submit
            while next_submit < min(limit, len(paths)):
                src, tgt = paths[next_submit]
                loader.submit(2 * next_submit, src)
                loader.submit(2 * next_submit + 1, tgt)
                next_submit += 1

        submit_upto(window)
        while next_yield < len(paths):
            while (2 * next_yield not in frames) or (2 * next_yield + 1 not in frames):
                polled = loader.poll(timeout_s=10.0)
                if polled is None:
                    raise TimeoutError("image decode timed out")
                rid, frame = polled
                if frame is None:
                    raise IOError(f"failed to decode {paths[rid // 2][rid % 2]}")
                frames[rid] = frame
            yield frames.pop(2 * next_yield), frames.pop(2 * next_yield + 1)
            next_yield += 1
            submit_upto(next_yield + window)
    finally:
        loader.close()
