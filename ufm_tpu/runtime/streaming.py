"""Double-buffered streaming inference driver.

For continuous batched pair streams (video flow, dataset sweeps — the
BASELINE.json streaming config), throughput requires overlapping three
stages: host preprocessing of batch N+1, host→device transfer of batch N+1,
and device compute of batch N. JAX's async dispatch gives the overlap for
free *if* the driver keeps the device queue non-empty and never syncs on the
freshest result; this driver adds a background preprocessing thread with a
bounded queue and a one-deep result pipeline.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterable, Iterator, Optional, Tuple

import numpy as np

__all__ = ["stream_predict", "stream_predict_staged"]


def stream_predict(
    forward: Callable,
    pair_iterator: Iterable[Tuple[np.ndarray, np.ndarray]],
    batch_size: int,
    preprocess: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    prefetch: int = 2,
) -> Iterator[Dict]:
    """Stream (source, target) numpy pairs through a jitted ``forward``.

    ``forward(src_batch, tgt_batch) -> outputs`` must be jitted with static
    batch shape; short final batches are padded (and outputs sliced).
    Yields per-batch outputs in order while the next batch is already in
    flight on the device.
    """
    import jax

    work: "queue.Queue" = queue.Queue(maxsize=prefetch)
    _END = object()

    def producer():
        batch_src, batch_tgt = [], []
        for src, tgt in pair_iterator:
            if preprocess is not None:
                src, tgt = preprocess(src), preprocess(tgt)
            batch_src.append(src)
            batch_tgt.append(tgt)
            if len(batch_src) == batch_size:
                work.put((np.stack(batch_src), np.stack(batch_tgt), batch_size))
                batch_src, batch_tgt = [], []
        if batch_src:
            n = len(batch_src)
            pad = batch_size - n
            batch_src += [batch_src[-1]] * pad
            batch_tgt += [batch_tgt[-1]] * pad
            work.put((np.stack(batch_src), np.stack(batch_tgt), n))
        work.put(_END)

    thread = threading.Thread(target=producer, name="ufm-stream-producer", daemon=True)
    thread.start()

    in_flight = None  # (outputs, valid_n)
    while True:
        item = work.get()
        if item is _END:
            break
        src, tgt, n = item
        # dispatch the next batch before consuming the previous result: the
        # device keeps computing while the host slices/yields
        out = forward(jax.numpy.asarray(src), jax.numpy.asarray(tgt))
        if in_flight is not None:
            prev_out, prev_n = in_flight
            yield jax.tree.map(lambda x: x[:prev_n], prev_out)
        in_flight = (out, n)

    if in_flight is not None:
        import jax

        prev_out, prev_n = in_flight
        yield jax.tree.map(lambda x: x[:prev_n], prev_out)
    thread.join(timeout=1.0)


def stream_predict_staged(
    stage1: Callable,
    stage2: Callable,
    pair_iterator: Iterable[Tuple[np.ndarray, np.ndarray]],
    batch_size: int,
    preprocess: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    prefetch: int = 2,
) -> Iterator[Dict]:
    """Stream pairs through a TWO-dispatch staged pipeline (refine variant).

    ``stage1(src_batch, tgt_batch)`` returns device-resident intermediates
    (a tuple, or a single value); ``stage2(*intermediates)`` returns the
    outputs. This is the production refine serving shape: the backbone and
    refine-tail programs compile separately (models/base.py staged pipeline)
    and the intermediates never leave the device. Both dispatches for batch
    N+1 are enqueued before batch N's result is consumed, so JAX's async
    dispatch keeps the device queue non-empty across the stage boundary.

    Hot path this serves: the reference's refine forward
    (reference uniflowmatch/models/ufm.py:843-1009).
    """
    import jax

    work: "queue.Queue" = queue.Queue(maxsize=prefetch)
    _END = object()

    def producer():
        batch_src, batch_tgt = [], []
        for src, tgt in pair_iterator:
            if preprocess is not None:
                src, tgt = preprocess(src), preprocess(tgt)
            batch_src.append(src)
            batch_tgt.append(tgt)
            if len(batch_src) == batch_size:
                work.put((np.stack(batch_src), np.stack(batch_tgt), batch_size))
                batch_src, batch_tgt = [], []
        if batch_src:
            n = len(batch_src)
            pad = batch_size - n
            batch_src += [batch_src[-1]] * pad
            batch_tgt += [batch_tgt[-1]] * pad
            work.put((np.stack(batch_src), np.stack(batch_tgt), n))
        work.put(_END)

    thread = threading.Thread(target=producer, name="ufm-stream-producer", daemon=True)
    thread.start()

    in_flight = None
    while True:
        item = work.get()
        if item is _END:
            break
        src, tgt, n = item
        mid = stage1(jax.numpy.asarray(src), jax.numpy.asarray(tgt))
        out = stage2(*mid) if isinstance(mid, tuple) else stage2(mid)
        if in_flight is not None:
            prev_out, prev_n = in_flight
            yield jax.tree.map(lambda x: x[:prev_n], prev_out)
        in_flight = (out, n)

    if in_flight is not None:
        prev_out, prev_n = in_flight
        yield jax.tree.map(lambda x: x[:prev_n], prev_out)
    thread.join(timeout=1.0)
