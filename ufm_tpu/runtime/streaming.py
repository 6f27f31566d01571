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

__all__ = ["stream_predict"]


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
