"""Host-side input-pipeline parallelism: thread-backed prefetch.

The reference parallelizes featurization with tf.data AUTOTUNE
(`input_data.py:452-471`). On TPU the featurization/augmentation already
runs on device (one jitted function, `data/dataset.py`), so the host's
remaining work is wav loading + batch assembly in numpy. This module
overlaps that host work with the device step: a single background thread
assembles batches into a bounded queue (double buffering by default) while
the main thread keeps the device busy.

One producer thread is deliberate — batch assembly draws from the
dataset's host RNG, and a single thread preserves the exact draw order, so
prefetched runs are bit-identical to synchronous ones (tested in
tests/test_pipeline.py). When train_batches prefetches, the producer
thread ALSO performs the jax.device_put (deliberately, so the upload
overlaps the device step — device_put is thread-safe); all other JAX
dispatch stays on the consumer thread.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


class _Failure:
    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch(it: Iterator[T], size: int = 2) -> Iterator[T]:
    """Iterate `it` on a daemon thread, `size` items ahead.

    Exceptions raised by the producer re-raise at the consumer's next
    pull. Abandoning the returned generator (break / close) stops the
    producer promptly: the queue put uses a timeout and checks a stop
    event, so the thread never blocks forever on a full queue.
    """
    if size <= 0:
        yield from it
        return

    q: queue.Queue = queue.Queue(maxsize=size)
    stop = threading.Event()

    def producer():
        try:
            for item in it:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            item = _SENTINEL
        except BaseException as e:  # propagate to consumer
            item = _Failure(e)
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return
            except queue.Full:
                continue

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, _Failure):
                raise item.exc
            yield item
    finally:
        stop.set()
