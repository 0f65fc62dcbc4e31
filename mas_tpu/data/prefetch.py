"""Host-side batch prefetching.

The reference overlaps input work with GPU compute through DataLoader
worker processes (``/root/reference/conf/img_config.yaml`` num_workers;
``Data/preprocessor_web.py`` worker pools).  Here a daemon thread keeps a
small queue of ready numpy batches ahead of the (async-dispatched) TPU
step, so tar decode / jpeg decode / seg assembly never serialize with
device time.

Threads (not processes) suffice: the heavy producers release the GIL
(PIL decode, numpy ops, tar IO), and batches stay in shared memory — no
pickling.  For multi-process scaling, run more ``shard_split`` workers.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional


class PrefetchIterator:
    """Wrap a batch iterable; produce from a background thread.

    ``size`` bounds host memory (size * batch bytes).  Exceptions in the
    producer propagate to the consumer at the point of the failed batch.
    """

    _DONE = object()

    def __init__(self, iterable: Iterable, size: int = 2):
        self._queue: "queue.Queue" = queue.Queue(maxsize=max(size, 1))
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._produce, args=(iterable,), daemon=True)
        self._thread.start()

    def _produce(self, iterable) -> None:
        try:
            for item in iterable:
                self._queue.put(item)
        except BaseException as exn:                   # noqa: BLE001
            self._err = exn
        finally:
            self._queue.put(self._DONE)

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(iterable: Iterable, size: int = 2) -> PrefetchIterator:
    return PrefetchIterator(iterable, size)


def parallel_map(fn, iterable: Iterable, workers: int = 4,
                 inflight: Optional[int] = None) -> Iterator:
    """Order-preserving parallel map over an iterable.

    The reference overlaps jpeg decode / seg assembly with training via 8
    DataLoader worker processes per rank (``conf/img_config.yaml``); here a
    thread pool suffices (PIL/numpy release the GIL) and keeps results in
    shared memory.  ``inflight`` bounds submitted-but-unconsumed work
    (host memory); defaults to ``4 * workers``.  Exceptions from ``fn``
    surface at the failed item's position, preserving ordering semantics.
    """
    import collections
    from concurrent.futures import ThreadPoolExecutor

    if workers <= 0:
        yield from map(fn, iterable)
        return
    bound = inflight or 4 * workers
    with ThreadPoolExecutor(max_workers=workers) as pool:
        pending: "collections.deque" = collections.deque()
        for item in iterable:
            pending.append(pool.submit(fn, item))
            if len(pending) >= bound:
                yield pending.popleft().result()
        while pending:
            yield pending.popleft().result()
