"""Background-thread host-side batch prefetch.

The step loop alternates host work (pulling + stacking ``steps_per_call``
batches — tens of ms at flagship shapes) with device work (the jitted
multi-step call). Without prefetch those serialize; this wrapper runs the
upstream iterator in a daemon thread feeding a bounded queue, so batch
N+1's host prep overlaps batch N's device execution. ``fit(prefetch=k)``
wraps its train iterator with this (train/loop.py).

The reference has no equivalent: its input pipelines are pulled inline in
the train loops (train_spotify.py:255-258 parses tfrecords between device
steps; train_cooccurence.py:103-112 flattens co-occurrence rows inline).

The wrapped iterator runs entirely on the producer thread — safe for the
repo's pipeline iterators (plain generators over files/arrays); do not
share one source iterator across two prefetchers.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


class _PrefetchIterator:
    def __init__(self, source: Iterator, depth: int):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err = None
        self._thread = threading.Thread(
            target=self._produce, args=(source,), daemon=True)
        self._thread.start()

    def _produce(self, source: Iterator) -> None:
        try:
            for item in source:
                self._q.put(item)
        except BaseException as e:  # propagate to the consumer
            self._err = e
        finally:
            self._q.put(_SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetched(source: Iterator[T], depth: int = 2) -> Iterator[T]:
    """Iterate ``source`` on a background thread, ``depth`` items ahead.

    Exceptions from the source re-raise at the consuming ``next()``;
    exhaustion propagates as normal ``StopIteration``. ``depth`` bounds the
    host memory held in flight (depth × batch bytes).
    """
    if depth <= 0:
        return source
    return _PrefetchIterator(source, depth)
