"""Background-thread batch prefetching.

Replaces tf.data's AUTOTUNE prefetch (reference tf_record_utils.py:141):
host-side batch assembly (memmap reads + padding) overlaps with device
compute. A small bounded queue keeps memory flat. A consumer that abandons
the generator early (break / exception — e.g. the training loop's mid-epoch
preemption stop) releases the worker: close() sets a stop flag and drains
the queue so a blocked put() wakes up and the thread exits, instead of
pinning depth+1 assembled batches for the rest of the process.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(iterable: Iterable[T], depth: int = 2) -> Iterator[T]:
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    err: list = []
    stop = threading.Event()

    def _put(item) -> bool:
        while True:
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                if stop.is_set():
                    return False

    def worker():
        try:
            for item in iterable:
                if stop.is_set() or not _put(item):
                    return
        except BaseException as e:  # surface worker errors in the consumer
            err.append(e)
        finally:
            _put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # consumer abandoned us (GeneratorExit) or we finished: unblock and
        # reap the worker either way
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        t.join(timeout=5.0)
