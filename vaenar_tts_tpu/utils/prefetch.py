"""Background-thread batch prefetching.

Replaces tf.data's AUTOTUNE prefetch (reference tf_record_utils.py:141):
host-side batch assembly (memmap reads + padding) overlaps with device
compute. A small bounded queue keeps memory flat.
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

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # surface worker errors in the consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
