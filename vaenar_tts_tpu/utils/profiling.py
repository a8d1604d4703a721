"""Profiling + recompilation monitoring.

The reference detected tf.function retraces with print statements
(train.py:128, models.py:117, ... - SURVEY.md section 5 'tracing'). The JAX
equivalents here:

* ``RetraceMonitor``: tracks jitted functions' compile-cache sizes and reports
  when a step recompiled (new shape bucket or static arg).
* ``profile_trace``: context manager around jax.profiler for TensorBoard-
  viewable device traces.
"""

from __future__ import annotations

import contextlib
from typing import Callable, Dict, Optional


class RetraceMonitor:
    def __init__(self, **jitted_fns: Callable):
        self.fns = jitted_fns
        self._last: Dict[str, int] = {k: self._size(f)
                                      for k, f in jitted_fns.items()}

    @staticmethod
    def _size(fn) -> int:
        try:
            return fn._cache_size()
        except Exception:
            return -1

    def check(self, where: str = "") -> Dict[str, int]:
        """Returns {name: new_compiles} and prints when something retraced."""
        news = {}
        for k, f in self.fns.items():
            size = self._size(f)
            if size < 0:  # cache size unavailable for this fn: skip it
                continue
            # clamp the -1 'unavailable' sentinel out of the arithmetic so a
            # fn whose cache size becomes readable later reports its true
            # variant count, not an off-by-one
            last = max(self._last.get(k, 0), 0)
            if size > last:
                news[k] = size - last
                print(f"[retrace] {k} compiled {news[k]} new variant(s) "
                      f"({size} total){' at ' + where if where else ''}")
            self._last[k] = size
        return news


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace when a directory is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield
