"""Multi-process (multi-host) runtime for the training loop.

The reference is single-process only (SURVEY.md section 2 parallelism census);
this is the TPU-pod story. One process per host, each owning a disjoint SET of
.vrs record shards (the reference's 8-shard train layout exists exactly as
this affordance, reference tf_record_utils.py:72-85 / preprocess.py:19-20),
feeding its slice of a GLOBAL data-parallel batch. XLA sees one global jit
program over a ('data','model') mesh spanning every process's devices; the
gradient psum rides ICI.

Design contract (keeps the loop simple and correct):
  * model/optimizer state is always FULLY REPLICATED across the mesh;
  * batches are sharded over 'data' and assembled per-process with
    ``jax.make_array_from_process_local_data``;
  * all processes run the same number of steps per epoch (min across
    processes, synced once at startup) so collectives stay in lockstep;
  * static batch shapes are identical on every process (the loader pins
    text/mel pads to the global corpus max, synced at startup) so every
    process traces the same program;
  * checkpoints are written by process 0 only from host copies of the
    replicated state (shared filesystem, as the reference assumes), with a
    barrier so other processes never race a restore against a half-written
    save.

Preemption contract: SIGTERM must be delivered to ALL processes (the normal
behavior of job schedulers / `kill -TERM -- -pgid`) — each process then stops
at the same epoch boundary and meets the checkpoint barrier; signaling a
single process would leave the others waiting in a collective.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from .mesh import make_mesh


def initialize_from_env() -> None:
    """jax.distributed.initialize() driven by env vars (VAENAR_COORDINATOR,
    VAENAR_NUM_PROCESSES, VAENAR_PROCESS_ID) when set, else auto-detection.
    Explicit env vars are what the two-process CPU CI test uses."""
    coord = os.environ.get("VAENAR_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["VAENAR_NUM_PROCESSES"]),
            process_id=int(os.environ["VAENAR_PROCESS_ID"]))
    else:
        jax.distributed.initialize()


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def partition_shards(paths: Sequence[str], index: Optional[int] = None,
                     count: Optional[int] = None) -> list:
    """Disjoint shard-set for this process: round-robin over the sorted shard
    list, so each host opens/indexes ONLY its own .vrs files."""
    index = jax.process_index() if index is None else index
    count = jax.process_count() if count is None else count
    mine = sorted(paths)[index::count]
    if not mine:
        raise ValueError(
            f"process {index}: no record shards to own "
            f"({len(paths)} shards < {count} processes; re-preprocess with "
            f"dataset.record_split >= process count)")
    return mine


class DistContext:
    """Per-run handle bundling the global mesh and host<->global transfers."""

    def __init__(self, mesh: Optional[Mesh] = None):
        self.mesh = mesh if mesh is not None else make_mesh(model=1)
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        self._rep = NamedSharding(self.mesh, P())
        self._data = NamedSharding(self.mesh, P("data"))
        # one reshard program per SHAPE, not per fetch() call: a fresh
        # jax.jit(lambda ...) each call would never hit the jit cache and
        # recompile over the tunnel every test interval
        self._fetch = jax.jit(lambda a: a, out_shardings=self._rep)

    @property
    def is_main(self) -> bool:
        return self.process_index == 0

    # -- state ---------------------------------------------------------------

    def replicate(self, tree: Any) -> Any:
        """Host tree (identical on every process) -> fully replicated global
        arrays on the mesh."""
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                self._rep, np.asarray(x)), tree)

    def to_host(self, tree: Any) -> Any:
        """Fully replicated global arrays -> host numpy (any process)."""
        return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)

    def key(self, k: jax.Array) -> jax.Array:
        """Local PRNG key (identical on every process, same seed chain) ->
        replicated global key array usable inside a global jit."""
        data = np.asarray(jax.random.key_data(k))
        return jax.random.wrap_key_data(
            jax.make_array_from_process_local_data(self._rep, data))

    def scalar(self, x, dtype=np.float32) -> jax.Array:
        return jax.make_array_from_process_local_data(
            self._rep, np.asarray(x, dtype))

    def fetch(self, x: jax.Array) -> np.ndarray:
        """Data-sharded global array -> full host copy (reshard to
        replicated via a cached jitted identity, then pull)."""
        return np.asarray(self._fetch(x))

    # -- batches ---------------------------------------------------------------

    def global_batch(self, *arrays: np.ndarray) -> Tuple[jax.Array, ...]:
        """Per-process local batch slices -> global arrays sharded over
        'data'. Every process must pass the same shapes (pinned pads)."""
        return tuple(
            jax.make_array_from_process_local_data(self._data, np.asarray(a))
            for a in arrays)

    # -- sync ------------------------------------------------------------------

    def sync_min(self, value: int) -> int:
        all_vals = multihost_utils.process_allgather(
            np.asarray([value], np.int64))
        return int(np.min(all_vals))

    def sync_max(self, value: int) -> int:
        all_vals = multihost_utils.process_allgather(
            np.asarray([value], np.int64))
        return int(np.max(all_vals))

    def sync_elementwise_max(self, arr: np.ndarray) -> np.ndarray:
        """Element-wise max of an identically-shaped host array across
        processes. One small collective per call — the loop uses it once per
        epoch to agree on the lockstep bucket schedule (VERDICT r2 #6), not
        per step."""
        gathered = multihost_utils.process_allgather(
            np.ascontiguousarray(arr))
        return np.max(gathered, axis=0)

    def allsum(self, values: np.ndarray) -> np.ndarray:
        """Sum a small host array across processes (dev-loss aggregation)."""
        gathered = multihost_utils.process_allgather(
            np.asarray(values, np.float64))
        return np.sum(gathered, axis=0)

    def barrier(self, name: str) -> None:
        multihost_utils.sync_global_devices(name)
