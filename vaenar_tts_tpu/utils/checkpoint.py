"""Orbax checkpointing with the reference's retention contract.

Replaces tf.train.Checkpoint/CheckpointManager (reference train.py:246-261):
{params, batch_stats, opt_state, epoch} tree, max_to_keep=20,
keep_checkpoint_every_n_hours=4, restore-latest on startup, initial save after
data-dependent init. Note the reference's ``step`` variable counts EPOCHS
(train.py:304-306); the key here is named ``epoch`` to avoid that trap.
"""

from __future__ import annotations

import datetime
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, model_dir: str, max_to_keep: int = 20,
                 keep_every_n_hours: float = 4.0, solo_process: bool = False):
        """``solo_process``: multi-process training runs where only process 0
        writes (host copies of the fully replicated state) and every process
        restores independently from the shared filesystem. Scopes Orbax's
        multihost coordination to THIS process so a single-process save/
        restore never waits on a cross-process barrier."""
        self.model_dir = os.path.abspath(model_dir)
        os.makedirs(self.model_dir, exist_ok=True)
        extra = {}
        if solo_process:
            pi = jax.process_index()
            extra["multiprocessing_options"] = ocp.options.MultiprocessingOptions(
                primary_host=pi, active_processes={pi},
                barrier_sync_key_prefix=f"solo{pi}")
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            keep_time_interval=datetime.timedelta(hours=keep_every_n_hours),
            # orbax forbids create=True with active_processes; the directory
            # is created above either way
            create=not solo_process,
            **extra,
        )
        self._mgr = ocp.CheckpointManager(self.model_dir, options=options)

    def save(self, epoch: int, state: Dict[str, Any],
             wait: bool = False) -> None:
        """Async save: Orbax copies device->host synchronously inside save()
        (so donated training buffers stay safe) and writes to disk in the
        background, overlapping the next epoch. A subsequent save or close()
        joins the in-flight write."""
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, abstract_state: Dict[str, Any],
                epoch: Optional[int] = None) -> Optional[Dict[str, Any]]:
        """Restore the given (or latest) checkpoint into the structure of
        ``abstract_state`` (a pytree of arrays or ShapeDtypeStructs)."""
        self._mgr.wait_until_finished()  # join any in-flight async save
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            return None
        if epoch is not None and step not in self._mgr.all_steps():
            # pinned-epoch miss: a None beats Orbax's opaque Composite error
            return None
        ref = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                     abstract_state)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(ref))

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
