"""Bucketed, padded, seeded-shuffle batch loader with static shapes.

Replaces the reference's tf.data pipeline (tf_record_utils.py:126-142:
parse -> padded_batch -> batch-level shuffle -> prefetch). TPU-idiomatic
changes:

  * Batches are formed from LENGTH-SORTED utterances, then the batch order is
    shuffled per epoch with a seeded RNG - the same "shuffle after batching"
    contract as the reference (:139-140) with far less padding waste.
  * Every batch is padded to STATIC shapes: mel time to a multiple of
    ``mel_bucket`` (120, divisible by every reduction factor 2..5) and text to
    a multiple of ``text_bucket`` - so jit sees a small, fixed set of shapes.
  * Multi-host / data-parallel sharding: ``shard_index/shard_count`` slice the
    batch list round-robin (the affordance the reference left vestigial in
    datasets.py:179-192).

Host-side numpy only; device put happens in the training loop.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .records import RecordShardReader


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


@dataclasses.dataclass
class Batch:
    fids: List[str]
    texts: np.ndarray  # int32 [batch, text_max]
    mels: np.ndarray  # float32 [batch, mel_max, num_mels]
    text_lengths: np.ndarray  # int32 [batch]
    mel_lengths: np.ndarray  # int32 [batch]
    n_valid: int  # entries beyond this are repeat-padding

    @property
    def shape_key(self) -> Tuple[int, int]:
        return (self.texts.shape[1], self.mels.shape[1])


def repad_batch(batch: Batch, text_max: int, mel_max: int) -> Batch:
    """Copy of ``batch`` at a different static shape (zero pad or crop),
    lengths clamped to fit. Used for the multi-process dev lockstep: a
    process whose dev slice ran dry re-feeds its last batch as an
    n_valid=0 dummy, which must still match the step's scheduled shape."""
    B = batch.texts.shape[0]
    texts = np.zeros((B, text_max), batch.texts.dtype)
    mels = np.zeros((B, mel_max, batch.mels.shape[2]), batch.mels.dtype)
    ct, cm = min(text_max, batch.texts.shape[1]), min(mel_max,
                                                      batch.mels.shape[1])
    texts[:, :ct] = batch.texts[:, :ct]
    mels[:, :cm] = batch.mels[:, :cm]
    return Batch(batch.fids, texts, mels,
                 np.minimum(batch.text_lengths, text_max).astype(np.int32),
                 np.minimum(batch.mel_lengths, mel_max).astype(np.int32),
                 batch.n_valid)


class BucketedLoader:
    def __init__(self, shard_paths: Sequence[str], batch_size: int,
                 mel_bucket: int = 120, text_bucket: int = 32,
                 shuffle: bool = True, seed: int = 0,
                 drop_last: bool = False, pad_batch: bool = True,
                 shard_index: int = 0, shard_count: int = 1,
                 mel_len_cap: Optional[int] = None,
                 fixed_text_max: Optional[int] = None,
                 fixed_mel_max: Optional[int] = None):
        """``fixed_text_max``/``fixed_mel_max`` pin every batch to ONE static
        shape (multi-process training: all processes must trace the same
        program even though they own disjoint shard-sets)."""
        self.readers = [RecordShardReader(p) for p in shard_paths]
        self.batch_size = batch_size
        self.mel_bucket = mel_bucket
        self.text_bucket = text_bucket
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.pad_batch = pad_batch
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.fixed_text_max = fixed_text_max
        self.fixed_mel_max = fixed_mel_max

        # global index: (reader_idx, local_idx), sorted by mel length so each
        # batch has near-uniform lengths (minimal padding)
        entries = []
        for ri, r in enumerate(self.readers):
            for li in range(len(r)):
                ml = int(r.mel_lens[li])
                if mel_len_cap is not None and ml > mel_len_cap:
                    continue
                entries.append((ml, int(r.text_lens[li]), ri, li))
        entries.sort()
        self._entries = entries
        self.num_mels = self.readers[0].num_mels if self.readers else 0

    def __len__(self) -> int:
        n_batches = len(self._entries) // self.batch_size
        if not self.drop_last and len(self._entries) % self.batch_size:
            n_batches += 1
        # round-robin shard slice
        return len(range(self.shard_index, n_batches, self.shard_count))

    @property
    def num_utterances(self) -> int:
        return len(self._entries)

    @property
    def max_text_len(self) -> int:
        return max((t for (_, t, _, _) in self._entries), default=0)

    @property
    def max_mel_len(self) -> int:
        return max((m for (m, _, _, _) in self._entries), default=0)

    def _make_batch(self, idxs: Sequence[Tuple[int, int, int, int]],
                    target_shape: Optional[Tuple[int, int]] = None) -> Batch:
        n_valid = len(idxs)
        entries = list(idxs)
        if self.pad_batch and n_valid < self.batch_size:
            entries = entries + [entries[-1]] * (self.batch_size - n_valid)
        need_t = max(t for (_, t, _, _) in entries)
        need_m = max(m for (m, _, _, _) in entries)
        if target_shape is not None:
            text_max, mel_max = int(target_shape[0]), int(target_shape[1])
        else:
            text_max = (self.fixed_text_max
                        if self.fixed_text_max is not None
                        else pad_to_multiple(need_t, self.text_bucket))
            mel_max = (self.fixed_mel_max if self.fixed_mel_max is not None
                       else pad_to_multiple(need_m, self.mel_bucket))
        if need_t > text_max or need_m > mel_max:
            # must precede packing: the native memcpy path has no bounds
            # check and would silently overflow rows on a stale fixed_* pin
            raise ValueError(
                f"batch needs (text {need_t}, mel {need_m}) but the loader "
                f"is pinned to ({text_max}, {mel_max}); re-sync "
                f"fixed_text_max/fixed_mel_max with the data")
        B = len(entries)
        texts = np.zeros((B, text_max), np.int32)
        mels = np.zeros((B, mel_max, self.num_mels), np.float32)
        t_lens = np.zeros((B,), np.int32)
        m_lens = np.zeros((B,), np.int32)
        fids = [self.readers[ri].fids[li] for (_, _, ri, li) in entries]

        packed = self._pack_native(entries, texts, mels, t_lens, m_lens)
        if not packed:
            for i, (_, _, ri, li) in enumerate(entries):
                u = self.readers[ri].get(li)
                texts[i, :u.text_len] = u.text
                mels[i, :u.mel_len] = u.mel
                t_lens[i] = u.text_len
                m_lens[i] = u.mel_len
        return Batch(fids, texts, mels, t_lens, m_lens, n_valid)

    def _pack_native(self, entries, texts, mels, t_lens, m_lens) -> bool:
        """C++ multithreaded gather (native/batchpack.cc); False -> fallback."""
        from ..native import get_batchpack
        fn = get_batchpack()
        if fn is None:
            return False
        import ctypes
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        by_reader: dict = {}
        for row, (_, _, ri, li) in enumerate(entries):
            by_reader.setdefault(ri, []).append((li, row))
        # dtype check over ALL touched readers BEFORE packing any: bailing
        # halfway would waste the native work on every batch of the epoch
        if any(self.readers[ri]._mel_blob.dtype != np.float32
               for ri in by_reader):
            return False
        for ri, pairs in by_reader.items():
            r = self.readers[ri]
            indices = np.asarray([p[0] for p in pairs], np.int64)
            rows = np.asarray([p[1] for p in pairs], np.int64)
            fn(r._text_blob.ctypes.data_as(i32p),
               r.text_offsets.ctypes.data_as(i64p),
               r.text_lens.ctypes.data_as(i64p),
               r._mel_blob.ctypes.data_as(f32p),
               r.mel_offsets.ctypes.data_as(i64p),
               r.mel_lens.ctypes.data_as(i64p),
               ctypes.c_int64(self.num_mels),
               indices.ctypes.data_as(i64p),
               rows.ctypes.data_as(i64p),
               ctypes.c_int64(len(pairs)),
               texts.ctypes.data_as(i32p),
               ctypes.c_int64(texts.shape[1]),
               mels.ctypes.data_as(f32p),
               ctypes.c_int64(mels.shape[1]),
               t_lens.ctypes.data_as(i32p),
               m_lens.ctypes.data_as(i32p))
        return True

    def _epoch_order(self, epoch_index: int) -> Tuple[list, np.ndarray]:
        groups = [self._entries[i:i + self.batch_size]
                  for i in range(0, len(self._entries), self.batch_size)]
        if self.drop_last and groups and len(groups[-1]) < self.batch_size:
            groups.pop()
        order = np.arange(len(groups))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch_index).shuffle(order)
        return groups, order[self.shard_index::self.shard_count]

    def batch_order(self, epoch_index: int = 0) -> np.ndarray:
        """This process's shuffled batch order for the epoch: indices into
        the FIXED length-sorted batch groups. Group contents are epoch-
        independent (only their order varies, matching the reference's
        batch-level shuffle, tf_record_utils.py:139-140), which is what
        makes a device-resident batch cache possible: ``all_batches()``
        uploads the groups once and each epoch replays this order."""
        _, order = self._epoch_order(epoch_index)
        return order

    def all_batches(self) -> List[Batch]:
        """Every batch group in base (length-sorted) order; index i here is
        what ``batch_order`` rows refer to."""
        groups, _ = self._epoch_order(0)
        return [self._make_batch(g) for g in groups]

    def epoch(self, epoch_index: int = 0,
              shape_schedule: Optional[np.ndarray] = None) -> Iterator[Batch]:
        """Iterate one epoch; batch ORDER is shuffled with seed+epoch
        (reference shuffles at batch level with a fixed seed,
        tf_record_utils.py:139-140).

        ``shape_schedule`` (int array [n_steps, 2] of (text_max, mel_max))
        pins batch i to row i's static shape — the multi-process lockstep
        bucket contract: every process pads step i to the same synced shape
        (the element-wise max of the processes' natural shapes) instead of
        the whole run padding to the global corpus max."""
        groups, order = self._epoch_order(epoch_index)
        for i, gi in enumerate(order):
            target = None
            if shape_schedule is not None:
                if i >= len(shape_schedule):
                    return  # schedule truncated (lockstep step cap)
                target = (int(shape_schedule[i][0]), int(shape_schedule[i][1]))
            yield self._make_batch(groups[gi], target_shape=target)

    def epoch_shape_schedule(self, epoch_index: int = 0,
                             n_steps: Optional[int] = None) -> np.ndarray:
        """This process's natural static shapes for the epoch, in iteration
        order: int64 [n, 2] rows of bucket-quantized (text_max, mel_max),
        ignoring any fixed_* pins. ``n_steps`` pads by repeating the last row
        (a process whose slice runs dry re-feeds its last batch) or
        truncates, so every process returns equal-shaped arrays for the
        element-wise-max allgather."""
        groups, order = self._epoch_order(epoch_index)
        shapes = []
        for gi in order:
            g = groups[gi]
            shapes.append((
                pad_to_multiple(max(t for (_, t, _, _) in g),
                                self.text_bucket),
                pad_to_multiple(max(m for (m, _, _, _) in g),
                                self.mel_bucket)))
        if n_steps is not None:
            if not shapes:
                raise ValueError("empty epoch cannot satisfy a lockstep "
                                 "schedule")
            shapes = (shapes + [shapes[-1]] * (n_steps - len(shapes))
                      )[:n_steps]
        return np.asarray(shapes, np.int64).reshape(-1, 2)

    def __iter__(self) -> Iterator[Batch]:
        return self.epoch(0)

    def shape_census(self) -> dict:
        """Distinct static (text_max, mel_max) shapes this loader will emit -
        i.e. the jit recompile budget."""
        shapes = {}
        groups = [self._entries[i:i + self.batch_size]
                  for i in range(0, len(self._entries), self.batch_size)]
        if self.drop_last and groups and len(groups[-1]) < self.batch_size:
            groups.pop()
        if self.fixed_text_max is not None or self.fixed_mel_max is not None:
            # pinned loaders emit exactly one static shape
            tm = (self.fixed_text_max if self.fixed_text_max is not None
                  else pad_to_multiple(self.max_text_len, self.text_bucket))
            mm = (self.fixed_mel_max if self.fixed_mel_max is not None
                  else pad_to_multiple(self.max_mel_len, self.mel_bucket))
            return {(tm, mm): len(groups)}
        for g in groups:
            tm = pad_to_multiple(max(t for (_, t, _, _) in g), self.text_bucket)
            mm = pad_to_multiple(max(m for (m, _, _, _) in g), self.mel_bucket)
            shapes[(tm, mm)] = shapes.get((tm, mm), 0) + 1
        return shapes
