"""Sharded binary record store for {fid, text, mel, text_len, mel_len}.

TPU-native replacement for the reference's TFRecord layer
(reference datasets/tf_record_utils.py:35-148): the same per-utterance schema
and the same sharding layout (train split into ``record_split`` shard files,
reference :72-85; dev/test one shard each), but stored as a flat memory-
mappable container instead of protobuf streams:

  [8B magic 'VAENARS1'][8B u64 header_len][JSON header]
  [text blob int32][mel blob f32/f16]

The JSON header carries fids and per-utterance offsets/lengths, so a reader
can memmap the two blobs and slice utterances in O(1) without parsing -
feeding the host input pipeline at HBM-friendly rates. Shard files are
``{mode}-{i}.vrs`` and listed by filename prefix (reference :144-148).
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np

MAGIC = b"VAENARS1"


@dataclass
class Utterance:
    fid: str
    text: np.ndarray  # int32 [text_len]
    mel: np.ndarray  # float32 [mel_len, num_mels]

    @property
    def text_len(self) -> int:
        return len(self.text)

    @property
    def mel_len(self) -> int:
        return self.mel.shape[0]


class RecordShardWriter:
    """Streams a shard to disk as utterances arrive: text/mel blobs spill to
    sibling temp files during ``add`` and are stitched after the JSON header
    on ``close`` — peak RAM is one utterance, not the shard (~350 MB for an
    LJSpeech train shard at the default 8-way split). On-disk format is
    unchanged (header first, then the two blobs)."""

    def __init__(self, path: str, num_mels: int, mel_dtype: str = "float32"):
        self.path = path
        self.num_mels = num_mels
        self.mel_dtype = mel_dtype
        self._fids: List[str] = []
        self._text_lens: List[int] = []
        self._mel_lens: List[int] = []
        self._text_tmp = open(path + ".text.tmp", "wb")
        self._mel_tmp = open(path + ".mel.tmp", "wb")

    def add(self, fid: str, text: np.ndarray, mel: np.ndarray) -> None:
        assert mel.ndim == 2 and mel.shape[1] == self.num_mels, mel.shape
        text = np.ascontiguousarray(text, np.int32)
        mel = np.ascontiguousarray(mel, self.mel_dtype)
        self._fids.append(fid)
        self._text_lens.append(len(text))
        self._mel_lens.append(mel.shape[0])
        self._text_tmp.write(text.tobytes())
        self._mel_tmp.write(mel.tobytes())

    def close(self) -> None:
        self._text_tmp.close()
        self._mel_tmp.close()
        text_offsets = np.concatenate([[0], np.cumsum(self._text_lens)])[:-1]
        mel_offsets = np.concatenate([[0], np.cumsum(self._mel_lens)])[:-1]
        header = {
            "version": 1,
            "num_mels": self.num_mels,
            "mel_dtype": self.mel_dtype,
            "fids": self._fids,
            "text_lens": [int(x) for x in self._text_lens],
            "mel_lens": [int(x) for x in self._mel_lens],
            "text_offsets": [int(x) for x in text_offsets],
            "mel_offsets": [int(x) for x in mel_offsets],
        }
        header_bytes = json.dumps(header).encode("utf-8")
        # assemble under .part and rename: concurrent readers (multi-host
        # record phase) or a killed run must never see a valid-magic but
        # truncated shard
        part = self.path + ".part"
        with open(part, "wb") as f:
            f.write(MAGIC)
            f.write(np.uint64(len(header_bytes)).tobytes())
            f.write(header_bytes)
            for tmp_path in (self.path + ".text.tmp", self.path + ".mel.tmp"):
                with open(tmp_path, "rb") as tmp:
                    shutil.copyfileobj(tmp, f, length=1 << 24)
                os.remove(tmp_path)
        os.replace(part, self.path)


class RecordShardReader:
    """Memory-mapped reader over one shard."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            magic = f.read(8)
            if magic != MAGIC:
                raise ValueError(f"{path}: bad magic {magic!r}")
            header_len = int(np.frombuffer(f.read(8), np.uint64)[0])
            self.header = json.loads(f.read(header_len).decode("utf-8"))
            self._data_start = 16 + header_len
        h = self.header
        self.fids: List[str] = h["fids"]
        self.text_lens = np.asarray(h["text_lens"], np.int64)
        self.mel_lens = np.asarray(h["mel_lens"], np.int64)
        self.text_offsets = np.asarray(h["text_offsets"], np.int64)
        self.mel_offsets = np.asarray(h["mel_offsets"], np.int64)
        self.num_mels = h["num_mels"]
        self.mel_dtype = np.dtype(h["mel_dtype"])
        total_text = int(self.text_lens.sum()) if len(self.fids) else 0
        total_mel = int(self.mel_lens.sum()) if len(self.fids) else 0
        if total_text == 0:  # empty shard: memmap rejects zero-length maps
            self._text_blob = np.zeros((0,), np.int32)
            self._mel_blob = np.zeros((0, self.num_mels), self.mel_dtype)
            return
        self._text_blob = np.memmap(
            path, dtype=np.int32, mode="r", offset=self._data_start,
            shape=(total_text,))
        mel_start = self._data_start + total_text * 4
        self._mel_blob = np.memmap(
            path, dtype=self.mel_dtype, mode="r", offset=mel_start,
            shape=(total_mel, self.num_mels))

    def __len__(self) -> int:
        return len(self.fids)

    def get(self, i: int) -> Utterance:
        to, tl = self.text_offsets[i], self.text_lens[i]
        mo, ml = self.mel_offsets[i], self.mel_lens[i]
        return Utterance(
            fid=self.fids[i],
            text=np.asarray(self._text_blob[to:to + tl]),
            mel=np.asarray(self._mel_blob[mo:mo + ml], np.float32),
        )


class RecordWriter:
    """Writes the train/dev/test shard sets from extracted features
    (reference tf_record_utils.py:72-91)."""

    def __init__(self, data_dir: str, save_dir: str, train_split: int = 8,
                 num_mels: int = 80, mel_dtype: str = "float32"):
        self.data_dir = data_dir
        self.save_dir = save_dir
        self.train_split = train_split
        self.num_mels = num_mels
        self.mel_dtype = mel_dtype

    def _parse_fids(self, mode: str) -> List[str]:
        with open(os.path.join(self.data_dir, f"{mode}.txt")) as f:
            return [line.strip() for line in f if line.strip()]

    def _get_features(self, fid: str) -> Tuple[np.ndarray, np.ndarray]:
        text = np.load(os.path.join(self.data_dir, "texts", f"{fid}.npy"))
        mel = np.load(os.path.join(self.data_dir, "mels", f"{fid}.npy"))
        return text, mel

    def write(self, mode: str = "train", worker_index: int = 0,
              worker_count: int = 1) -> List[str]:
        """Write this mode's shards; with worker_count > 1, this worker
        writes only the train shards ``worker_index::worker_count`` (dev and
        test, single-shard, fall to worker 0) — the multi-host half of the
        reference's 8-shard layout (reference tf_record_utils.py:72-85)."""
        os.makedirs(self.save_dir, exist_ok=True)
        fids = self._parse_fids(mode)
        if mode == "train":
            split_fids = list(enumerate(
                fids[i::self.train_split] for i in range(self.train_split)))
            if worker_count > 1:
                split_fids = split_fids[worker_index::worker_count]
        else:
            split_fids = [(0, fids)] if worker_index == 0 else []
        paths = []
        for i, ids in split_fids:
            path = os.path.join(self.save_dir, f"{mode}-{i}.vrs")
            w = RecordShardWriter(path, self.num_mels, self.mel_dtype)
            for fid in ids:
                text, mel = self._get_features(fid)
                w.add(fid, text, mel)
            w.close()
            paths.append(path)
        return paths

    def write_all(self, worker_index: int = 0,
                  worker_count: int = 1) -> Dict[str, List[str]]:
        return {mode: self.write(mode, worker_index, worker_count)
                for mode in ("train", "dev", "test")}


def list_shards(save_dir: str, mode: str) -> List[str]:
    """Shard listing by filename prefix (reference tf_record_utils.py:144-148)."""
    return sorted(
        os.path.join(save_dir, f) for f in os.listdir(save_dir)
        if f.startswith(mode) and f.endswith(".vrs"))
