"""Corpus preprocessing: text analysis, split, mel extraction.

Behavior parity with reference datasets/datasets.py:
  * idempotent feature extraction with resume check (:34-50, :76-98)
  * length-sorted stratified train/dev/test split at 1%/1% (:100-137)
  * wav discovery by extension walk (:139-146)
  * per-utterance mel .npy transposed to [frames, num_mels] (:148-157)
  * LJSpeech metadata.csv frontend (:235-262)
  * DataBaker prosody-label frontend (:265-363)

TPU-era changes: mel extraction is parallelized across host cores
(the reference loops serially over ~13k wavs), and the split RNG is
explicitly seeded for reproducibility (the reference's preprocess step used
the unseeded global NumPy RNG).
"""

from __future__ import annotations

import json
import os
import pickle
from concurrent.futures import ProcessPoolExecutor
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..audio.dsp import AudioProcessor
from ..configs.hparams import HParams
from ..text.pinyin import parse_cn_prosody_label
from ..text.tokenizer import CharTokenizer


def _extract_one(args) -> str:
    wav_f, mel_dir, cfg = args
    ap = AudioProcessor(cfg)
    wav_arr = ap.load_wav(wav_f)
    wav_arr = ap.preemphasize(wav_arr)
    mels = ap.melspectrogram(wav_arr)
    fid = os.path.basename(wav_f).rsplit(".", 1)[0]
    _atomic_save(os.path.join(mel_dir, fid + ".npy"),
                 mels.T.astype(np.float32))
    return fid


def _atomic_save(path: str, arr: np.ndarray) -> None:
    """np.save via tmp+rename: a worker killed mid-write must not leave a
    truncated .npy that the existence-only resume check then trusts
    (feats_extract_finish)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:  # file object: np.save must not append .npy
        np.save(f, arr)
    os.replace(tmp, path)


class TextMelCorpus:
    """Dataset-agnostic preprocessing driver (reference TextMelData,
    datasets.py:11-157)."""

    def __init__(self, data_root: str, save_dir: str, hps: HParams,
                 split_seed: int = 20260816):
        self.data_root = data_root
        self.save_dir = save_dir
        self.hps = hps
        self.split_seed = split_seed
        self.text_dict_f = os.path.join(save_dir, "texts.pkl") if save_dir else None
        self.mel_dir = os.path.join(save_dir, "mels") if save_dir else None
        self.text_dir = os.path.join(save_dir, "texts") if save_dir else None
        self.train_list_f = os.path.join(save_dir, "train.txt") if save_dir else None
        self.dev_list_f = os.path.join(save_dir, "dev.txt") if save_dir else None
        self.test_list_f = os.path.join(save_dir, "test.txt") if save_dir else None
        self.tokenizer = CharTokenizer(hps.text)
        self.audio_processor = AudioProcessor(hps.audio)
        self.text_dict: Optional[Dict[str, List[int]]] = None

    # -- public driver (reference datasets.py:34-50) --------------------------

    def feature_extraction(self, num_workers: Optional[int] = None,
                           use_device: bool = False, worker_index: int = 0,
                           worker_count: int = 1,
                           wait_timeout: float = 3600.0) -> None:
        """Idempotent preprocessing, optionally sharded across hosts
        (beyond reference; the reference is single-host, datasets.py:34-50).

        Multi-host contract (shared filesystem): worker 0 runs the (cheap,
        deterministic) text processing and split; other workers wait for the
        list files to appear, then every worker extracts mels for its
        round-robin slice of the wav list. Extraction is per-file idempotent,
        so stragglers/retries are safe."""
        if self.feats_extract_finish():
            print("Features already exist!")
            with open(self.text_dict_f, "rb") as f:
                self.text_dict = pickle.load(f)
            return
        self._validate_dir()
        if worker_index == 0:
            print("Processing text...")
            self.text_dict = self.text_process()
            print("Splitting into train/dev/test...")
            self.dataset_split()
        else:
            self._wait_for_lists(wait_timeout)
            with open(self.text_dict_f, "rb") as f:
                self.text_dict = pickle.load(f)
        print("Extracting mel-spectrograms...")
        self.extract_mels(num_workers=num_workers, use_device=use_device,
                          worker_index=worker_index,
                          worker_count=worker_count)

    def _wait_for_lists(self, timeout: float) -> None:
        import time as _time
        needed = [self.text_dict_f, self.train_list_f, self.dev_list_f,
                  self.test_list_f]
        t0 = _time.time()
        while any(not os.path.isfile(f) for f in needed):
            if _time.time() - t0 > timeout:
                raise TimeoutError(
                    f"worker waited {timeout}s for worker 0's split files")
            _time.sleep(1.0)

    def _validate_dir(self) -> None:
        assert os.path.isdir(self.data_root), self.data_root
        for d in (self.save_dir, self.mel_dir, self.text_dir):
            os.makedirs(d, exist_ok=True)

    def feats_extract_finish(self) -> bool:
        # reference datasets.py:76-98
        needed = [self.text_dict_f, self.train_list_f, self.dev_list_f,
                  self.test_list_f]
        if (any(not os.path.isfile(f) for f in needed)
                or not os.path.isdir(self.mel_dir)
                or not os.path.isdir(self.text_dir)):
            return False
        for f in (self.train_list_f, self.dev_list_f, self.test_list_f):
            with open(f) as rf:
                for line in rf:
                    utt_id = line.strip()
                    if not os.path.isfile(
                            os.path.join(self.mel_dir, f"{utt_id}.npy")):
                        print(f"{utt_id}.npy missing, re-extracting")
                        return False
        return True

    # -- split (reference datasets.py:100-137) --------------------------------

    def dataset_split(self) -> Tuple[int, int, int]:
        with open(self.text_dict_f, "rb") as f:
            text_dict = pickle.load(f)
        rng = np.random.default_rng(self.split_seed)
        dev_set, test_set = [], []
        utt_ids = [k for k, t in sorted(text_dict.items(),
                                        key=lambda x: len(x[1]))]
        data_size = len(utt_ids)
        dev_size = max(1, int(self.hps.dataset.dev_set_rate * data_size))
        test_size = max(1, int(self.hps.dataset.test_set_rate * data_size))
        dev_rate = data_size // dev_size
        for i in range(0, data_size, dev_rate):
            dev_set.append(rng.choice(utt_ids[i:i + dev_rate]))
        for item in dev_set:
            utt_ids.remove(item)
        data_size = len(utt_ids)
        test_rate = data_size // test_size
        for i in range(0, data_size, test_rate):
            test_set.append(rng.choice(utt_ids[i:i + test_rate]))
        for item in test_set:
            utt_ids.remove(item)
        train_set = utt_ids
        for path, ids in ((self.train_list_f, train_set),
                          (self.dev_list_f, dev_set),
                          (self.test_list_f, test_set)):
            with open(path, "w") as f:
                for idx in ids:
                    f.write(f"{idx}\n")
        return len(train_set), len(dev_set), len(test_set)

    # -- mel extraction (reference datasets.py:148-157) -----------------------

    def get_wav_files(self, ext: str = ".wav") -> List[str]:
        wav_files = []
        for root, _dirs, files in os.walk(self.data_root, followlinks=True):
            for basename in files:
                if basename.endswith(ext):
                    wav_files.append(os.path.join(root, basename))
        return wav_files

    def extract_mels(self, num_workers: Optional[int] = None,
                     use_device: bool = False, worker_index: int = 0,
                     worker_count: int = 1) -> None:
        wav_list = sorted(self.get_wav_files())
        if worker_count > 1:  # disjoint per-host slice (deterministic order)
            wav_list = wav_list[worker_index::worker_count]
            print(f"  worker {worker_index}/{worker_count}: "
                  f"{len(wav_list)} wavs")
        if use_device:
            self._extract_mels_device(wav_list)
            return
        if num_workers is None:  # 0 means "serial", not "default pool"
            num_workers = min(32, os.cpu_count() or 1)
        tasks = [(w, self.mel_dir, self.hps.audio) for w in wav_list]
        if num_workers <= 1:
            for t in tasks:
                _extract_one(t)
        else:
            with ProcessPoolExecutor(max_workers=num_workers) as ex:
                for i, _ in enumerate(ex.map(_extract_one, tasks,
                                             chunksize=16)):
                    if (i + 1) % 1000 == 0:
                        print(f"  extracted {i + 1}/{len(tasks)}")

    def _extract_mels_device(self, wav_list, batch_size: int = 32) -> None:
        """Batched accelerator mel extraction (ops/stft.py).

        Exact-parity recipe: preemphasize + reflect-center-pad each utterance
        ON HOST (so frame windows see the true signal, not batch padding),
        length-sort, zero-pad rows to a bucketed sample count, run the fused
        conv+matmul with center=False, trim each row to its true 1 + n//hop
        frames. Numerics vs the host path are test-enforced.
        """
        import jax
        import jax.numpy as jnp
        from ..ops.stft import batched_melspectrogram
        cfg = self.hps.audio
        hop, n_fft = cfg.frame_shift_sample, cfg.n_fft
        # sort by file size (proportional to PCM length) so batches have
        # near-uniform lengths WITHOUT loading every wav up front; wavs are
        # then streamed per batch (peak RAM = one batch, not the corpus)
        wav_list = sorted(wav_list, key=os.path.getsize)
        fn = jax.jit(lambda y: batched_melspectrogram(
            y, cfg, apply_preemphasis=False, center=False))
        for i in range(0, len(wav_list), batch_size):
            chunk_paths = wav_list[i:i + batch_size]
            chunk = []
            for wav_f in chunk_paths:
                fid = os.path.basename(wav_f).rsplit(".", 1)[0]
                y = self.audio_processor.load_wav(wav_f)
                y = self.audio_processor.preemphasize(y).astype(np.float32)
                y = np.pad(y, n_fft // 2, mode="reflect")
                chunk.append((len(y), fid, y))
            # coarse buckets (~0.75 s of audio): hop-granular padding would
            # create hundreds of distinct jit shapes over a real corpus,
            # each a multi-second device compile
            bucket = hop * 64
            max_len = ((max(n for n, _, _ in chunk) + bucket - 1)
                       // bucket) * bucket
            batch = np.zeros((len(chunk), max_len), np.float32)
            for j, (n, _, y) in enumerate(chunk):
                batch[j, :n] = y
            mels = np.asarray(fn(jnp.asarray(batch)), np.float32)
            for j, (n, fid, _) in enumerate(chunk):
                n_frames = 1 + (n - n_fft) // hop
                _atomic_save(os.path.join(self.mel_dir, fid + ".npy"),
                             np.ascontiguousarray(mels[j, :n_frames]))
            if (i // batch_size) % 20 == 0:
                print(f"  device-extracted "
                      f"{min(i + batch_size, len(wav_list))}/{len(wav_list)}")

    # -- per-dataset hooks -----------------------------------------------------

    def text_process(self) -> Dict[str, List[int]]:
        raise NotImplementedError

    def text_to_array(self, text: str) -> List[int]:
        raise NotImplementedError


class LJSpeechCorpus(TextMelCorpus):
    """LJSpeech frontend (reference datasets.py:235-262): metadata.csv
    pipe-separated, column 2 = normalized text."""

    def text_process(self) -> Dict[str, List[int]]:
        text_f = os.path.join(self.data_root, "metadata.csv")
        text_dict: Dict[str, List[int]] = {}
        with open(text_f, encoding="utf-8") as rf:
            for line in rf:
                lst = line.strip().split("|")
                if len(lst) < 3:
                    continue
                seq = self.text_to_array(lst[2])
                text_dict[lst[0]] = seq
                np.save(os.path.join(self.text_dir, f"{lst[0]}.npy"),
                        np.asarray(seq, np.int32))
        with open(self.text_dict_f, "wb") as f:
            pickle.dump(text_dict, f, protocol=pickle.HIGHEST_PROTOCOL)
        return text_dict

    def text_to_array(self, text: str) -> List[int]:
        return self.tokenizer.encode_english(text)


class DataBakerCorpus(TextMelCorpus):
    """DataBaker frontend (reference datasets.py:265-363): alternating
    hanzi/pinyin lines in 000001-010000.txt."""

    def text_process(self) -> Dict[str, List[int]]:
        text_file = os.path.join(self.data_root, "000001-010000.txt")
        text_dict: Dict[str, List[int]] = {}
        fid, text = None, None
        with open(text_file, encoding="utf-8") as f:
            for line in f:
                if line[0].isdigit():
                    fid = line[:6]
                    text = line
                else:
                    py_seq = parse_cn_prosody_label(text, line)
                    if py_seq is None:
                        continue
                    seq = self.tokenizer.encode(py_seq.lower())
                    text_dict[fid] = seq
                    np.save(os.path.join(self.text_dir, f"{fid}.npy"),
                            np.asarray(seq, np.int32))
        with open(self.text_dict_f, "wb") as f:
            pickle.dump(text_dict, f, protocol=pickle.HIGHEST_PROTOCOL)
        return text_dict

    def text_to_array(self, text: str) -> List[int]:
        from ..text.pinyin import text_to_pinyin
        return self.tokenizer.encode(text_to_pinyin(text))


CORPORA = {
    "ljspeech": LJSpeechCorpus,
    "databaker": DataBakerCorpus,
}
