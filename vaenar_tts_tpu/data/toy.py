"""Procedural mini-corpus with genuine text->audio alignment structure.

The build environment has no real speech corpus, but proving that the decoder
cross-attention LEARNS a monotonic alignment (the scientific core of VAENAR,
reference models/models.py:105-197) needs data where each text token
deterministically produces a distinct acoustic segment. This module generates
one: every letter is a fixed-duration harmonic tone at a letter-specific
fundamental (a chromatic scale), spaces are silence, and utterances are random
letter strings. The audio is synthesized as a real waveform and featurized
through the SAME DSP path as a real corpus (audio/dsp.py), so the toy corpus
exercises text frontend -> waveform -> mel -> records end to end.

A model trained on this corpus must discover the text<->time correspondence
through attention alone -- exactly the mechanism the reference trains on
LJSpeech (reference train.py:182-204) -- but the mapping is learnable in
hundreds rather than thousands of epochs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

from ..audio.dsp import AudioProcessor
from ..configs.hparams import HParams
from ..text.tokenizer import CharTokenizer
from .records import RecordShardWriter

LETTERS = "abcdefghijklmnopqrstuvwxyz"


@dataclass
class ToySpec:
    """Deterministic per-symbol acoustics."""

    base_f0: float = 110.0  # letter 'a'; 'z' lands ~467 Hz
    n_harmonics: int = 4
    harmonic_decay: float = 0.6
    min_frames: int = 7  # per-letter duration = min_frames + (k % spread)
    frame_spread: int = 8
    silence_frames: int = 4  # per space

    def f0(self, k: int) -> float:
        return self.base_f0 * 2.0 ** (k / 12.0)

    def frames(self, k: int) -> int:
        return self.min_frames + (k % self.frame_spread)


def synthesize_utterance(text: str, hp: HParams,
                         spec: ToySpec | None = None) -> np.ndarray:
    """Render cleaned toy text (letters + spaces) to a waveform."""
    spec = spec or ToySpec()
    sr = hp.audio.sample_rate
    shift = hp.audio.frame_shift_sample
    segments: List[np.ndarray] = []
    for ch in text:
        if ch == " ":
            segments.append(np.zeros(spec.silence_frames * shift))
            continue
        k = LETTERS.index(ch)
        n = spec.frames(k) * shift
        t = np.arange(n) / sr
        seg = np.zeros(n)
        for h in range(1, spec.n_harmonics + 1):
            seg += spec.harmonic_decay ** h * np.sin(
                2 * np.pi * h * spec.f0(k) * t)
        # attack/decay envelope: audible (and spectrally visible) onsets
        env = np.minimum(np.arange(n), n - 1 - np.arange(n))
        env = np.minimum(env / (0.15 * n), 1.0)
        segments.append(seg * env)
    # leading/trailing silence like a real recording
    pad = np.zeros(2 * shift)
    wav = np.concatenate([pad] + segments + [pad])
    return (0.6 * wav / max(np.abs(wav).max(), 1e-6)).astype(np.float32)


def random_text(rng: np.random.Generator, min_letters: int = 8,
                max_letters: int = 22) -> str:
    """Random words of 2-5 letters joined by spaces."""
    n = int(rng.integers(min_letters, max_letters + 1))
    words, used = [], 0
    while used < n:
        w = int(min(rng.integers(2, 6), n - used))
        if w == 1:
            # a 1-letter remainder would force a word outside the 2-5 range
            # (and the old +1 bump overran max_letters); extend the previous
            # word instead
            words[-1] += str(rng.choice(list(LETTERS)))
            used += 1
            continue
        words.append("".join(rng.choice(list(LETTERS), w)))
        used += w
    return " ".join(words)


def generate_corpus(save_dir: str, hp: HParams, n_train: int = 960,
                    n_dev: int = 32, n_test: int = 16, seed: int = 0,
                    train_split: int | None = None) -> dict:
    """Write toy train/dev/test .vrs shards. Returns corpus stats
    (frames-per-token ratio, max lengths) for configuring the model."""
    os.makedirs(save_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    ap = AudioProcessor(hp.audio)
    tok = CharTokenizer(hp.text)
    train_split = train_split or hp.dataset.record_split

    ratios: List[float] = []
    max_text, max_mel = 0, 0

    def make(fid: str) -> Tuple[str, np.ndarray, np.ndarray]:
        nonlocal max_text, max_mel
        text = random_text(rng)
        wav = synthesize_utterance(text, hp)
        mel = ap.melspectrogram(wav).T.astype(np.float32)  # [T, num_mels]
        ids = np.asarray(tok.encode(text), np.int32)
        ratios.append(mel.shape[0] / len(ids))
        max_text = max(max_text, len(ids))
        max_mel = max(max_mel, mel.shape[0])
        return fid, ids, mel

    counts = {"train": n_train, "dev": n_dev, "test": n_test}
    for mode, count in counts.items():
        n_shards = train_split if mode == "train" else 1
        writers = [RecordShardWriter(
            os.path.join(save_dir, f"{mode}-{i}.vrs"), hp.audio.num_mels)
            for i in range(n_shards)]
        for i in range(count):
            fid, ids, mel = make(f"{mode}{i:05d}")
            writers[i % n_shards].add(fid, ids, mel)
        for w in writers:
            w.close()

    return {
        "n_train": n_train, "n_dev": n_dev, "n_test": n_test,
        "mel_text_len_ratio": float(np.mean(ratios)),
        "max_text_len": int(max_text),
        "max_mel_len": int(max_mel),
    }
