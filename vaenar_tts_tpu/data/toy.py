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


@dataclass
class ToySpecV2:
    """Speech-like per-symbol acoustics (round-3 corpus).

    V1's weakness (VERDICT round 2): letter durations were a deterministic
    function of the text, so a model could locate segment boundaries by
    counting durations from the text alone — monotonic alignment was nearly
    positional. V2 removes every such shortcut:

      * per-utterance TEMPO drawn randomly (durations are not a function of
        the text) plus per-letter duration jitter;
      * COARTICULATION: f0, amplitude and spectral tilt are smoothed across
        segment boundaries, so letter onsets/offsets glide into their
        neighbors instead of switching instantaneously;
      * PITCH DECLINATION: the whole utterance drifts down a random number of
        semitones, so absolute pitch does not identify a letter — only pitch
        relative to the declination trend does;
      * a NOISE FLOOR under everything, silence included.

    The model must therefore track the acoustics frame by frame to know which
    letter it is inside — the same burden real speech puts on the reference's
    cross-attention (reference models/models.py:105-197).
    """

    base_f0: float = 110.0
    n_harmonics: int = 4
    min_frames: int = 7
    frame_spread: int = 8
    silence_frames: int = 4
    tempo_range: Tuple[float, float] = (0.7, 1.4)  # per-utterance
    jitter_frames: int = 2  # per-letter duration jitter, +/- uniform
    declination_semitones: Tuple[float, float] = (1.0, 4.0)  # per-utterance
    coart_ms: float = 35.0  # smoothing window over f0/amp/tilt tracks
    noise_db: float = -34.0  # noise floor relative to peak

    def f0(self, k: int) -> float:
        return self.base_f0 * 2.0 ** (k / 12.0)

    def harmonic_decay(self, k: int) -> float:
        """Per-letter spectral tilt: a second, pitch-independent cue."""
        return 0.35 + 0.5 * ((k * 7) % 26) / 25.0


def synthesize_utterance_v2(text: str, hp: HParams, rng: np.random.Generator,
                            spec: ToySpecV2 | None = None) -> np.ndarray:
    """Render toy-v2 text to a waveform with utterance-level randomness.

    Builds per-sample f0 / amplitude / spectral-tilt tracks, smooths them with
    a coarticulation window (glides at every boundary), integrates phase once
    for the whole utterance (no phase resets at boundaries), and adds a noise
    floor.
    """
    spec = spec or ToySpecV2()
    sr = hp.audio.sample_rate
    shift = hp.audio.frame_shift_sample

    tempo = float(rng.uniform(*spec.tempo_range))
    decl_semis = float(rng.uniform(*spec.declination_semitones))

    # per-segment frame counts: tempo-scaled base + jitter, floor of 3 frames
    f0s, amps, tilts, frames = [], [], [], []
    for ch in text:
        if ch == " ":
            n = max(2, int(round(tempo * spec.silence_frames
                                 + rng.integers(-1, 2))))
            f0s.append(0.0)  # filled by smoothing: glide through silence
            amps.append(0.0)
            tilts.append(0.5)
            frames.append(n)
            continue
        k = LETTERS.index(ch)
        base = spec.min_frames + (k % spec.frame_spread)
        n = max(3, int(round(tempo * base
                             + rng.integers(-spec.jitter_frames,
                                            spec.jitter_frames + 1))))
        f0s.append(spec.f0(k))
        amps.append(1.0)
        tilts.append(spec.harmonic_decay(k))
        frames.append(n)

    # 3+ frames of lead silence so the coarticulation smear (coart_ms) of the
    # first onset stays clear of the very start, like a real recording's
    # room-tone head
    pad = max(3, int(round(3 * tempo)))
    f0s = [0.0] + f0s + [0.0]
    amps = [0.0] + amps + [0.0]
    tilts = [0.5] + tilts + [0.5]
    frames = [pad] + frames + [pad]

    # expand to per-sample tracks
    n_samples = sum(frames) * shift
    f0_track = np.zeros(n_samples)
    amp_track = np.zeros(n_samples)
    tilt_track = np.zeros(n_samples)
    pos = 0
    for f0, amp, tilt, n in zip(f0s, amps, tilts, frames):
        s = n * shift
        f0_track[pos:pos + s] = f0
        amp_track[pos:pos + s] = amp
        tilt_track[pos:pos + s] = tilt
        pos += s

    # silence carries no pitch target: let the glide pass through it by
    # interpolating f0 over zero-amp gaps before smoothing
    voiced = amp_track > 0
    if voiced.any():
        idx = np.arange(n_samples)
        f0_track = np.interp(idx, idx[voiced], f0_track[voiced])

    # pitch declination: exponential drift down decl_semis semitones
    t01 = np.linspace(0.0, 1.0, n_samples)
    f0_track = f0_track * 2.0 ** (-decl_semis * t01 / 12.0)

    # coarticulation: moving-average the tracks (boxcar, ~coart_ms)
    w = max(1, int(spec.coart_ms / 1000.0 * sr))
    kernel = np.ones(w) / w
    f0_track = np.convolve(f0_track, kernel, mode="same")
    amp_track = np.convolve(amp_track, kernel, mode="same")
    tilt_track = np.convolve(tilt_track, kernel, mode="same")

    # one continuous phase integral; harmonic stack with time-varying tilt
    phase = 2.0 * np.pi * np.cumsum(f0_track) / sr
    wav = np.zeros(n_samples)
    for h in range(1, spec.n_harmonics + 1):
        wav += tilt_track ** h * np.sin(h * phase)
    wav *= amp_track

    noise = rng.standard_normal(n_samples) * 10.0 ** (spec.noise_db / 20.0)
    wav = wav + noise
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
                    train_split: int | None = None, version: int = 1) -> dict:
    """Write toy train/dev/test .vrs shards. Returns corpus stats
    (frames-per-token ratio, max lengths) for configuring the model.
    ``version=2`` uses the speech-like ToySpecV2 acoustics (random tempo,
    coarticulation, declination, noise floor)."""
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
        if version == 2:
            wav = synthesize_utterance_v2(text, hp, rng)
        else:
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
        "version": version,
        "mel_text_len_ratio": float(np.mean(ratios)),
        "max_text_len": int(max_text),
        "max_mel_len": int(max_mel),
    }
