"""Neural vocoder training: multi-resolution STFT loss over (mel, wav) pairs.

New capability beyond the reference (Griffin-Lim only). The training recipe
is deliberately adversary-free (no GAN): the ISTFT head with a
multi-resolution STFT objective trains stably in minutes on a single chip and
is deterministic end to end — the right trade for a framework whose quality
bar is the reference's Griffin-Lim, which this surpasses at a fraction of the
latency (scripts/bench_vocoder.py, tests/test_vocoder.py).

Pairs come from either the procedural toy corpus (data/toy.py) or a
directory of wav files; mels are computed with the SAME host DSP chain the
TTS data pipeline uses (preemphasis -> melspectrogram, data/corpus.py), so a
vocoder trained here drops straight onto the acoustic model's outputs.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..audio.dsp import AudioProcessor
from ..configs.hparams import AudioConfig
from ..models.vocoder import MelVocoder, VocoderConfig, spec_to_wav
from ..ops.stft import batched_stft_magnitude


def multires_stft_loss(pred: jnp.ndarray, target: jnp.ndarray,
                       scales: Sequence[Tuple[int, int, int]]) -> jnp.ndarray:
    """Spectral convergence + log-magnitude L1 averaged over resolutions.
    pred/target: [B, S] waveforms (preemphasized domain)."""
    total = 0.0
    for n_fft, hop, win in scales:
        p = batched_stft_magnitude(pred, n_fft, hop, win)
        t = batched_stft_magnitude(target, n_fft, hop, win)
        sc = (jnp.sqrt(jnp.sum((t - p) ** 2, axis=(1, 2)) + 1e-12)
              / jnp.sqrt(jnp.sum(t ** 2, axis=(1, 2)) + 1e-12))
        log_l1 = jnp.mean(jnp.abs(jnp.log(p + 1e-5) - jnp.log(t + 1e-5)),
                          axis=(1, 2))
        total = total + jnp.mean(sc) + jnp.mean(log_l1)
    return total / len(scales)


class PairSampler:
    """Random fixed-length (mel, wav) crops from a set of utterances.

    Mel frame f is centered at sample f*hop (center=True STFT), so the crop
    mel[s : s+F] pairs with wav[s*hop : s*hop + hop*(F-1)] — identical to the
    trim semantics of the ISTFT head (models/vocoder.spec_to_wav)."""

    def __init__(self, utterances: List[np.ndarray], audio: AudioConfig,
                 segment_frames: int, seed: int = 0):
        self.audio = audio
        self.ap = AudioProcessor(audio)
        self.seg = segment_frames
        self.hop = audio.frame_shift_sample
        self.rng = np.random.default_rng(seed)
        self.pairs = []
        for wav in utterances:
            pre = np.asarray(self.ap.preemphasize(wav), np.float32)
            mel = self.ap.melspectrogram(pre).T.astype(np.float32)  # [T, M]
            self.pairs.append((pre, mel))

    def sample(self, batch_size: int) -> Tuple[np.ndarray, np.ndarray]:
        F, hop = self.seg, self.hop
        mels = np.zeros((batch_size, F, self.audio.num_mels), np.float32)
        wavs = np.zeros((batch_size, hop * (F - 1)), np.float32)
        for b in range(batch_size):
            pre, mel = self.pairs[self.rng.integers(len(self.pairs))]
            T = mel.shape[0]
            s = int(self.rng.integers(0, max(T - F, 0) + 1))
            crop = mel[s: s + F]
            mels[b, : crop.shape[0]] = crop
            w = pre[s * hop: s * hop + hop * (F - 1)]
            wavs[b, : len(w)] = w
        return mels, wavs


def toy_utterances(audio: AudioConfig, n: int = 64, seed: int = 0,
                   version: int = 1) -> List[np.ndarray]:
    """Procedural training audio. ``version=2`` renders the speech-like
    toy-v2 acoustics (random tempo, coarticulated boundaries, pitch
    declination, noise floor — data/toy.py::ToySpecV2), the corpus the
    generalization evaluation holds the vocoder to."""
    from ..configs import get_config
    from ..data.toy import (random_text, synthesize_utterance,
                            synthesize_utterance_v2)
    hp = get_config("ljspeech").replace(audio=audio)
    rng = np.random.default_rng(seed)
    if version == 2:
        return [synthesize_utterance_v2(random_text(rng), hp, rng)
                for _ in range(n)]
    return [synthesize_utterance(random_text(rng), hp) for _ in range(n)]


def wav_dir_utterances(wav_dir: str, audio: AudioConfig,
                       limit: Optional[int] = None) -> List[np.ndarray]:
    import glob
    import os
    ap = AudioProcessor(audio)
    paths = sorted(glob.glob(os.path.join(wav_dir, "*.wav")))
    if limit:
        paths = paths[:limit]
    if not paths:
        raise FileNotFoundError(f"no .wav files in {wav_dir}")
    return [ap.load_wav(p) for p in paths]


def make_vocoder_train_step(cfg: VocoderConfig, model: MelVocoder,
                            optimizer) -> Callable:
    scales = tuple(tuple(s) for s in cfg.stft_loss_scales)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, mels, wavs):
        def loss_fn(p):
            spec = model.apply({"params": p}, mels)
            pred = spec_to_wav(spec, model.audio)
            return multires_stft_loss(pred, wavs, scales)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def train_vocoder(cfg: VocoderConfig, audio: AudioConfig,
                  sampler: PairSampler, model_dir: str,
                  log_every: int = 100, save_every: int = 2000,
                  seed: int = 0):
    """Full training run; returns (model, params, last_loss). Resumes from
    the latest checkpoint in model_dir if one exists."""
    from ..models.vocoder import save_vocoder_config
    from ..utils.checkpoint import CheckpointManager

    model = MelVocoder(cfg, audio)
    mel0 = jnp.zeros((cfg.batch_size, cfg.segment_frames, audio.num_mels),
                     jnp.float32)
    params = model.init(jax.random.key(seed), mel0)["params"]
    optimizer = optax.adam(cfg.learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2)
    opt_state = optimizer.init(params)

    save_vocoder_config(model_dir, cfg, audio)
    mgr = CheckpointManager(model_dir)
    start = 0
    restored = mgr.restore({"params": params, "opt_state": opt_state,
                            "step": 0})
    if restored is not None:
        params, opt_state = restored["params"], restored["opt_state"]
        start = int(restored["step"])
        print(f"vocoder: resumed from step {start}")

    step_fn = make_vocoder_train_step(cfg, model, optimizer)
    loss = float("nan")
    t0 = time.time()
    for it in range(start, cfg.steps):
        mels, wavs = sampler.sample(cfg.batch_size)
        params, opt_state, loss = step_fn(params, opt_state,
                                          jnp.asarray(mels),
                                          jnp.asarray(wavs))
        if (it + 1) % log_every == 0 or it == start:
            print(f"vocoder step {it + 1}/{cfg.steps}: "
                  f"loss {float(loss):.4f} "
                  f"({(time.time() - t0) / max(it - start + 1, 1) * 1e3:.1f} "
                  f"ms/step)")
        if (it + 1) % save_every == 0:
            mgr.save(it + 1, {"params": jax.device_get(params),
                              "opt_state": jax.device_get(opt_state),
                              "step": it + 1})
    mgr.save(cfg.steps, {"params": jax.device_get(params),
                         "opt_state": jax.device_get(opt_state),
                         "step": cfg.steps})
    mgr.close()
    return model, params, float(loss)
