"""Test/eval artifact emitters (reference audio/utils.py:10-116, TestUtils):
trimmed mel .npy files, threaded Griffin-Lim wav synthesis, mel-spectrogram
plots, and per-attention-block multi-head alignment plots.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence

import numpy as np

from ..configs.hparams import HParams
from ..text.tokenizer import CharTokenizer
from .dsp import AudioProcessor


def device_vocoder_capable() -> bool:
    """Probe: can the attached accelerator run the compiled Griffin-Lim loop
    (ops/griffin_lim.py) safely? TPUs qualify (round 3 validated the full
    program on the tunnel-attached chip — 25x the host path, VOCODER.md;
    the round-2 'axon' plugin fault no longer reproduces, VOCODER_BISECT.json);
    on the CPU backend host threads win, so it falls back to the host
    vocoder. Override with VAENAR_JAX_VOCODER=1/0."""
    env = os.environ.get("VAENAR_JAX_VOCODER")
    if env is not None:
        return env.lower() not in ("0", "false", "no")
    try:
        import jax
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _agg_matplotlib():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


class TestUtils:
    def __init__(self, hps: HParams, save_dir: Optional[str],
                 neural_vocoder_dir: Optional[str] = None):
        """``neural_vocoder_dir``: a trained ISTFT-head vocoder checkpoint
        (cli.train_vocoder); when set, the auto vocoder path prefers it over
        Griffin-Lim."""
        self.hps = hps
        self.save_dir = save_dir
        self.neural_vocoder_dir = neural_vocoder_dir
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
        self.audio = AudioProcessor(hps.audio)
        self.tokenizer = CharTokenizer(hps.text)
        if neural_vocoder_dir:
            # fail FAST on a broken/missing/incompatible vocoder: a lazy load
            # would silently drop every test-interval wav (the training loop
            # swallows vocoder errors, matching reference train.py:314-318)
            self._load_neural_vocoder(neural_vocoder_dir)

    def _load_neural_vocoder(self, vocoder_dir: str):
        """Load + cache a neural vocoder, validating its audio config
        against this model's (a mismatched hop/sr would silently truncate
        and mis-stamp the wavs)."""
        if getattr(self, "_nv", None) is not None \
                and self._nv_dir == vocoder_dir:
            return self._nv
        from ..models.vocoder import load_vocoder
        nv = load_vocoder(vocoder_dir)
        va, ta = nv[0].audio, self.hps.audio
        mismatches = {
            k: (getattr(va, k), getattr(ta, k))
            for k in ("sample_rate", "frame_shift_sample",
                      "frame_length_sample", "num_mels", "num_freq")
            if getattr(va, k) != getattr(ta, k)}
        if mismatches:
            raise ValueError(
                f"neural vocoder at {vocoder_dir} was trained under a "
                f"different audio config than this model: {mismatches} "
                f"(vocoder, model). Retrain it with the matching "
                f"--dataset/audio overrides.")
        self._nv, self._nv_dir = nv, vocoder_dir
        return nv

    # -- mels (reference audio/utils.py:16-22) --------------------------------

    def write_mels(self, tag, mel_batch: np.ndarray, mel_lengths, ids,
                   prefix: str = "") -> List[str]:
        paths = []
        for i, mel in enumerate(mel_batch):
            trimmed = mel[: int(mel_lengths[i])]
            name = f"{prefix}-{tag}-{_fid(ids[i])}.npy"
            path = os.path.join(self.save_dir, name)
            np.save(path, trimmed)
            paths.append(path)
        return paths

    # -- wavs (reference audio/utils.py:24-40, threaded) ----------------------

    def synthesize_and_save_wavs(self, tag, mel_batch: np.ndarray,
                                 mel_lengths, ids, prefix: str = "",
                                 seed: int = 0) -> List[str]:
        paths = []

        def synth(i):
            mel = mel_batch[i][: int(mel_lengths[i])]
            rng = np.random.default_rng(seed + i)
            wav = self.audio.inv_mel_spectrogram(mel.T, rng)
            wav = self.audio.inv_preemphasize(wav)
            name = f"{prefix}-{tag}-{_fid(ids[i])}.wav"
            path = os.path.join(self.save_dir, name)
            self.audio.save_wav(np.asarray(wav), path)
            return path

        # cap at the core count: on a 1-core host extra threads only add
        # contention (GL is CPU-bound; numpy/scipy release the GIL in FFTs)
        workers = min(8, os.cpu_count() or 1, len(mel_batch) or 1)
        with ThreadPoolExecutor(max_workers=workers) as ex:
            paths = list(ex.map(synth, range(len(mel_batch))))
        return paths

    def synthesize_and_save_wavs_jax(self, tag, mel_batch: np.ndarray,
                                     mel_lengths, ids, prefix: str = "",
                                     seed: int = 0) -> List[str]:
        """Batched on-device Griffin-Lim (ops/griffin_lim.py) instead of CPU
        threads; host only writes the int16 files."""
        import jax
        from ..ops.griffin_lim import mel_to_wav_jax
        wavs = np.asarray(mel_to_wav_jax(
            np.asarray(mel_batch, np.float32), self.hps.audio,
            jax.random.key(seed)))
        paths = []
        hop = self.hps.audio.frame_shift_sample
        for i in range(len(mel_batch)):
            n = int(mel_lengths[i]) * hop
            wav = self.audio.inv_preemphasize(wavs[i][:n])
            name = f"{prefix}-{tag}-{_fid(ids[i])}.wav"
            path = os.path.join(self.save_dir, name)
            self.audio.save_wav(np.asarray(wav), path)
            paths.append(path)
        return paths

    def synthesize_and_save_wavs_neural(self, tag, mel_batch: np.ndarray,
                                        mel_lengths, ids, vocoder_dir: str,
                                        prefix: str = "") -> List[str]:
        """Neural ISTFT-head vocoder (models/vocoder.py): the whole batch is
        vocoded in ONE device pass (no iterative phase recovery); host work
        is the inverse-preemphasis IIR and file writes."""
        import jax.numpy as jnp

        from ..models.vocoder import vocode
        model, params = self._load_neural_vocoder(vocoder_dir)
        wavs = np.asarray(
            vocode(model, params, jnp.asarray(mel_batch, jnp.float32)),
            np.float32)
        hop = self.hps.audio.frame_shift_sample
        paths = []
        for i in range(len(mel_batch)):
            n = max(int(mel_lengths[i]) - 1, 1) * hop
            wav = self.audio.inv_preemphasize(wavs[i][:n])
            name = f"{prefix}-{tag}-{_fid(ids[i])}.wav"
            path = os.path.join(self.save_dir, name)
            self.audio.save_wav(np.asarray(wav), path)
            paths.append(path)
        return paths

    def synthesize_and_save_wavs_streaming(self, tag, mel_batch: np.ndarray,
                                           mel_lengths, ids, prefix: str = "",
                                           seed: int = 0,
                                           chunk_frames: int = 100,
                                           backend: str = "auto"):
        """Streaming chunked vocoder (audio/streaming.py): audio is produced
        incrementally per chunk instead of per utterance. Returns
        ``(paths, ttfa_seconds)`` where ttfa is each utterance's
        time-to-first-audio — the interactive-latency metric the
        whole-utterance reference path (audio/utils.py:24-40) cannot bound.
        ``backend``: "host"/"device" GL windows, or "auto" = device whenever
        the attached accelerator passes the capability probe (the measured
        ~25x window speedup moves TTFA from GL-bound to dispatch-bound)."""
        import time

        from .streaming import StreamingVocoder
        if backend == "auto":
            backend = "device" if device_vocoder_capable() else "host"
        sv = StreamingVocoder(self.audio, chunk_frames=chunk_frames,
                              backend=backend)
        paths, ttfas = [], []
        for i in range(len(mel_batch)):
            mel = mel_batch[i][: int(mel_lengths[i])]
            t0 = time.perf_counter()
            pieces = []
            for j, piece in enumerate(
                    sv.stream(mel, np.random.default_rng(seed + i))):
                if j == 0:
                    ttfas.append(time.perf_counter() - t0)
                pieces.append(piece)
            name = f"{prefix}-{tag}-{_fid(ids[i])}.wav"
            path = os.path.join(self.save_dir, name)
            self.audio.save_wav(np.concatenate(pieces), path)
            paths.append(path)
        return paths, ttfas

    def synthesize_and_save_wavs_auto(self, tag, mel_batch: np.ndarray,
                                      mel_lengths, ids, prefix: str = "",
                                      seed: int = 0) -> List[str]:
        """Preference-ordered vocoder: the trained neural vocoder when one
        was configured, else batched on-device Griffin-Lim when the attached
        accelerator can run the compiled loop safely, else host threads
        (reference GL: audio/audio.py:95-102)."""
        if self.neural_vocoder_dir:
            return self.synthesize_and_save_wavs_neural(
                tag, mel_batch, mel_lengths, ids, self.neural_vocoder_dir,
                prefix)
        if device_vocoder_capable():
            return self.synthesize_and_save_wavs_jax(
                tag, mel_batch, mel_lengths, ids, prefix, seed)
        return self.synthesize_and_save_wavs(
            tag, mel_batch, mel_lengths, ids, prefix, seed)

    # -- plots (reference audio/utils.py:50-116) -------------------------------

    def draw_melspectrograms(self, tag, mel_batch: np.ndarray, mel_lengths,
                             ids, prefix: str = "") -> List[str]:
        plt = _agg_matplotlib()
        paths = []
        for i, mel in enumerate(mel_batch):
            trimmed = mel[: int(mel_lengths[i])]
            fig = plt.figure(figsize=(10, 4))
            plt.imshow(trimmed.T, aspect="auto", origin="lower",
                       interpolation="none")
            plt.colorbar()
            plt.tight_layout()
            name = f"{prefix}-{tag}-{_fid(ids[i])}-mel.pdf"
            path = os.path.join(self.save_dir, name)
            fig.savefig(path)
            plt.close(fig)
            paths.append(path)
        return paths

    def ids_to_text(self, token_ids: Sequence[int]) -> str:
        # reference audio/utils.py:62-70
        return self.tokenizer.decode(token_ids, strip_specials=False)

    def multi_draw_attention_alignments(self, alignments: np.ndarray, texts,
                                        text_lengths, mel_lengths, tag, ids,
                                        prefix: str = "") -> List[str]:
        """alignments: [batch, heads, q_time, m_time] -> one grid PDF per
        utterance (reference audio/utils.py:72-116)."""
        plt = _agg_matplotlib()
        paths = []
        n_heads = alignments.shape[1]
        cols = 2 if n_heads > 1 else 1
        rows = -(-n_heads // cols)  # ceil: odd head counts get a full row
        for i in range(alignments.shape[0]):
            tl = int(text_lengths[i])
            ml = int(mel_lengths[i])
            fig, axes = plt.subplots(rows, cols,
                                     figsize=(4 * cols, 3 * rows),
                                     squeeze=False)
            for h in range(n_heads):
                ax = axes[h // cols][h % cols]
                ax.imshow(alignments[i, h, :ml, :tl].T, aspect="auto",
                          origin="lower", interpolation="none")
                ax.set_title(f"head {h}")
            plt.tight_layout()
            name = f"{prefix}-{tag}-{_fid(ids[i])}-ali.pdf"
            path = os.path.join(self.save_dir, name)
            fig.savefig(path)
            plt.close(fig)
            paths.append(path)
        return paths


def _fid(x) -> str:
    if isinstance(x, bytes):
        return x.decode("utf-8")
    return str(x)
