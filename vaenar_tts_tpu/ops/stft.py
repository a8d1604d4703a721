"""Batched on-device mel-spectrogram frontend (JAX/XLA, MXU path).

The reference extracts mels serially on CPU with librosa (~13k utterances,
reference datasets.py:148-157, audio/audio.py:74-79). Here the whole chain -
preemphasis -> center-pad -> frame -> Hann window -> rDFT -> magnitude ->
mel filterbank -> dB -> normalize - runs as ONE fused conv+matmul pipeline on
device over a batch of waveforms.

Design note: framing+window+DFT collapse into a single strided convolution
whose filters are the windowed DFT basis, which XLA maps straight onto the
MXU - a hand-written Pallas kernel would replicate exactly that schedule, so
the kernel budget is spent where XLA cannot fuse (attention; see
ops/flash_attention.py). Numerics are validated against the NumPy reference
implementation (audio/dsp.py) in tests/test_jax_dsp.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.dsp import hann_window, mel_filterbank
from ..configs.hparams import AudioConfig


@functools.lru_cache(maxsize=4)
def _dft_filters(n_fft: int, win_length: int) -> np.ndarray:
    """[2*(1+n_fft/2), 1, n_fft] conv filters: windowed real/imag DFT basis."""
    window = np.zeros(n_fft)
    lpad = (n_fft - win_length) // 2
    window[lpad:lpad + win_length] = hann_window(win_length)
    n_bins = 1 + n_fft // 2
    k = np.arange(n_bins)[:, None]
    n = np.arange(n_fft)[None, :]
    angle = 2.0 * np.pi * k * n / n_fft
    real = np.cos(angle) * window
    imag = -np.sin(angle) * window
    filters = np.concatenate([real, imag], axis=0)  # [2*n_bins, n_fft]
    return filters[:, None, :].astype(np.float32)


def preemphasis(y: jnp.ndarray, coef: float) -> jnp.ndarray:
    """y[t] - coef*y[t-1] (reference audio.py:214-226; first sample passes
    through, matching scipy.signal.lfilter([1,-c],[1],x))."""
    return jnp.concatenate([y[..., :1], y[..., 1:] - coef * y[..., :-1]],
                           axis=-1)


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """[B, T] (already padded) -> frames [B, F, n_fft] by gather.

    Framing + windowed-DFT as gather + ONE dense matmul maps directly onto
    the MXU; a strided conv with a 2048-wide kernel expresses the same math
    but stresses the TPU conv lowering (observed device faults), so the
    matmul form is the production path."""
    T = y.shape[1]
    n_frames = 1 + (T - n_fft) // hop
    starts = jnp.arange(n_frames) * hop  # [F]
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]  # [F, n_fft]
    return y[:, idx]  # [B, F, n_fft]


def batched_stft_ri(y: jnp.ndarray, n_fft: int, hop: int, win_length: int
                    ) -> jnp.ndarray:
    """Real/imag STFT of pre-padded signals: [B, T] -> [B, F, 2*bins]."""
    frames = frame_signal(y, n_fft, hop)
    basis = jnp.asarray(_dft_filters(n_fft, win_length))[:, 0, :].T
    return jnp.matmul(frames, basis, precision=jax.lax.Precision.HIGHEST)


def batched_stft_magnitude(y: jnp.ndarray, n_fft: int, hop: int,
                           win_length: int, center: bool = True
                           ) -> jnp.ndarray:
    """|STFT| for a batch: y [B, T] -> [B, n_frames, 1+n_fft/2]."""
    if y.ndim == 1:
        y = y[None]
    if center:
        y = jnp.pad(y, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    out = batched_stft_ri(y, n_fft, hop, win_length)  # [B, F, 2*bins]
    n_bins = 1 + n_fft // 2
    real, imag = out[..., :n_bins], out[..., n_bins:]
    return jnp.sqrt(real ** 2 + imag ** 2 + 1e-30)  # [B, F, bins]


def batched_melspectrogram(y: jnp.ndarray, cfg: AudioConfig,
                           apply_preemphasis: bool = True,
                           center: Optional[bool] = None) -> jnp.ndarray:
    """Normalized log-mel for a batch of waveforms: [B, T] -> [B, F, num_mels]
    (the on-device equivalent of AudioProcessor.melspectrogram, transposed to
    the [frames, mels] layout the data pipeline stores).

    ``center=False`` lets callers pre-pad each utterance individually
    (ragged batches) while keeping exact centered-frame semantics."""
    if y.ndim == 1:
        y = y[None]
    if apply_preemphasis:
        y = preemphasis(y, cfg.preemphasize)
    mag = batched_stft_magnitude(y, cfg.n_fft, cfg.frame_shift_sample,
                                 cfg.frame_length_sample,
                                 cfg.center if center is None else center)
    mel_fb = jnp.asarray(mel_filterbank(
        cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.min_mel_freq,
        cfg.max_mel_freq).T.astype(np.float32))  # [bins, n_mels]
    mel = jnp.matmul(mag, mel_fb, precision=jax.lax.Precision.HIGHEST)
    # dB chain (reference audio.py:183-201)
    S = 20.0 * jnp.log10(jnp.maximum(1e-5, mel)) - cfg.ref_level_db
    if cfg.symmetric_specs:
        S = jnp.clip(
            (2 * cfg.max_abs_value) * ((S - cfg.min_level_db)
                                       / (-cfg.min_level_db))
            - cfg.max_abs_value, -cfg.max_abs_value, cfg.max_abs_value)
    else:
        S = jnp.clip(cfg.max_abs_value * ((S - cfg.min_level_db)
                                          / (-cfg.min_level_db)),
                     0, cfg.max_abs_value)
    return S


def melspectrogram_frames(n_samples: int, cfg: AudioConfig) -> int:
    """Frame count for a signal of n_samples (center=True)."""
    return 1 + n_samples // cfg.frame_shift_sample
