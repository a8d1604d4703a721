"""Neural mel->waveform vocoder with an inverse-STFT head.

A capability beyond the reference, which vocodes only via 60-iteration
Griffin-Lim on host CPU (reference audio/audio.py:95-102, audio/utils.py:
24-40). At this framework's synthesis rates (~10M mel frames/s/chip) the
vocoder dominates end-to-end latency, so this model moves vocoding onto the
accelerator as ONE parallel pass:

    mel [B,T,80] -> Conv1D embed -> N ConvNeXt-style blocks (depthwise conv
    + LayerNorm + pointwise MLP, all MXU-friendly matmuls) -> per-frame
    heads: log-magnitude + unit phasor (re,im) -> complex STFT frames ->
    inverse STFT as one dense matmul + overlap-add (ops/griffin_lim.
    _istft_ola) -> waveform.

No iterative phase recovery: the phasor head predicts phase directly
(Vocos-style ISTFT-head design, re-derived here on this framework's own
DSP stack). Deterministic, fully parallel over frames, and trainable with a
multi-resolution STFT loss (training/vocoder.py). The mel input is the SAME
normalized log-mel the TTS model emits, computed from preemphasized audio
(data/corpus.py), so the predicted waveform is in the preemphasized domain
and callers apply the inverse-preemphasis IIR on host exactly as the
Griffin-Lim path does (audio/export.py).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..configs.hparams import AudioConfig


@dataclass(frozen=True)
class VocoderConfig:
    """ISTFT-head vocoder hyperparameters (standalone tree: the vocoder is an
    independent model family with its own checkpoints; it deliberately does
    not enter the acoustic model's HParams/serialization surface)."""

    hidden: int = 256
    n_blocks: int = 4
    kernel_size: int = 7
    mlp_ratio: int = 3
    compute_dtype: str = "float32"  # bfloat16 on chip; heads stay fp32
    # training
    segment_frames: int = 120  # static crop length (frames)
    batch_size: int = 16
    learning_rate: float = 2e-4
    adam_b1: float = 0.9
    adam_b2: float = 0.99
    steps: int = 20000
    log_magnitude_clip: float = 8.0  # exp(8) ~ 3e3, above any real |STFT|
    # multi-resolution STFT loss scales: (n_fft, hop, win_length)
    stft_loss_scales: Tuple[Tuple[int, int, int], ...] = (
        (512, 128, 512), (1024, 256, 1024), (2048, 512, 2048))

    def dtype(self):
        return jnp.dtype(self.compute_dtype)


class ConvNeXtBlock(nn.Module):
    """Depthwise conv (k wide) -> LayerNorm -> pointwise MLP, residual."""

    hidden: int
    kernel_size: int
    mlp_ratio: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.hidden, (self.kernel_size,),
                    feature_group_count=self.hidden, dtype=self.dtype,
                    name="dwconv")(x)
        h = nn.LayerNorm(dtype=self.dtype, name="norm")(h)
        h = nn.Dense(self.mlp_ratio * self.hidden, dtype=self.dtype,
                     name="pw1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="pw2")(h)
        return x + h


class MelVocoder(nn.Module):
    """mel [B, T, num_mels] -> real/imag STFT frames [B, 2*bins, T]."""

    cfg: VocoderConfig
    audio: AudioConfig

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        dt = c.dtype()
        n_bins = 1 + self.audio.n_fft // 2
        x = nn.Conv(c.hidden, (c.kernel_size,), dtype=dt, name="embed")(
            mel.astype(dt))
        x = nn.LayerNorm(dtype=dt, name="embed_norm")(x)
        for i in range(c.n_blocks):
            x = ConvNeXtBlock(c.hidden, c.kernel_size, c.mlp_ratio, dt,
                              name=f"block_{i}")(x)
        x = nn.LayerNorm(dtype=dt, name="head_norm")(x)
        # heads in fp32: magnitudes span orders of magnitude and the phasor
        # normalization divides by small numbers
        h = nn.Dense(3 * n_bins, dtype=jnp.float32, name="head")(
            x.astype(jnp.float32))
        log_mag, re, im = jnp.split(h, 3, axis=-1)
        mag = jnp.exp(jnp.clip(log_mag, -c.log_magnitude_clip,
                               c.log_magnitude_clip))
        norm = jnp.sqrt(re * re + im * im + 1e-9)
        spec_re = mag * re / norm  # [B, T, bins]
        spec_im = mag * im / norm
        # [B, 2*bins, T] layout for ops/griffin_lim._istft_ola
        return jnp.concatenate([spec_re, spec_im], axis=-1).transpose(0, 2, 1)


def spec_to_wav(spec_ri: jnp.ndarray, audio: AudioConfig) -> jnp.ndarray:
    """[B, 2*bins, T] STFT frames -> waveforms [B, hop*(T-1)] with the same
    center-trim semantics as the host ISTFT (audio/dsp.py::istft)."""
    from ..ops.griffin_lim import _istft_ola
    n_fft, hop = audio.n_fft, audio.frame_shift_sample
    n_frames = spec_ri.shape[2]
    y = _istft_ola(spec_ri, n_fft, hop, audio.frame_length_sample, n_frames)
    return y[:, n_fft // 2: n_fft // 2 + hop * (n_frames - 1)]


def istft_ri_host(spec_ri: np.ndarray, audio: AudioConfig) -> np.ndarray:
    """Host float32 twin of spec_to_wav: [B, 2*bins, T] -> [B, hop*(T-1)].
    Used when the attached accelerator cannot run the compiled ISTFT safely
    (the tunnel-attached TPU faults on it; audio/export.py capability probe).
    Batched scipy irfft + hop-phase vectorized overlap-add, same recipe as
    audio/dsp.gl_core — one ISTFT per batch, not iterative like GL."""
    from scipy import fft as sp_fft

    from ..audio.dsp import (_pad_center, hann_window, hop_phase_overlap_add,
                             nola_inverse)
    n_fft, hop = audio.n_fft, audio.frame_shift_sample
    n_bins = 1 + n_fft // 2
    spec_ri = np.asarray(spec_ri, np.float32)
    _, _, F = spec_ri.shape
    S = (spec_ri[:, :n_bins] + 1j * spec_ri[:, n_bins:]).astype(np.complex64)
    frames = sp_fft.irfft(S.transpose(0, 2, 1), n=n_fft, axis=2)  # [B,F,n_fft]

    window = _pad_center(hann_window(audio.frame_length_sample),
                         n_fft).astype(np.float32)
    y = hop_phase_overlap_add(frames * window, hop) \
        * nola_inverse(window, hop, F)
    return y[:, n_fft // 2: n_fft // 2 + hop * (F - 1)]


def vocode(model: MelVocoder, params, mel: jnp.ndarray,
           istft_on_device: bool | None = None):
    """mel [B, T, num_mels] -> preemphasized waveforms [B, hop*(T-1)].

    The conv stack always runs on the accelerator; the ISTFT runs there too
    unless the capability probe (audio/export.device_vocoder_capable) says
    the attached device cannot run the compiled overlap-add safely, in which
    case the predicted spectra are pulled and inverted on host (one
    vectorized pass, not iterative - unlike Griffin-Lim the host cost is one
    ISTFT, not 121)."""
    spec = model.apply({"params": params}, mel)
    if istft_on_device is None:
        from ..audio.export import device_vocoder_capable
        istft_on_device = device_vocoder_capable()
    if istft_on_device:
        return spec_to_wav(spec, model.audio)
    return istft_ri_host(np.asarray(spec, np.float32), model.audio)


# -- persistence ---------------------------------------------------------------

CONFIG_NAME = "vocoder_config.json"


def save_vocoder_config(model_dir: str, cfg: VocoderConfig,
                        audio: AudioConfig) -> None:
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, CONFIG_NAME), "w") as f:
        json.dump({"vocoder": dataclasses.asdict(cfg),
                   "audio": dataclasses.asdict(audio)}, f, indent=2)


def load_vocoder(model_dir: str):
    """(model, params) from a trained vocoder checkpoint directory."""
    from ..utils.checkpoint import CheckpointManager
    with open(os.path.join(model_dir, CONFIG_NAME)) as f:
        raw = json.load(f)
    raw["vocoder"]["stft_loss_scales"] = tuple(
        tuple(s) for s in raw["vocoder"]["stft_loss_scales"])
    cfg = VocoderConfig(**raw["vocoder"])
    audio = AudioConfig(**raw["audio"])
    model = MelVocoder(cfg, audio)
    mel0 = jnp.zeros((1, cfg.segment_frames, audio.num_mels), jnp.float32)
    params = model.init(jax.random.key(0), mel0)["params"]
    import optax
    opt_state = optax.adam(cfg.learning_rate, b1=cfg.adam_b1,
                           b2=cfg.adam_b2).init(params)
    mgr = CheckpointManager(model_dir)
    restored = mgr.restore({"params": params, "opt_state": opt_state,
                            "step": 0})
    mgr.close()
    if restored is None:
        raise FileNotFoundError(f"no vocoder checkpoint in {model_dir}")
    return model, restored["params"]
