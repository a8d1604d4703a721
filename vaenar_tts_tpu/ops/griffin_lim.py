"""Batched on-device Griffin-Lim vocoder.

The reference synthesizes waveforms with 60 Griffin-Lim iterations per
utterance on CPU threads (reference audio/audio.py:95-102,
audio/utils.py:24-40). Here the whole batch iterates on-device: STFT as
gather + one dense DFT matmul on the MXU (ops/stft.py), iSTFT as the inverse
matmul + shifted slice-add overlap-add, phase updates element-wise on the
VPU, and the 60-iteration loop as a lax.fori_loop inside one jitted program.

STATUS: numerically validated against the NumPy reference on the CPU backend
(tests/test_griffin_lim.py) AND, as of round 3, on the attached TPU: the
round-2 device fault no longer reproduces (the full bisect ladder of
scripts/bisect_device_gl.py passes, VOCODER_BISECT.json) and the production
program runs at scale — 677 ms for a 16x720-frame batch (133.6 s of audio),
~25x the fast host path (VOCODER.md "Round 3"). device_vocoder_capable()
gates the auto path; VAENAR_JAX_VOCODER=0 forces the host fallback if a
platform update regresses.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.dsp import hann_window
from ..configs.hparams import AudioConfig
from .stft import _dft_filters


@functools.lru_cache(maxsize=4)
def _idft_filters(n_fft: int, win_length: int) -> np.ndarray:
    """[2*n_bins, 1, n_fft] filters mapping (re, im) spectra back to windowed
    time frames: frame = window * irfft(spec)."""
    window = np.zeros(n_fft)
    lpad = (n_fft - win_length) // 2
    window[lpad:lpad + win_length] = hann_window(win_length)
    n_bins = 1 + n_fft // 2
    k = np.arange(n_bins)[None, :]
    n = np.arange(n_fft)[:, None]
    angle = 2.0 * np.pi * k * n / n_fft
    # irfft coefficients: x[n] = (1/N) * sum_k w_k * (re_k cos - im_k sin)
    w = np.full(n_bins, 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    re_basis = np.cos(angle) * w / n_fft  # [n_fft, n_bins]
    im_basis = -np.sin(angle) * w / n_fft
    basis = np.concatenate([re_basis, im_basis], axis=1)  # [n_fft, 2*n_bins]
    basis = basis * window[:, None]
    return basis.T[:, None, :].astype(np.float32)  # [2*n_bins, 1, n_fft]


@functools.lru_cache(maxsize=4)
def _window_sumsquare(n_fft: int, win_length: int, hop: int,
                      n_frames: int) -> np.ndarray:
    window = np.zeros(n_fft)
    lpad = (n_fft - win_length) // 2
    window[lpad:lpad + win_length] = hann_window(win_length)
    total = n_fft + hop * (n_frames - 1)
    wss = np.zeros(total)
    for i in range(n_frames):
        wss[i * hop: i * hop + n_fft] += window ** 2
    wss[wss < 1e-11] = 1.0
    return wss.astype(np.float32)


def _stft_ri(y: jnp.ndarray, n_fft: int, hop: int, win_length: int
             ) -> jnp.ndarray:
    """[B, T_padded] (already center-padded) -> [B, 2*bins, F]."""
    from .stft import batched_stft_ri
    return batched_stft_ri(y, n_fft, hop, win_length).transpose(0, 2, 1)


def _overlap_add_sliceadd(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """[B, F, n_fft] windowed frames -> [B, (F + k - 1) * hop] via k shifted
    in-place slice-adds (lowers to dynamic-update-slice)."""
    B, n_frames, n_fft = frames.shape
    k = n_fft // hop
    # frame f covers [f*hop, f*hop + n_fft). Split each frame into k hop-sized
    # chunks; chunk j of frame f lands at offset (f + j) * hop.
    chunks = frames.reshape(B, n_frames, k, hop)
    y = jnp.zeros((B, n_frames + k - 1, hop), frames.dtype)
    for j in range(k):
        y = y.at[:, j:j + n_frames, :].add(chunks[:, :, j, :])
    return y.reshape(B, (n_frames + k - 1) * hop)

def _overlap_add_concat(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Same contract as ``_overlap_add_sliceadd`` but scatter-free: each
    shifted chunk stream is zero-padded by CONCATENATION and the k streams
    are summed — only pad/concat/reshape/add, no dynamic-update-slice, as a
    candidate around the tunnel-attached-device fault (VERDICT r2 #3)."""
    B, n_frames, n_fft = frames.shape
    k = n_fft // hop
    chunks = frames.reshape(B, n_frames, k, hop)
    zero = jnp.zeros((B, 1, hop), frames.dtype)
    streams = []
    for j in range(k):
        parts = []
        if j:
            parts.append(jnp.tile(zero, (1, j, 1)))
        parts.append(chunks[:, :, j, :])
        if k - 1 - j:
            parts.append(jnp.tile(zero, (1, k - 1 - j, 1)))
        streams.append(jnp.concatenate(parts, axis=1))
    y = streams[0]
    for s in streams[1:]:
        y = y + s
    return y.reshape(B, (n_frames + k - 1) * hop)


@functools.lru_cache(maxsize=4)
def _padded_window_sq(n_fft: int, win_length: int) -> np.ndarray:
    """Center-padded hann window squared, [n_fft] fp32 (the per-frame
    energy envelope that _window_sumsquare accumulates)."""
    w = np.zeros(n_fft)
    lpad = (n_fft - win_length) // 2
    w[lpad:lpad + win_length] = hann_window(win_length)
    return (w ** 2).astype(np.float32)


def _istft_ola(spec_ri: jnp.ndarray, n_fft: int, hop: int, win_length: int,
               n_frames: int, ola_mode: str = "sliceadd") -> jnp.ndarray:
    """[B, 2*bins, F] -> [B, n_fft + hop*(F-1)] (center padding NOT trimmed),
    NOLA-normalized overlap-add.

    Synthesis = one dense matmul (spectra -> windowed time frames) followed by
    overlap-add expressed as n_fft/hop shifted slice-adds (``ola_mode=
    "sliceadd"``) or as padded-concat stream sums (``"concat"``, scatter-free)
    - MXU + cheap element-wise adds, avoiding the giant-kernel
    conv_transpose lowering."""
    basis = jnp.asarray(_idft_filters(n_fft, win_length))[:, 0, :]  # [2b, n_fft]
    frames = jnp.einsum("bcf,cn->bfn", spec_ri, basis,
                        precision=jax.lax.Precision.HIGHEST)  # [B, F, n_fft]
    B = frames.shape[0]
    total = n_fft + hop * (n_frames - 1)
    assert n_fft % hop == 0, (n_fft, hop)
    ola = (_overlap_add_concat if ola_mode == "concat"
           else _overlap_add_sliceadd)
    y = ola(frames, hop)[:, :total]
    wss = jnp.asarray(_window_sumsquare(n_fft, win_length, hop, n_frames))
    return y / wss[None, :]


def griffin_lim_jax(magnitudes: jnp.ndarray, cfg: AudioConfig,
                    rng: jax.Array, n_iters: Optional[int] = None,
                    ola_mode: str = "sliceadd") -> jnp.ndarray:
    """Batched Griffin-Lim: magnitudes [B, F, n_bins] -> waveforms [B, T]
    (center padding trimmed). Matches AudioProcessor.griffin_lim semantics
    with a seeded random initial phase."""
    n_fft, hop, win = cfg.n_fft, cfg.frame_shift_sample, cfg.frame_length_sample
    n_iters = cfg.griffin_lim_iters if n_iters is None else n_iters
    B, F, n_bins = magnitudes.shape
    mag = magnitudes.transpose(0, 2, 1).astype(jnp.float32)  # [B, bins, F]

    phase0 = jax.random.uniform(rng, (B, n_bins, F), minval=0.0,
                                maxval=2.0 * np.pi)
    re = mag * jnp.cos(phase0)
    im = mag * jnp.sin(phase0)

    def ola(re, im):
        return _istft_ola(jnp.concatenate([re, im], axis=1), n_fft, hop, win,
                          F, ola_mode=ola_mode)

    def body(_, carry):
        re, im = carry
        y = ola(re, im)
        # re-analyze; keep only phase, snap magnitude back
        spec = _stft_ri(y, n_fft, hop, win)
        re_n, im_n = spec[:, :n_bins, :], spec[:, n_bins:, :]
        norm = jnp.sqrt(re_n ** 2 + im_n ** 2 + 1e-12)
        return mag * re_n / norm, mag * im_n / norm

    re, im = jax.lax.fori_loop(0, n_iters, body, (re, im))
    y = ola(re, im)
    return y[:, n_fft // 2: y.shape[1] - n_fft // 2]


@functools.lru_cache(maxsize=8)
def gl_window_fn(n_fft: int, hop: int, win_length: int, n_frames: int,
                 n_iters: int, ola_mode: str = "sliceadd"):
    """Jitted streaming Griffin-Lim WINDOW kernel (device backend of
    audio/streaming.StreamingVocoder): one fixed-shape window of
    ``n_frames`` mel-frame magnitudes iterates on device with a CALLER-
    PROVIDED initial phase and returns the converged phase, so consecutive
    chunks can propagate phase exactly like the host ``dsp.gl_core`` path.

    Returned callable:
        fn(mag [W, bins] fp32, re0 [W, bins], im0 [W, bins], n_valid i32)
          -> (y [hop*(W-1)] center-trimmed, re_f [W, bins], im_f [W, bins])

    ``n_valid`` masks the right-padding frames a shorter-than-bucket window
    arrives with: their magnitudes are zeroed AND the NOLA normalization is
    computed over valid frames only (a dynamic-mask overlap-add of the
    window-energy envelope), so the valid region normalizes exactly as an
    unpadded window would — static shapes for XLA, host-exact edges.
    Iteration math matches griffin_lim_jax (same _stft_ri/_istft_ola
    MXU formulation, fp32, lax.fori_loop)."""
    n_bins = 1 + n_fft // 2
    total = n_fft + hop * (n_frames - 1)
    basis = _idft_filters(n_fft, win_length)[:, 0, :]  # [2*bins, n_fft]
    ola = (_overlap_add_concat if ola_mode == "concat"
           else _overlap_add_sliceadd)

    @jax.jit
    def fn(mag: jnp.ndarray, re0: jnp.ndarray, im0: jnp.ndarray,
           n_valid: jnp.ndarray):
        mask = (jnp.arange(n_frames) < n_valid).astype(jnp.float32)
        mag_m = (mag * mask[:, None]).T[None]  # [1, bins, W]

        # NOLA normalization over VALID frames only
        w2 = jnp.asarray(_padded_window_sq(n_fft, win_length))
        wss = ola(w2[None, None, :] * mask[None, :, None], hop)[:, :total]
        wss = jnp.where(wss < 1e-11, 1.0, wss)

        def synth(re, im):
            spec_ri = jnp.concatenate([re, im], axis=1)  # [1, 2b, W]
            frames = jnp.einsum("bcf,cn->bfn", spec_ri, jnp.asarray(basis),
                                precision=jax.lax.Precision.HIGHEST)
            return ola(frames, hop)[:, :total] / wss

        re = mag_m * re0.T[None]
        im = mag_m * im0.T[None]

        def body(_, carry):
            re, im = carry
            y = synth(re, im)
            spec = _stft_ri(y, n_fft, hop, win_length)
            re_n, im_n = spec[:, :n_bins, :], spec[:, n_bins:, :]
            norm = jnp.sqrt(re_n ** 2 + im_n ** 2 + 1e-12)
            return mag_m * re_n / norm, mag_m * im_n / norm

        re, im = jax.lax.fori_loop(0, n_iters, body, (re, im))
        y = synth(re, im)[0, n_fft // 2: total - n_fft // 2]
        norm = jnp.sqrt(re ** 2 + im ** 2)
        unit = jnp.where(norm > 1e-16, 1.0 / jnp.maximum(norm, 1e-16), 0.0)
        return y, (re * unit)[0].T, (im * unit)[0].T

    return fn


def mel_to_wav_jax(mel: jnp.ndarray, cfg: AudioConfig, rng: jax.Array,
                   mel_basis_pinv: Optional[jnp.ndarray] = None,
                   ola_mode: str = "sliceadd") -> jnp.ndarray:
    """Full on-device vocoder: normalized log-mel [B, F, num_mels] -> wav
    [B, T] (inv-normalize -> dB->amp -> mel->linear -> S**power ->
    Griffin-Lim), mirroring AudioProcessor.inv_mel_spectrogram."""
    from ..audio.dsp import AudioProcessor
    if mel_basis_pinv is None:
        ap = AudioProcessor(cfg)
        mel_basis_pinv = jnp.asarray(ap.inv_mel_basis().astype(np.float32))
    # denormalize (asymmetric [0,1] path; reference audio.py:203-212)
    S = (jnp.clip(mel, 0, cfg.max_abs_value) * (-cfg.min_level_db)
         / cfg.max_abs_value + cfg.min_level_db)
    amp = jnp.power(10.0, (S + cfg.ref_level_db) * 0.05)  # [B, F, mels]
    linear = jnp.maximum(1e-10, amp @ mel_basis_pinv.T)  # [B, F, bins]
    return griffin_lim_jax(linear ** cfg.power, cfg, rng, ola_mode=ola_mode)
