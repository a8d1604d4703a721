"""Streaming vocoder: chunked Griffin-Lim with cross-chunk phase propagation.

A capability the reference never addressed: its synthesis path (reference
inference.py:148-164) vocodes whole utterances, so time-to-first-audio equals
the full Griffin-Lim cost. Here mel synthesis is a single ~1 ms device pass
(the decoder is fully parallel), so interactive latency is set entirely by
host vocoding. This module vocodes the mel in chunks and yields playable wav
pieces as each chunk converges:

  * each chunk runs Griffin-Lim (``dsp.gl_core``) on a window of
    [left_context | chunk | right_context] frames — lookahead is legal because
    the whole mel already exists; "streaming" bounds vocoder latency, not mel
    availability;
  * the left-context frames are seeded with the CONVERGED phases of the
    previous window (the remaining frames with a global seeded random phase
    field), so consecutive chunks agree on phase in the overlap;
  * consecutive chunk outputs are stitched with a short equal-power Hann
    cross-fade, and the inverse-preemphasis IIR filter carries its state
    across chunks (scipy ``lfilter`` zi), so the stitched stream is
    sample-continuous.

Time-to-first-audio ≈ (chunk+context)/total of the full vocode cost; with the
default 100-frame chunks on LJSpeech-length utterances that is ~6x below
whole-utterance vocoding (measured in scripts/bench_vocoder.py).

Backends: ``backend="host"`` runs each window through the NumPy
``dsp.gl_core``; ``backend="device"`` runs it through the jitted
fixed-shape window kernel (ops/griffin_lim.py::gl_window_fn) — the same
MXU Griffin-Lim formulation the whole-utterance device vocoder uses, with
caller-provided initial phase and converged-phase output so cross-chunk
propagation is identical. All windows pad to ONE static bucket
(chunk + 2*context frames), so the device pays a single compile.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
from scipy import signal as sp_signal

from .dsp import AudioProcessor, gl_core


class StreamingVocoder:
    """Chunked Griffin-Lim streamer over one AudioProcessor config.

    ``chunk_frames`` mel frames are emitted per yield (~1.16 s at
    hop 256 / 22.05 kHz for the default 100); ``context_frames`` of left and
    right context surround each chunk inside the GL window. Larger context =
    better seams, more redundant work.
    """

    def __init__(self, ap: AudioProcessor, chunk_frames: int = 100,
                 context_frames: int = 24, crossfade_samples: int = 256,
                 iters: Optional[int] = None, backend: str = "host"):
        if chunk_frames < 1:
            raise ValueError("chunk_frames must be >= 1")
        if context_frames < 1:
            # the emit-region geometry relies on >=1 frame of right context
            # for every non-final chunk (len(y) = hop*(W-1) would otherwise
            # truncate each chunk one hop short)
            raise ValueError("context_frames must be >= 1")
        if crossfade_samples < 0:
            raise ValueError("crossfade_samples must be >= 0")
        if not ap.cfg.center:
            raise NotImplementedError(
                "StreamingVocoder assumes center=True STFT geometry "
                "(sample offsets are frame*hop); center=False configs must "
                "use the whole-utterance vocoder")
        if backend not in ("host", "device"):
            raise ValueError(f"backend must be 'host' or 'device', "
                             f"got {backend!r}")
        self.ap = ap
        self.cfg = ap.cfg
        self.chunk = chunk_frames
        self.ctx = context_frames
        self.xfade = crossfade_samples
        self.iters = self.cfg.griffin_lim_iters if iters is None else iters
        self.backend = backend
        if backend == "device":
            # one static window bucket (chunk + both contexts) -> ONE compile
            # for every chunk of every utterance; shorter edge windows are
            # zero-padded and masked inside the kernel (ops/griffin_lim.py
            # gl_window_fn), so the valid region matches an unpadded run
            from ..ops.griffin_lim import gl_window_fn
            self._w_bucket = chunk_frames + 2 * context_frames
            self._dev_fn = gl_window_fn(
                self.cfg.n_fft, self.cfg.frame_shift_sample,
                self.cfg.frame_length_sample, self._w_bucket, self.iters)

    def _gl_window(self, mag_w: np.ndarray, init: np.ndarray
                   ) -> tuple[np.ndarray, np.ndarray]:
        """One GL window -> (center-trimmed signal, converged phases),
        host (dsp.gl_core) or device (ops/griffin_lim.gl_window_fn)."""
        cfg = self.cfg
        if self.backend == "host":
            return gl_core(mag_w, init, cfg.n_fft, cfg.frame_shift_sample,
                           cfg.frame_length_sample, self.iters, cfg.center)
        import numpy as _np
        w_true, n_bins = mag_w.shape
        wb = self._w_bucket
        pad = wb - w_true
        mag_p = _np.pad(mag_w, ((0, pad), (0, 0)))
        re0 = _np.pad(init.real.astype(_np.float32), ((0, pad), (0, 0)))
        im0 = _np.pad(init.imag.astype(_np.float32), ((0, pad), (0, 0)))
        y, re_f, im_f = self._dev_fn(mag_p, re0, im0, w_true)
        hop = cfg.frame_shift_sample
        y = _np.asarray(y, _np.float32)[: hop * (w_true - 1)]
        fin = (_np.asarray(re_f[:w_true])
               + 1j * _np.asarray(im_f[:w_true])).astype(_np.complex64)
        return y, fin

    def stream(self, mel: np.ndarray,
               rng: np.random.Generator | None = None
               ) -> Iterator[np.ndarray]:
        """Yield float32 wav pieces for ``mel`` [n_frames, num_mels].

        Concatenated pieces are the full utterance: same length and
        preemphasis semantics as
        ``inv_preemphasize(inv_mel_spectrogram(mel.T))``.
        """
        ap, cfg = self.ap, self.cfg
        rng = rng or np.random.default_rng()
        hop = cfg.frame_shift_sample

        # mel -> linear magnitude ** power, as inv_mel_spectrogram does
        S = ap.mel_to_linear(
            ap.db_to_amp(ap.denormalize(mel.T) + cfg.ref_level_db))
        S = S ** cfg.power
        mag = np.ascontiguousarray(S.T.astype(np.float32))  # [frames, bins]
        n = mag.shape[0]
        if n < 2:
            raise ValueError("need at least 2 mel frames to vocode")
        total_samples = hop * (n - 1)  # center-trimmed ISTFT length

        # one global random phase field: a chunked run and a whole-utterance
        # run start from the same per-frame initialization
        angles_global = np.exp(
            2j * np.pi * rng.random((mag.shape[1], n))).T.astype(np.complex64)

        # inverse-preemphasis IIR state carried across chunks
        if cfg.preemphasize is not None:
            b, a = [1.0], [1.0, -cfg.preemphasize]
            zi = sp_signal.lfilter_zi(b, a) * 0.0
        prev_angles: np.ndarray | None = None
        prev_ws = 0
        prev_tail: np.ndarray | None = None  # prev window's post-emit samples
        fade_out = 0.5 * (1.0 + np.cos(
            np.linspace(0.0, np.pi, self.xfade, dtype=np.float32)))
        emitted = 0

        for s in range(0, n, self.chunk):
            e = min(s + self.chunk, n)
            ws = max(0, s - self.ctx)
            we = min(n, e + self.ctx)
            init = angles_global[ws:we].copy()
            if prev_angles is not None and s > ws:
                # left-context frames [ws, s): converged phases of the
                # previous window
                init[: s - ws] = prev_angles[ws - prev_ws: s - prev_ws]
            y, fin = self._gl_window(mag[ws:we], init)
            # window signal y covers absolute samples [ws*hop, ws*hop+len(y))
            lo = (s - ws) * hop  # emit region starts at frame s
            hi = min(lo + (e - s) * hop, len(y),
                     total_samples - ws * hop)
            piece = y[lo:hi].copy()
            if prev_tail is not None and len(piece):
                m = min(len(prev_tail), len(piece), self.xfade)
                # ramp over the ACTUAL overlap m: slicing the full-length
                # ramp would end at a nonzero weight and leave a step at the
                # blend boundary when m < xfade
                w = (fade_out[:m] if m == self.xfade else
                     0.5 * (1.0 + np.cos(
                         np.linspace(0.0, np.pi, m, dtype=np.float32))))
                piece[:m] = prev_tail[:m] * w + piece[:m] * (1.0 - w)
            # keep the samples this window computed past its emit region for
            # cross-fading the next chunk's start
            prev_tail = y[hi: hi + self.xfade].copy() if hi < len(y) else None
            prev_angles, prev_ws = fin, ws
            if cfg.preemphasize is not None and len(piece):
                piece, zi = sp_signal.lfilter(b, a, piece, zi=zi)
                piece = piece.astype(np.float32)
            emitted += len(piece)
            if len(piece):
                yield piece
        assert emitted == total_samples, (emitted, total_samples)

    def synthesize(self, mel: np.ndarray,
                   rng: np.random.Generator | None = None) -> np.ndarray:
        """Whole-utterance convenience wrapper over ``stream``."""
        return np.concatenate(list(self.stream(mel, rng)))
