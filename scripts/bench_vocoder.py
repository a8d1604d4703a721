"""Host vocoder benchmark: reference-parity float64 GL vs fast float32 GL vs
streaming chunked GL (time-to-first-audio).

Run on an idle host (the GL paths are CPU-bound):

    python scripts/bench_vocoder.py [--dur 8.0] [--utts 8]

Prints a JSON block with per-utterance timings, the threaded batch
throughput, and the streaming TTFA. The device GL (ops/griffin_lim.py) is
benchmarked separately on direct-attached hardware (it faults the
tunnel-attached chip; see CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vaenar_tts_tpu.utils.compile_cache import setup_compile_cache
setup_compile_cache()  # also pins jax_platforms=cpu under JAX_PLATFORM_NAME=cpu
                       # so --device_stream on a CPU run can't open a second
                       # TPU connection under a live training job (CLAUDE.md)

from vaenar_tts_tpu.audio.dsp import AudioProcessor
from vaenar_tts_tpu.audio.streaming import StreamingVocoder
from vaenar_tts_tpu.configs import get_config


def main() -> None:
    ap_args = argparse.ArgumentParser()
    ap_args.add_argument("--dur", type=float, default=8.0,
                         help="seconds of audio per utterance")
    ap_args.add_argument("--utts", type=int, default=8)
    ap_args.add_argument("--device_stream", action="store_true",
                         help="also time the device-backend streaming "
                              "vocoder (jitted GL window kernel, "
                              "ops/griffin_lim.py::gl_window_fn) — run on "
                              "the attached chip (VERDICT r3 #6)")
    args = ap_args.parse_args()

    cfg = get_config("ljspeech").audio
    ap = AudioProcessor(cfg)
    sr = cfg.sample_rate
    t = np.arange(int(sr * args.dur)) / sr
    y = (0.4 * np.sin(2 * np.pi * 220 * t)
         + 0.3 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 990 * t)).astype(np.float32)
    mel = ap.melspectrogram(ap.preemphasize(y)).T  # [frames, 80]
    audio_secs = args.dur

    def timed(fn, n=1):
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        return (time.perf_counter() - t0) / n

    t_slow = timed(lambda: ap.inv_mel_spectrogram(
        mel.T, np.random.default_rng(0), fast=False))
    t_fast = timed(lambda: ap.inv_mel_spectrogram(
        mel.T, np.random.default_rng(0)))

    def stream_timings(backend):
        sv = StreamingVocoder(ap, backend=backend)
        if backend == "device":
            # warm-up stream: the single static window bucket compiles once;
            # an unwarmed first chunk would time the (cached-able) compile,
            # not the kernel (CLAUDE.md tunnel rules)
            for _ in sv.stream(mel, np.random.default_rng(0)):
                pass
        t0 = time.perf_counter()
        it = sv.stream(mel, np.random.default_rng(0))
        next(it)
        ttfa = time.perf_counter() - t0
        for _ in it:
            pass
        return ttfa, time.perf_counter() - t0

    ttfa, t_stream_total = stream_timings("host")
    dev_stream = {}
    if args.device_stream:
        d_ttfa, d_total = stream_timings("device")
        dev_stream = {"device_streaming_ttfa_s": round(d_ttfa, 3),
                      "device_streaming_total_s": round(d_total, 3)}

    # threaded batch throughput (the export path,
    # audio/export.py::synthesize_and_save_wavs)
    import os
    workers = min(8, os.cpu_count() or 1, args.utts)

    def batch(fast):
        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(
                lambda i: ap.inv_mel_spectrogram(
                    mel.T, np.random.default_rng(i), fast=fast),
                range(args.utts)))

    t_batch_slow = timed(lambda: batch(False))
    t_batch_fast = timed(lambda: batch(True))

    print(json.dumps({
        "utterance_secs": audio_secs,
        "mel_frames": int(mel.shape[0]),
        "gl_iters": cfg.griffin_lim_iters,
        "per_utt_float64_s": round(t_slow, 3),
        "per_utt_fast_s": round(t_fast, 3),
        "fast_speedup": round(t_slow / t_fast, 2),
        "streaming_ttfa_s": round(ttfa, 3),
        "streaming_total_s": round(t_stream_total, 3),
        "ttfa_vs_full_fast": round(t_fast / ttfa, 2),
        "batch_utts": args.utts,
        "batch_workers": workers,
        "batch_float64_s": round(t_batch_slow, 3),
        "batch_fast_s": round(t_batch_fast, 3),
        "batch_fast_rtf": round(t_batch_fast / (args.utts * audio_secs), 5),
        **dev_stream,
    }, indent=2))


if __name__ == "__main__":
    main()
