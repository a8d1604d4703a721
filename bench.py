"""Benchmark: mel-synthesis throughput on the flagship LJSpeech config.

Measures mel frames/sec/chip for batched flow-prior sampling + NAR decoding
(the reference's RTF surface, inference.py:148-168) on whatever accelerator
is attached. Prints ONE JSON line:

    {"metric": "mel_frames_per_sec_per_chip", "value": N, "unit": "frames/s",
     "vs_baseline": R}

``vs_baseline`` is the speed-over-realtime ratio per chip: value divided by
the real-time mel frame rate (sample_rate / frame_shift = 22050/256 = 86.13
frames of audio per second). The reference commits no numbers (BASELINE.md),
so realtime-rate is the stable self-measured denominator; a single-GPU
reference synthesizing at RTF ~0.01 corresponds to vs_baseline ~100.
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/vaenar_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np


def main() -> None:
    from vaenar_tts_tpu.configs import get_config
    from vaenar_tts_tpu.models import VAENAR
    from vaenar_tts_tpu.training.steps import init_model, make_test_step

    hp = get_config("ljspeech")
    model = VAENAR(hp)

    BATCH = 16
    TEXT_MAX = 128
    MEL_MAX = 720  # multiple of 60; ~8.4 s of audio per utterance
    R = hp.common.final_reduction_factor
    ITERS = 50

    params, batch_stats = init_model(hp, model, 0, TEXT_MAX, MEL_MAX)
    rng_np = np.random.default_rng(0)
    texts = jnp.asarray(
        rng_np.integers(1, hp.encoder.vocab_size, (BATCH, TEXT_MAX)),
        jnp.int32)
    t_lens = jnp.full((BATCH,), TEXT_MAX, jnp.int32)
    m_lens = jnp.full((BATCH,), MEL_MAX, jnp.int32)
    key = jax.random.key(0)

    test_step = make_test_step(hp, model)

    def run(k):
        mels, _ = test_step(params, batch_stats, texts, t_lens, m_lens, k,
                            reduction_factor=R, max_mel_length=MEL_MAX)
        return mels

    # compile + warm up
    out = run(key)
    out.block_until_ready()

    t0 = time.perf_counter()
    for i in range(ITERS):
        out = run(jax.random.fold_in(key, i))
    out.block_until_ready()
    dt = time.perf_counter() - t0

    frames = BATCH * MEL_MAX * ITERS
    fps = frames / dt
    realtime_frame_rate = hp.audio.sample_rate / hp.audio.frame_shift_sample
    print(json.dumps({
        "metric": "mel_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / realtime_frame_rate, 1),
    }))


if __name__ == "__main__":
    main()
