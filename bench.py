"""Benchmark: synthesis throughput + training step time, with MFU accounting.

Measures, on whatever accelerator is attached, at the flagship LJSpeech config:

  * synthesis via the length-predictor inference path (the reference's RTF
    surface, inference.py:125-168), counting only VALID (non-padded) mel
    frames -- padded positions are not "produced audio";
  * training step time (batch 32, mel 720, r=2), fwd+bwd+Adam;
  * MFU for both: XLA cost-analysis FLOPs / measured time / chip peak.

Prints ONE JSON line:

    {"metric": "mel_frames_per_sec_per_chip", "value": N, "unit": "frames/s",
     "vs_baseline": R, "synthesis_fps": N, "synthesis_mfu": F,
     "train_ms_per_step": M, "train_mfu": F2, "device": "..."}

``vs_baseline`` is the speed-over-realtime ratio per chip: valid frames/s
divided by the real-time mel frame rate (22050/256 = 86.13 frames of audio
per second). The reference commits no numbers (BASELINE.md), so realtime-rate
is the stable self-measured denominator; a single-GPU reference synthesizing
at RTF ~0.01 corresponds to vs_baseline ~100.

MFU notes: FLOP counts come from XLA's compiled cost model
(``lowered.compile().cost_analysis()``), the algorithmic FLOPs of the graph
XLA actually runs. Peak is the chip's dense bf16 (fp32 on CPU) matmul peak.
This model is tiny by MXU standards (attention_dim 256, 4 heads), so low MFU
means "latency/bandwidth bound at small shapes", not wasted FLOPs.

Timing protocol: on the tunnel-attached TPU, ``block_until_ready`` returns
before device execution completes, so all timed regions here chain n
DEPENDENT steps and end with a scalar host pull; the reported time is the
marginal (t(n_hi)-t(n_lo))/(n_hi-n_lo), which cancels tunnel RTT and
dispatch overhead and survives on honest backends too.
"""

from __future__ import annotations

import json
import time

import jax

from vaenar_tts_tpu.utils.compile_cache import setup_compile_cache
setup_compile_cache()

import jax.numpy as jnp
import numpy as np

# Dense bf16 peak TFLOP/s per chip by device kind substring (public specs).
# CPU fallback is only so bench runs everywhere; MFU is meaningless there.
PEAK_TFLOPS = (
    ("v6", 918.0),  # Trillium / v6e
    ("v5p", 459.0),
    ("v5", 197.0),  # v5e / v5 lite
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 45.0),
)


def device_peak_flops(device=None) -> tuple[str, float]:
    """(device_kind, peak FLOP/s) for the attached accelerator."""
    d = device or jax.devices()[0]
    kind = d.device_kind
    low = kind.lower()
    for key, tf in PEAK_TFLOPS:
        if key in low:
            return kind, tf * 1e12
    return kind, 1e12  # unknown kind: report MFU against 1 TFLOP/s


def compiled_flops(lowered) -> float:
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):  # older jax returns a per-computation list
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def main() -> None:
    import os

    from vaenar_tts_tpu.configs import get_config
    from vaenar_tts_tpu.configs.hparams import tiny_test_config
    from vaenar_tts_tpu.models import VAENAR
    from vaenar_tts_tpu.training.steps import (init_model, make_inference_step,
                                               make_optimizer, make_train_step)

    tiny = os.environ.get("VAENAR_BENCH_TINY") == "1"  # CPU CI smoke mode
    hp = tiny_test_config() if tiny else get_config("ljspeech")
    model = VAENAR(hp)

    BATCH = 2 if tiny else 16
    TEXT_MAX = 32 if tiny else 128
    MEL_MAX = 120 if tiny else 720  # multiple of 60; ~8.4 s audio/utterance
    R = hp.common.final_reduction_factor
    ITERS = 2 if tiny else 50
    TRAIN_BATCH = 2 if tiny else hp.train.train_batch_size  # 32
    TRAIN_ITERS = 2 if tiny else 20

    kind, peak = device_peak_flops()

    params, batch_stats = init_model(hp, model, 0, TEXT_MAX, MEL_MAX)
    # Untrained length-predictor logits are ~0, so sum(exp) predicts ~1 frame
    # per token. Set the projection bias to log(mel_text_len_ratio) so the
    # predicted lengths match the real LJSpeech frames-per-token rate (5.59)
    # and the benchmark sees a realistic valid-frame distribution.
    import flax
    params = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else params
    lp = params["length_predictor"]["projection"]
    lp["bias"] = jnp.full_like(
        lp["bias"], float(np.log(hp.common.mel_text_len_ratio)))

    rng_np = np.random.default_rng(0)
    # ragged text lengths: realistic spread instead of uniform max
    t_lens_np = rng_np.integers(TEXT_MAX // 2, TEXT_MAX + 1,
                                (BATCH,)).astype(np.int32)
    texts_np = rng_np.integers(1, hp.encoder.vocab_size, (BATCH, TEXT_MAX))
    for i, tl in enumerate(t_lens_np):
        texts_np[i, tl:] = 0
    texts = jnp.asarray(texts_np, jnp.int32)
    t_lens = jnp.asarray(t_lens_np)
    key = jax.random.key(0)

    # -- synthesis: length-predictor path, valid frames only ------------------
    # Timing protocol: over the tunnel-attached TPU, block_until_ready
    # returns before device execution completes (measured: programs "finish"
    # at several x the chip's peak FLOP rate), so the loop chains n dependent
    # inference steps inside one jitted fori_loop ending in a scalar that is
    # PULLED to host; the marginal cost (t(n_hi)-t(n_lo))/(n_hi-n_lo)
    # cancels both tunnel RTT and dispatch overhead.
    inference_step = make_inference_step(hp, model)

    mels, pred_lens, _ = inference_step(
        params, batch_stats, texts, t_lens, key,
        reduction_factor=R, max_mel_length=MEL_MAX)  # compile + warm up
    valid_frames_per_iter = int(np.minimum(np.asarray(pred_lens), MEL_MAX).sum())

    @jax.jit
    def chained_synthesis(params, batch_stats, texts, t_lens, n):
        def body(i, acc):
            # acc feeds the fold_in step so iteration i+1's program consumes
            # iteration i's output — a true dependency chain the compiler
            # cannot overlap or hoist (the isnan branch is never taken but
            # is undecidable at compile time)
            step = jnp.where(jnp.isnan(acc), jnp.int32(0), i).astype(jnp.int32)
            mels, _, _ = inference_step(
                params, batch_stats, texts, t_lens,
                jax.random.fold_in(key, step),
                reduction_factor=R, max_mel_length=MEL_MAX)
            return acc + jnp.mean(mels).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    n_lo, n_hi = (1, 2) if tiny else (4, ITERS)
    float(chained_synthesis(params, batch_stats, texts, t_lens, n_hi))
    t = {}
    for n in (n_lo, n_hi):
        reps = []
        for _ in range(2 if tiny else 4):
            t0 = time.perf_counter()
            float(chained_synthesis(params, batch_stats, texts, t_lens, n))
            reps.append(time.perf_counter() - t0)
        t[n] = float(np.median(reps))
    dt = max((t[n_hi] - t[n_lo]) / (n_hi - n_lo), 1e-9)  # s per step

    fps = valid_frames_per_iter / dt
    syn_lowered = inference_step.lower(
        params, batch_stats, texts, t_lens, key,
        reduction_factor=R, max_mel_length=MEL_MAX)
    syn_mfu = compiled_flops(syn_lowered) / dt / peak

    # -- training step ---------------------------------------------------------
    optimizer = make_optimizer(hp)
    opt_state = optimizer.init(params)
    train_step = make_train_step(hp, model, optimizer, donate=False)
    mels_in = jnp.asarray(
        rng_np.standard_normal((TRAIN_BATCH, MEL_MAX, hp.audio.num_mels)) * 0.1,
        jnp.float32)
    tr_texts = jnp.asarray(
        rng_np.integers(1, hp.encoder.vocab_size, (TRAIN_BATCH, TEXT_MAX)),
        jnp.int32)
    tr_tl = jnp.full((TRAIN_BATCH,), TEXT_MAX, jnp.int32)
    tr_ml = jnp.full((TRAIN_BATCH,), MEL_MAX, jnp.int32)
    kw = jnp.float32(1e-5)

    # same pull-synced marginal protocol: train steps already chain through
    # the donated state; pulling a loss scalar after n steps forces the chain
    p, bs, os_ = params, batch_stats, opt_state
    p, bs, os_, m = train_step(p, bs, os_, tr_texts, mels_in, tr_tl, tr_ml,
                               kw, key, reduction_factor=R)
    float(jax.tree_util.tree_leaves(m)[0])

    def run_train(n):
        nonlocal p, bs, os_
        t0 = time.perf_counter()
        for i in range(n):
            p, bs, os_, m = train_step(p, bs, os_, tr_texts, mels_in,
                                       tr_tl, tr_ml, kw,
                                       jax.random.fold_in(key, i),
                                       reduction_factor=R)
        float(jax.tree_util.tree_leaves(m)[0])  # pull: force the whole chain
        return time.perf_counter() - t0

    n_lo, n_hi = (1, 2) if tiny else (4, TRAIN_ITERS)
    run_train(2)  # warm
    t_lo = min(run_train(n_lo) for _ in range(2 if tiny else 3))
    t_hi = min(run_train(n_hi) for _ in range(2 if tiny else 3))
    train_dt = max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)

    tr_lowered = train_step.lower(
        params, batch_stats, opt_state, tr_texts, mels_in, tr_tl, tr_ml,
        kw, key, reduction_factor=R)
    train_mfu = compiled_flops(tr_lowered) / train_dt / peak

    realtime_frame_rate = hp.audio.sample_rate / hp.audio.frame_shift_sample
    print(json.dumps({
        "metric": "mel_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / realtime_frame_rate, 1),
        "synthesis_fps": round(fps, 1),
        "synthesis_mfu": round(syn_mfu, 4),
        "train_ms_per_step": round(train_dt * 1e3, 3),
        "train_mfu": round(train_mfu, 4),
        "device": kind,
    }))


if __name__ == "__main__":
    main()
