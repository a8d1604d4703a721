"""Model-level long-form synthesis A/B: auto kernel selection vs forced XLA.

Ties the raw attention-kernel crossover (perf_ab_attn.py) to the actual
model: synthesizes long utterances (default batch 4 x 4096 mel frames,
~47 s audio each, r=2 -> decoder/coupling attention at 2048^2 score
elements, past the 640^2 auto threshold) with use_pallas_attention="off" vs
"auto", using the pull-synced chained-marginal protocol (see bench.py).

Measured (v5e, tunnel): off 14.1 ms/step vs auto 8.8 ms/step = 1.60x
end-to-end, and the fused path compiled in 24 s vs 462 s (XLA's T^2
attention dominates compile time at these shapes too).
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

from vaenar_tts_tpu.utils.compile_cache import setup_compile_cache
setup_compile_cache()

import jax.numpy as jnp
import numpy as np

from vaenar_tts_tpu.configs import get_config
from vaenar_tts_tpu.models import VAENAR
from vaenar_tts_tpu.training.steps import init_model, make_test_step

B, TT, TM, R = 4, 512, 4096, 2

def main():
    base = get_config("ljspeech")
    rng_np = np.random.default_rng(0)
    texts = jnp.asarray(rng_np.integers(1, 43, (B, TT)), jnp.int32)
    tl = jnp.full((B,), TT, jnp.int32)
    ml = jnp.full((B,), TM, jnp.int32)
    key = jax.random.key(0)

    for knob in ("off", "auto"):
        hp = base.replace(train=dataclasses.replace(
            base.train, use_pallas_attention=knob))
        model = VAENAR(hp)
        params, bs = init_model(hp, model, 0, TT, TM)
        step = make_test_step(hp, model)

        @jax.jit
        def chained(params, bs, n):
            def body(i, acc):
                s = jnp.where(jnp.isnan(acc), jnp.int32(0), i).astype(jnp.int32)
                mels, _ = step(params, bs, texts, tl, ml,
                               jax.random.fold_in(key, s),
                               reduction_factor=R, max_mel_length=TM,
                               temperature=0.7)
                return acc + jnp.mean(mels).astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        t0 = time.perf_counter()
        float(chained(params, bs, 1))
        print(f"{knob}: compile+first {time.perf_counter() - t0:.0f}s")
        t = {}
        for n in (1, 7):
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(chained(params, bs, n))
                reps.append(time.perf_counter() - t0)
            t[n] = float(np.median(reps))
        per = (t[7] - t[1]) / 6
        print(f"{knob}: {per * 1e3:.1f} ms/step (batch {B} x {TM} frames) "
              f"= {B * TM / per / 1e6:.2f}M frames/s")


if __name__ == "__main__":
    main()
