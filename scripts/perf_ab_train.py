"""Interleaved A/B: train-step latency, Pallas vs XLA attention.

WARNING: per-call block_until_ready timings — on the tunnel-attached TPU
these measure dispatch, not device compute (block returns before execution
completes), so deltas here understate real differences. For honest numbers
use the chained+pull marginal protocol (scripts/perf_ab_attn.py --sync pull,
bench.py)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/vaenar_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np
import dataclasses
from vaenar_tts_tpu.configs import get_config
from vaenar_tts_tpu.models import VAENAR
from vaenar_tts_tpu.training.steps import (init_model, make_optimizer,
                                           make_train_step)

B, TT, TM, R = 32, 128, 720, 2
rng = np.random.default_rng(0)
texts = jnp.asarray(rng.integers(1, 43, (B, TT)), jnp.int32)
mels = jnp.asarray(rng.standard_normal((B, TM, 80)) * 0.1 + 0.5, jnp.float32)
tl = jnp.full((B,), TT, jnp.int32)
ml = jnp.full((B,), TM, jnp.int32)
k0 = jax.random.key(0)

variants = {}
for name, pallas in [("pallas", True), ("xla", False)]:
    hp = get_config("ljspeech")
    hp = hp.replace(train=dataclasses.replace(hp.train,
                                              use_pallas_attention=pallas))
    model = VAENAR(hp)
    params, bs = init_model(hp, model, 0, TT, TM)
    opt = make_optimizer(hp)
    ostate = opt.init(params)
    step = make_train_step(hp, model, opt, donate=False)
    _, _, _, m = step(params, bs, ostate, texts, mels, tl, ml,
                      jnp.float32(1e-5), k0, reduction_factor=R)
    jax.block_until_ready(m)
    variants[name] = (step, params, bs, ostate)

times = {n: [] for n in variants}
for i in range(15):
    for n, (step, params, bs, ostate) in variants.items():
        t0 = time.perf_counter()
        _, _, _, m = step(params, bs, ostate, texts, mels, tl, ml,
                          jnp.float32(1e-5), jax.random.fold_in(k0, i),
                          reduction_factor=R)
        jax.block_until_ready(m)
        times[n].append(time.perf_counter() - t0)
for n, ts in times.items():
    ts = np.array(ts)
    print(f"{n:8s} median {np.median(ts)*1e3:7.2f} ms/step  "
          f"steps/s {1/np.median(ts):6.2f}")
