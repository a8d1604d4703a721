"""Training-throughput benchmark: LJSpeech-config train steps/sec on the
attached accelerator (batch 32, text 128, mel 720, r=2).

Pull-synced protocol (see bench.py docstring): the tunnel's
block_until_ready returns before execution completes, so each timed region
ends with a float() pull of a loss scalar — the steps chain through donated
state, so pulling the last step's metric forces the whole chain — and the
reported time is the marginal between a short and a long run."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from vaenar_tts_tpu.utils.compile_cache import setup_compile_cache
setup_compile_cache()
import jax.numpy as jnp
import numpy as np
from vaenar_tts_tpu.configs import get_config
from vaenar_tts_tpu.models import VAENAR
from vaenar_tts_tpu.training.steps import (init_model, make_optimizer,
                                           make_train_step)

import argparse
import dataclasses
_a = argparse.ArgumentParser()
_a.add_argument("--batch", type=int, default=32)
_a.add_argument("--mel", type=int, default=720)
_a.add_argument("--remat", default=None, choices=("off", "on", "dots"),
                help="activation-checkpointing policy override (train.remat)")
_ar = _a.parse_args()
B, TT, TM, R = _ar.batch, 128, _ar.mel, 2
hp = get_config("ljspeech")
if _ar.remat is not None:
    hp = hp.replace(train=dataclasses.replace(hp.train, remat=_ar.remat))
model = VAENAR(hp)
params, bs = init_model(hp, model, 0, TT, TM)
optimizer = make_optimizer(hp)
opt_state = optimizer.init(params)
step = make_train_step(hp, model, optimizer)

rng = np.random.default_rng(0)
texts = jnp.asarray(rng.integers(1, 43, (B, TT)), jnp.int32)
mels = jnp.asarray(rng.standard_normal((B, TM, 80)) * 0.1 + 0.5, jnp.float32)
tl = jnp.full((B,), TT, jnp.int32)
ml = jnp.full((B,), TM, jnp.int32)
k = jax.random.key(0)

t0 = time.perf_counter()
p, b, o, m = step(params, bs, opt_state, texts, mels, tl, ml,
                  jnp.float32(1e-5), k, reduction_factor=R)
jax.block_until_ready(m)
print(f"compile+first step: {time.perf_counter()-t0:.1f}s,"
      f" losses {dict((kk, float(v)) for kk, v in m.items())}")

def run(n):
    global p, b, o, m
    t0 = time.perf_counter()
    for i in range(n):
        p, b, o, m = step(p, b, o, texts, mels, tl, ml, jnp.float32(1e-5),
                          jax.random.fold_in(k, i), reduction_factor=R)
    float(m["total"])  # pull: forces the whole chained-state execution
    return time.perf_counter() - t0


run(2)  # warm
N_LO, N_HI = 4, 30
t_lo = min(run(N_LO) for _ in range(3))
t_hi = min(run(N_HI) for _ in range(3))
dt = (t_hi - t_lo) / (N_HI - N_LO)
print(f"train steps/sec: {1/dt:.3f}  ({dt*1e3:.1f} ms/step, batch {B}, "
      f"pull-synced marginal)")
print(f"utterances/sec: {B/dt:.1f}")
