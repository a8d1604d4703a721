"""Training-throughput benchmark: LJSpeech-config train steps/sec on the
attached accelerator (batch 32, text 128, mel 720, r=2)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/vaenar_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np
from vaenar_tts_tpu.configs import get_config
from vaenar_tts_tpu.models import VAENAR
from vaenar_tts_tpu.training.steps import (init_model, make_optimizer,
                                           make_train_step)

B, TT, TM, R = 32, 128, 720, 2
hp = get_config("ljspeech")
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

N = 30
t0 = time.perf_counter()
for i in range(N):
    p, b, o, m = step(p, b, o, texts, mels, tl, ml, jnp.float32(1e-5),
                      jax.random.fold_in(k, i), reduction_factor=R)
jax.block_until_ready(m)
dt = time.perf_counter() - t0
print(f"train steps/sec: {N/dt:.3f}  ({dt/N*1e3:.1f} ms/step, batch {B})")
print(f"utterances/sec: {N*B/dt:.1f}")
