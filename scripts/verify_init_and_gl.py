"""Sanity at LJ scale: (a) data-dependent flow init drops the initial KL by
orders of magnitude; (b) on-device Griffin-Lim throughput vs host NumPy."""
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
                                           make_train_step,
                                           run_data_dependent_init)

hp = get_config("ljspeech")
model = VAENAR(hp)
B, TT, TM = 32, 128, 720
params, bs = init_model(hp, model, 0, TT, TM)
rng = np.random.default_rng(0)
texts = jnp.asarray(rng.integers(1, 43, (B, TT)), jnp.int32)
mels = jnp.asarray(rng.standard_normal((B, TM, 80)) * 0.15 + 0.4, jnp.float32)
tl = jnp.full((B,), TT, jnp.int32)
ml = jnp.full((B,), TM, jnp.int32)

optimizer = make_optimizer(hp)
step = make_train_step(hp, model, optimizer, donate=False)

def kl_of(p):
    o = optimizer.init(p)
    _, _, _, m = step(p, bs, o, texts, mels, tl, ml, jnp.float32(1e-5),
                      jax.random.key(0), reduction_factor=5)
    return float(m["kl"]), float(m["mel_l2"])

kl0, l20 = kl_of(params)
p2 = run_data_dependent_init(hp, model, params, bs, texts, tl, ml,
                             max_mel_length=TM)
kl1, l21 = kl_of(p2)
print(f"kl before init: {kl0:.1f}, after data-dependent init: {kl1:.1f}")

# Griffin-Lim: device vs host
from vaenar_tts_tpu.ops.griffin_lim import mel_to_wav_jax
from vaenar_tts_tpu.audio.dsp import AudioProcessor
mel_batch = jnp.asarray(np.clip(rng.standard_normal((8, TM, 80))*0.2+0.4, 0, 1),
                        jnp.float32)
f = jax.jit(lambda m, k: mel_to_wav_jax(m, hp.audio, k))
w = f(mel_batch, jax.random.key(0)); w.block_until_ready()
t0 = time.perf_counter()
for i in range(3):
    w = f(mel_batch, jax.random.key(i))
w.block_until_ready()
dev = (time.perf_counter() - t0) / 3
ap = AudioProcessor(hp.audio)
t0 = time.perf_counter()
ap.inv_mel_spectrogram(np.asarray(mel_batch[0]).T, np.random.default_rng(0))
host = time.perf_counter() - t0
audio_secs = 8 * TM * hp.audio.frame_shift_sample / hp.audio.sample_rate
print(f"griffin-lim device: {dev*1e3:.0f} ms / batch-8 ({audio_secs/dev:.0f}x"
      f" realtime); host numpy: {host*1e3:.0f} ms / single utt "
      f"(speedup ~{host*8/dev:.0f}x)")
