import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/vaenar_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
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
    return float(m["kl"])
kl0 = kl_of(params)
p2 = run_data_dependent_init(hp, model, params, bs, texts, tl, ml,
                             max_mel_length=TM)
kl1 = kl_of(p2)
print(f"RESULT kl before init: {kl0:.1f}, after data-dependent init: {kl1:.1f}")
