"""XLA cost analysis of the jitted train/synthesis steps: FLOPs, HBM bytes,
and arithmetic intensity at the flagship config."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from vaenar_tts_tpu.utils.compile_cache import setup_compile_cache
setup_compile_cache()
import jax.numpy as jnp
import numpy as np
from vaenar_tts_tpu.configs import get_config
from vaenar_tts_tpu.models import VAENAR
from vaenar_tts_tpu.training.steps import (init_model, make_optimizer,
                                           make_train_step, make_test_step)

import argparse
_a = argparse.ArgumentParser()
_a.add_argument("--train_ms", type=float, default=29.5,
                help="measured pull-synced train step ms (README table)")
_a.add_argument("--syn_ms", type=float, default=3.7,
                help="measured pull-synced synthesis step ms")
_ar = _a.parse_args()
B, TT, TM, R = 32, 128, 720, 2
hp = get_config("ljspeech")
model = VAENAR(hp)
params, bs = init_model(hp, model, 0, TT, TM)
opt = make_optimizer(hp)
ostate = opt.init(params)
rng = np.random.default_rng(0)
texts = jnp.asarray(rng.integers(1, 43, (B, TT)), jnp.int32)
mels = jnp.asarray(rng.standard_normal((B, TM, 80)) * 0.1, jnp.float32)
tl = jnp.full((B,), TT, jnp.int32)
ml = jnp.full((B,), TM, jnp.int32)
k = jax.random.key(0)

train_step = make_train_step(hp, model, opt, donate=False)
# lower the jitted step itself: hits the persistent compile cache
lowered = train_step.lower(params, bs, ostate, texts, mels, tl, ml,
                           jnp.float32(1e-5), k, reduction_factor=R)
ca = lowered.compile().cost_analysis()
def fmt(ca, secs):
    fl = ca.get("flops", 0.0); by = ca.get("bytes accessed", 0.0)
    print(f"  flops/step: {fl/1e9:.1f} GFLOP   hbm bytes: {by/1e6:.0f} MB   "
          f"intensity: {fl/max(by,1):.0f} flop/B")
    print(f"  at measured {secs*1e3:.1f} ms -> {fl/secs/1e12:.1f} TFLOP/s, "
          f"{by/secs/1e9:.0f} GB/s")
print("train step (batch 32, mel 720, r=2):")
fmt(ca, _ar.train_ms / 1e3)

test_step = make_test_step(hp, model)
B2 = 16
texts2 = texts[:B2]; tl2 = tl[:B2]; ml2 = ml[:B2]
lowered = test_step.lower(params, bs, texts2, tl2, ml2, k,
                          reduction_factor=R, max_mel_length=TM)
ca2 = lowered.compile().cost_analysis()
print("synthesis step (batch 16, mel 720, r=2):")
fmt(ca2, _ar.syn_ms / 1e3)
