"""A/B harness: full-model synthesis latency across attention-kernel and
dtype variants, interleaved to cancel tunnel drift. Run on the real chip.

WARNING: per-call block_until_ready timings — on the tunnel-attached TPU
these measure dispatch, not device compute (block returns before execution
completes), so deltas here understate real differences. For honest numbers
use the chained+pull marginal protocol (scripts/perf_ab_attn.py --sync pull,
bench.py)."""
import dataclasses, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/vaenar_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np
from vaenar_tts_tpu.configs import get_config
from vaenar_tts_tpu.models import VAENAR
from vaenar_tts_tpu.training.steps import init_model, make_test_step

B, TT, TM, R = 16, 128, 720, 2
rng = np.random.default_rng(0)
texts = jnp.asarray(rng.integers(1, 43, (B, TT)), jnp.int32)
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
    step = make_test_step(hp, model)
    m, _ = step(params, bs, texts, tl, ml, k0, reduction_factor=R,
                max_mel_length=TM)
    m.block_until_ready()
    variants[name] = (step, params, bs)

times = {n: [] for n in variants}
for i in range(30):
    for n, (step, params, bs) in variants.items():
        t0 = time.perf_counter()
        m, _ = step(params, bs, texts, tl, ml, jax.random.fold_in(k0, i),
                    reduction_factor=R, max_mel_length=TM)
        m.block_until_ready()
        times[n].append(time.perf_counter() - t0)
for n, ts in times.items():
    ts = np.array(ts)
    print(f"{n:8s} median {np.median(ts)*1e3:7.3f} ms  "
          f"p10 {np.percentile(ts,10)*1e3:7.3f}  frames/s "
          f"{B*TM/np.median(ts):,.0f}")
