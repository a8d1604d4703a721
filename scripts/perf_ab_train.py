"""Train-step A/B: Pallas vs XLA attention, pull-synced.

Train steps already chain through donated state, so the honest protocol is a
short and a long run of real steps each ending in a pulled loss scalar, with
the marginal reported (see bench.py docstring for why block_until_ready
timings are not trustworthy over the tunnel).

    python scripts/perf_ab_train.py [--batch 32] [--mel 720]
"""
import argparse
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
from vaenar_tts_tpu.training.steps import (init_model, make_optimizer,
                                           make_train_step)


def measure(hp, B, TT, TM, R, lo=4, hi=30, reps=3):
    model = VAENAR(hp)
    params, bs = init_model(hp, model, 0, TT, TM)
    optimizer = make_optimizer(hp)
    opt_state = optimizer.init(params)
    step = make_train_step(hp, model, optimizer)
    rng = np.random.default_rng(0)
    texts = jnp.asarray(rng.integers(1, 43, (B, TT)), jnp.int32)
    mels = jnp.asarray(rng.standard_normal((B, TM, 80)) * 0.1 + 0.5,
                       jnp.float32)
    tl = jnp.full((B,), TT, jnp.int32)
    ml = jnp.full((B,), TM, jnp.int32)
    k = jax.random.key(0)
    state = [params, bs, opt_state]

    def run(n):
        t0 = time.perf_counter()
        m = None
        for i in range(n):
            state[0], state[1], state[2], m = step(
                *state, texts, mels, tl, ml, jnp.float32(1e-5),
                jax.random.fold_in(k, i), reduction_factor=R)
        float(m["total"])  # pull: forces the whole chained-state execution
        return time.perf_counter() - t0

    run(2)  # compile + warm
    t_lo = min(run(lo) for _ in range(reps))
    t_hi = min(run(hi) for _ in range(reps))
    return (t_hi - t_lo) / (hi - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--mel", type=int, default=720)
    args = ap.parse_args()
    base = get_config("ljspeech")
    for name, knob in (("xla", "off"), ("pallas", True)):
        hp = base.replace(train=dataclasses.replace(
            base.train, use_pallas_attention=knob))
        dt = measure(hp, args.batch, 128, args.mel, 2)
        print(f"{name:8s} {dt * 1e3:8.1f} ms/step  "
              f"{args.batch / dt:,.1f} utt/s  (batch {args.batch} "
              f"x {args.mel} frames, fwd+bwd+Adam)")


if __name__ == "__main__":
    main()
