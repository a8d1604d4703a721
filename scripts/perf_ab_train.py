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


def measure(hp, B, TT, TM, R, lo=4, hi=30, reps=3, copts=None):
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

    if copts:
        # XLA_FLAGS can't reach the remote compiler here (the tunnel
        # client's host-side parser rejects TPU flags as unknown, fatally);
        # PJRT compiler_options on an AOT compile are forwarded instead
        lowered = step.lower(*state, texts, mels, tl, ml, jnp.float32(1e-5),
                             k, reduction_factor=R)
        compiled = lowered.compile(compiler_options=copts)

        def call(i):
            return compiled(*state, texts, mels, tl, ml, jnp.float32(1e-5),
                            jax.random.fold_in(k, i))
    else:
        def call(i):
            return step(*state, texts, mels, tl, ml, jnp.float32(1e-5),
                        jax.random.fold_in(k, i), reduction_factor=R)

    def run(n):
        t0 = time.perf_counter()
        m = None
        for i in range(n):
            state[0], state[1], state[2], m = call(i)
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
    ap.add_argument("--text", type=int, default=128)
    ap.add_argument("--reduction", type=int, default=2)
    ap.add_argument("--modes", nargs="*", default=["xla", "pallas"],
                    choices=["xla", "pallas", "auto"])
    ap.add_argument("--chain", type=int, nargs=2, default=[4, 30],
                    metavar=("N_LO", "N_HI"),
                    help="marginal-protocol chain lengths (drop for "
                         "long-form shapes where 30 steps is minutes)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--remat", default=None, choices=("off", "on", "dots"))
    ap.add_argument("--compute_dtype", default=None,
                    choices=("bfloat16", "float32"),
                    help="override hp.train.compute_dtype for the A/B: the "
                         "synthesis-side dtype A/B measured fp32 1.7x faster "
                         "than bf16 at short shapes (README), so the "
                         "fp32-vs-bf16 cast traffic around the fp32 flow is "
                         "a train-MFU suspect (VERDICT r3 #3)")
    ap.add_argument("--batched_lu", default=None, choices=("on", "off"),
                    help="override hp.prior.batched_lu: one batched "
                         "lu_factor for the invertible-linear stack (on, "
                         "the default) vs per-layer inv/slogdet custom "
                         "calls (off) — suspect for the r4 29.5->34 ms "
                         "bench train-step regression")
    ap.add_argument("--compiler_options", default=None,
                    help="comma list k=v forwarded as PJRT compiler options "
                         "on an AOT compile (the XLA_FLAGS env route dies "
                         "in this client's host-side flag parser), e.g. "
                         "xla_tpu_enable_latency_hiding_scheduler=true")
    ap.add_argument("--grad_accum", type=int, default=1,
                    help="micro-batch the step (hp.train.grad_accum): "
                         "batch/N per micro-step, averaged grads, one Adam "
                         "update — the mitigation for the HBM-bandwidth "
                         "batch-scaling wall past batch 32 (README)")
    args = ap.parse_args()
    base = get_config("ljspeech")
    if args.remat is not None:
        base = base.replace(train=dataclasses.replace(base.train,
                                                      remat=args.remat))
    if args.grad_accum != 1:
        base = base.replace(train=dataclasses.replace(
            base.train, grad_accum=args.grad_accum))
    if args.compute_dtype is not None:
        base = base.replace(train=dataclasses.replace(
            base.train, compute_dtype=args.compute_dtype))
    if args.batched_lu is not None:
        base = base.replace(prior=dataclasses.replace(
            base.prior, batched_lu=args.batched_lu == "on"))
    knob_of = {"xla": "off", "pallas": True, "auto": "auto"}
    for name in args.modes:
        hp = base.replace(train=dataclasses.replace(
            base.train, use_pallas_attention=knob_of[name]))
        copts = None
        if args.compiler_options:
            copts = dict(kv.split("=", 1)
                         for kv in args.compiler_options.split(","))
        dt = measure(hp, args.batch, args.text, args.mel, args.reduction,
                     lo=args.chain[0], hi=args.chain[1], reps=args.reps,
                     copts=copts)
        acc = f", accum {args.grad_accum}" if args.grad_accum != 1 else ""
        print(f"{name:8s} {dt * 1e3:8.1f} ms/step  "
              f"{args.batch / dt:,.1f} utt/s  (batch {args.batch} "
              f"x {args.mel} frames, r={args.reduction}{acc}, fwd+bwd+Adam)",
              flush=True)


if __name__ == "__main__":
    main()
