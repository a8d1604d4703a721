"""Full-model synthesis A/B across attention-kernel and dtype variants.

Pull-synced chained-marginal protocol (see bench.py: block_until_ready over
the tunnel returns before execution completes, so each variant is timed as
the marginal cost of extra dependent iterations inside one jitted fori_loop
ending in a pulled scalar).

    python scripts/perf_ab.py [--mel 720] [--batch 16]
        [--variants kernel dtype]

``kernel`` A/Bs use_pallas_attention off/on at the given shape; ``dtype``
A/Bs compute_dtype bfloat16/float32. At the shipped shape (mel 720, r=2 ->
360-frame attention) XLA wins the kernel A/B — the flash kernels win from
~768-frame attention, see perf_longform.py / perf_ab_attn.py.
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
from vaenar_tts_tpu.training.steps import init_model, make_test_step


def measure(hp, texts, tl, ml, TM, R, chain=(2, 12), reps=4):
    model = VAENAR(hp)
    params, bs = init_model(hp, model, 0, texts.shape[1], TM)
    step = make_test_step(hp, model)
    key = jax.random.key(0)

    @jax.jit
    def chained(params, bs, n):
        def body(i, acc):
            s = jnp.where(jnp.isnan(acc), jnp.int32(0), i).astype(jnp.int32)
            mels, _ = step(params, bs, texts, tl, ml,
                           jax.random.fold_in(key, s), reduction_factor=R,
                           max_mel_length=TM, temperature=0.7)
            return acc + jnp.mean(mels).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    n_lo, n_hi = chain
    float(chained(params, bs, n_hi))  # compile + warm (pull = real sync)
    t = {}
    for n in (n_lo, n_hi):
        r = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chained(params, bs, n))
            r.append(time.perf_counter() - t0)
        t[n] = float(np.median(r))
    return (t[n_hi] - t[n_lo]) / (n_hi - n_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--mel", type=int, default=720)
    ap.add_argument("--variants", nargs="*", default=["kernel", "dtype"])
    args = ap.parse_args()
    B, TT, TM, R = args.batch, 128, args.mel, 2
    rng = np.random.default_rng(0)
    texts = jnp.asarray(rng.integers(1, 43, (B, TT)), jnp.int32)
    tl = jnp.full((B,), TT, jnp.int32)
    ml = jnp.full((B,), TM, jnp.int32)
    base = get_config("ljspeech")

    runs = []
    if "kernel" in args.variants:
        runs += [("kernel=off", dict(use_pallas_attention="off")),
                 ("kernel=on", dict(use_pallas_attention=True))]
    if "dtype" in args.variants:
        runs += [("dtype=bf16", dict(compute_dtype="bfloat16")),
                 ("dtype=fp32", dict(compute_dtype="float32"))]
    for name, over in runs:
        hp = base.replace(train=dataclasses.replace(base.train, **over))
        dt = measure(hp, texts, tl, ml, TM, R)
        print(f"{name:12s} {dt * 1e3:8.3f} ms/step  "
              f"{B * TM / dt:,.0f} frames/s  (batch {B} x {TM} frames)")


if __name__ == "__main__":
    main()
