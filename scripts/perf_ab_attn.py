"""Attention-kernel crossover sweep: fused Pallas vs XLA at matched shapes.

Times the raw masked-attention op (forward and forward+backward) across
sequence lengths at a configurable head geometry (default the flagship H=4,
D=64; --heads/--head_dim sweep wider shapes). The crossover feeds
ops/flash_attention.PALLAS_MIN_SCORE_ELEMENTS (the "auto" policy) and the
README "Measured" table. Run on the real chip.

MEASUREMENT PROTOCOL (matters on this hardware): over the tunnel-attached
TPU, ``block_until_ready`` returns before device execution completes, so
naive per-call timings measure dispatch, not compute (measured: a 58-GFLOP
program "completing" in 0.05 ms = 5x the chip's peak). The honest protocol
used here chains n dependent invocations inside ONE jitted fori_loop ending
in a scalar that is pulled to host, and reports the marginal cost
(t(n_hi) - t(n_lo)) / (n_hi - n_lo), which cancels both the tunnel RTT and
the dispatch overhead. ``--sync block`` keeps the old per-call mode for
comparison on directly-attached hardware.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

from vaenar_tts_tpu.utils.compile_cache import setup_compile_cache
setup_compile_cache()

import jax.numpy as jnp
import numpy as np

from vaenar_tts_tpu.models.attention import attention_mask, masked_attention_xla
from vaenar_tts_tpu.ops.flash_attention import masked_flash_attention

_ap = argparse.ArgumentParser()
_ap.add_argument("--batch", type=int, default=16)
_ap.add_argument("--heads", type=int, default=4)
_ap.add_argument("--head_dim", type=int, default=64)
_ap.add_argument("--reps", type=int, default=5,
                 help="repetitions per (shape, kernel, chain length)")
_ap.add_argument("--chain", type=int, nargs=2, default=[2, 12],
                 metavar=("N_LO", "N_HI"),
                 help="chain lengths for the marginal-cost protocol")
_ap.add_argument("--seqs", type=int, nargs="*",
                 default=[512, 1024, 2048, 4096])
_ap.add_argument("--sync", choices=["pull", "block"], default="pull")
_args = _ap.parse_args()
B, H, D = _args.batch, _args.heads, _args.head_dim
SCALE = 1.0 / np.sqrt(D)


def xla_op(q, k, v, ql, causal=True):
    mask = attention_mask(ql, ql, q.shape[0], q.shape[2], k.shape[2], causal)
    out, _ = masked_attention_xla(q, k, v, mask, SCALE)
    return out


def fused_op(q, k, v, ql, causal=True):
    return masked_flash_attention(q, k, v, ql, ql, SCALE, causal)


def bench_pull(fn, q, k, v, ql, grad: bool):
    """Marginal ms/call via chained dependent invocations + scalar pull."""
    if grad:
        def one(q_, k_, v_):
            g = jax.grad(lambda a, b, c: jnp.sum(fn(a, b, c, ql) ** 2),
                         argnums=(0, 1, 2))(q_, k_, v_)
            return jnp.mean(g[0]).astype(jnp.float32)
    else:
        def one(q_, k_, v_):
            return jnp.mean(fn(q_, k_, v_, ql)).astype(jnp.float32)

    @jax.jit
    def chained(q_, k_, v_, n):
        def body(i, acc):
            # acc feeds back so iterations are data-dependent (no overlap)
            return one(q_ + (acc * 1e-6).astype(q_.dtype), k_, v_)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    n_lo, n_hi = _args.chain
    float(chained(q, k, v, n_hi))  # compile + warm
    t = {}
    for n in (n_lo, n_hi):
        reps = []
        for _ in range(_args.reps):
            t0 = time.perf_counter()
            float(chained(q, k, v, n))
            reps.append(time.perf_counter() - t0)
        t[n] = float(np.median(reps))
    return (t[n_hi] - t[n_lo]) / (n_hi - n_lo) * 1e3


def bench_block(fn, q, k, v, ql, grad: bool):
    """Per-call block_until_ready timing (only honest on direct-attached
    hardware)."""
    if grad:
        f = jax.jit(jax.grad(lambda a, b, c: jnp.sum(fn(a, b, c, ql) ** 2),
                             argnums=(0, 1, 2)))
    else:
        f = jax.jit(lambda a, b, c: fn(a, b, c, ql))
    jax.block_until_ready(f(q, k, v))
    reps = []
    for _ in range(max(_args.reps, 20)):
        t0 = time.perf_counter()
        jax.block_until_ready(f(q, k, v))
        reps.append(time.perf_counter() - t0)
    return float(np.median(reps)) * 1e3


def main():
    rng = np.random.default_rng(0)
    bench = bench_pull if _args.sync == "pull" else bench_block
    suffix = (" (marginal over chained calls)" if _args.sync == "pull"
              else " (per-call block timing)")
    print(f"B={B} H={H} D={D}, bf16, causal, sync={_args.sync}{suffix}")
    print(f"{'T':>6} {'mode':>8} {'xla ms':>9} {'pallas ms':>10} {'speedup':>8}")
    rows = []
    for T in _args.seqs:
        q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
        ql = jnp.asarray(rng.integers(T // 2, T + 1, (B,)), jnp.int32)
        for grad in (False, True):
            med = {}
            for name, fn in (("xla", xla_op), ("pallas", fused_op)):
                try:
                    med[name] = bench(fn, q, k, v, ql, grad)
                except Exception as e:  # e.g. XLA bwd OOM at 4096^2
                    print(f"{T:>6} {'fwd+bwd' if grad else 'fwd':>8} "
                          f"{name}: FAILED ({type(e).__name__})")
                    med[name] = float("nan")
            mode = "fwd+bwd" if grad else "fwd"
            rows.append(dict(T=T, mode=mode, xla_ms=med["xla"],
                             pallas_ms=med["pallas"],
                             speedup=med["xla"] / med["pallas"]))
            print(f"{T:>6} {mode:>8} {med['xla']:>9.3f} "
                  f"{med['pallas']:>10.3f} "
                  f"{med['xla'] / med['pallas']:>8.2f}x")
    path = f"/tmp/attn_ab_h{H}d{D}_{_args.sync}.json"
    with open(path, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
