"""Attention-kernel crossover sweep: fused Pallas vs XLA at matched shapes.

Times the raw masked-attention op (forward and forward+backward) across
sequence lengths at a configurable head geometry (default the flagship H=4,
D=64; --heads/--head_dim sweep wider shapes), interleaving
variants to cancel tunnel drift. The crossover feeds
ops/flash_attention.PALLAS_MIN_SCORE_ELEMENTS (the "auto" policy) and the
README "Measured" table. Run on the real chip.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/vaenar_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from vaenar_tts_tpu.models.attention import attention_mask, masked_attention_xla
from vaenar_tts_tpu.ops.flash_attention import masked_flash_attention

import argparse

_ap = argparse.ArgumentParser()
_ap.add_argument("--batch", type=int, default=16)
_ap.add_argument("--heads", type=int, default=4)
_ap.add_argument("--head_dim", type=int, default=64)
_ap.add_argument("--iters", type=int, default=30)
_ap.add_argument("--seqs", type=int, nargs="*",
                 default=[128, 256, 512, 1024, 2048, 4096])
_args = _ap.parse_args()
B, H, D = _args.batch, _args.heads, _args.head_dim
SCALE = 1.0 / np.sqrt(D)
ITERS = _args.iters


def xla_op(q, k, v, ql, ml, causal):
    mask = attention_mask(ql, ml, q.shape[0], q.shape[2], k.shape[2], causal)
    out, _ = masked_attention_xla(q, k, v, mask, SCALE)
    return out


def fused_op(q, k, v, ql, ml, causal):
    return masked_flash_attention(q, k, v, ql, ml, SCALE, causal)


def bench(fn, args, grad: bool):
    if grad:
        f = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
            fn(q, k, v, *args[3:]) ** 2), argnums=(0, 1, 2)))
    else:
        f = jax.jit(lambda q, k, v: fn(q, k, v, *args[3:]))
    out = f(*args[:3])
    jax.block_until_ready(out)

    def run():
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args[:3]))
        return time.perf_counter() - t0
    return f, run


def main():
    rng = np.random.default_rng(0)
    print(f"B={B} H={H} D={D}, dtype=bfloat16, causal self-attention shapes")
    print(f"{'T':>6} {'mode':>8} {'xla ms':>9} {'pallas ms':>10} {'speedup':>8}")
    rows = []
    for T in _args.seqs:
        q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
        ql = jnp.asarray(rng.integers(T // 2, T + 1, (B,)), jnp.int32)
        args = (q, k, v, ql, ql, True)
        for grad in (False, True):
            runs = {}
            for name, fn in (("xla", xla_op), ("pallas", fused_op)):
                runs[name] = bench(functools.partial(fn, causal=True),
                                   args[:5], grad)[1]
            ts = {n: [] for n in runs}
            for _ in range(ITERS):
                for n, r in runs.items():
                    ts[n].append(r())
            med = {n: float(np.median(v_) * 1e3) for n, v_ in ts.items()}
            mode = "fwd+bwd" if grad else "fwd"
            rows.append((T, mode, med["xla"], med["pallas"],
                         med["xla"] / med["pallas"]))
            print(f"{T:>6} {mode:>8} {med['xla']:>9.3f} "
                  f"{med['pallas']:>10.3f} {med['xla']/med['pallas']:>8.2f}x")
    import json
    out = [dict(T=t, mode=m, xla_ms=x, pallas_ms=p, speedup=s)
           for t, m, x, p, s in rows]
    path = f"/tmp/attn_ab_h{H}d{D}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
