"""Bisect the tunnel-attached-TPU Griffin-Lim fault to a primitive.

Round-2 status: the full device GL program (ops/griffin_lim.py) faults the
tunnel-attached chip and wedges it for ~20-30 min (CLAUDE.md), so every
shipped vocoder number used the host path. This harness decomposes the GL
program into a suspicion-ordered ladder of sub-programs and runs each in a
FRESH SUBPROCESS against the real device with a hard timeout, so a fault
kills only the probe, not the caller. It stops at the first fault by default
(the chip needs ~20-30 min to recover; continuing immediately would produce
garbage "faults" for every later probe).

Probe ladder (each adds one suspect primitive):
  health          tiny matmul + float() pull (chip-alive baseline)
  synthesis_mm    iSTFT synthesis einsum (spectra -> windowed frames)
  ola_concat      scatter-free overlap-add (pad/concat/add only)
  ola_sliceadd    overlap-add via k shifted .at[].add (dynamic-update-slice)
  istft_concat    full _istft_ola, concat mode (adds the wss divide)
  istft_sliceadd  full _istft_ola, sliceadd mode
  reanalysis      istft_concat -> batched_stft_ri round trip (one GL body)
  gl2_concat      griffin_lim_jax, 2 iterations, concat OLA (adds fori_loop)
  gl2_sliceadd    griffin_lim_jax, 2 iterations, sliceadd OLA
  gl60_concat     full 60-iteration GL, concat OLA (the production program)
  mel2wav_concat  mel_to_wav_jax end to end, concat OLA

Usage:
  python scripts/bisect_device_gl.py                 # ladder, stop on fault
  python scripts/bisect_device_gl.py --probe gl60_concat
  python scripts/bisect_device_gl.py --continue-after-fault --recovery-wait 1500

Results land in VOCODER_BISECT.json. The sync protocol follows CLAUDE.md:
never trust block_until_ready over the tunnel; every probe ends by float()-
pulling a scalar reduction of its output.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PREAMBLE = r"""
import sys, time
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
from vaenar_tts_tpu.configs import get_config
from vaenar_tts_tpu.ops.griffin_lim import (
    _idft_filters, _istft_ola, _overlap_add_concat, _overlap_add_sliceadd,
    _window_sumsquare, griffin_lim_jax, mel_to_wav_jax)
from vaenar_tts_tpu.ops.stft import batched_stft_ri

cfg = get_config("ljspeech").audio
n_fft, hop, win = cfg.n_fft, cfg.frame_shift_sample, cfg.frame_length_sample
n_bins = 1 + n_fft // 2
B, F = 2, 120
key = jax.random.key(0)
t0 = time.time()
"""

EPILOGUE = r"""
v = float(out)          # forces REMOTE execution to finish (CLAUDE.md)
assert np.isfinite(v), v
print(f"PROBE_OK value={v:.6g} wall={time.time() - t0:.1f}s", flush=True)
"""

PROBES = {
    "health": r"""
out = jnp.sum(jax.jit(lambda a, b: a @ b)(
    jnp.ones((256, 256)), jnp.ones((256, 256))))
""",
    "synthesis_mm": r"""
spec = jax.random.normal(key, (B, 2 * n_bins, F))
basis = jnp.asarray(_idft_filters(n_fft, win))[:, 0, :]
f = jax.jit(lambda s: jnp.einsum("bcf,cn->bfn", s, basis,
                                 precision=jax.lax.Precision.HIGHEST))
out = jnp.sum(jnp.abs(f(spec)))
""",
    "ola_concat": r"""
frames = jax.random.normal(key, (B, F, n_fft))
f = jax.jit(lambda x: _overlap_add_concat(x, hop))
out = jnp.sum(jnp.abs(f(frames)))
""",
    "ola_sliceadd": r"""
frames = jax.random.normal(key, (B, F, n_fft))
f = jax.jit(lambda x: _overlap_add_sliceadd(x, hop))
out = jnp.sum(jnp.abs(f(frames)))
""",
    "istft_concat": r"""
spec = jax.random.normal(key, (B, 2 * n_bins, F))
f = jax.jit(lambda s: _istft_ola(s, n_fft, hop, win, F, ola_mode="concat"))
out = jnp.sum(jnp.abs(f(spec)))
""",
    "istft_sliceadd": r"""
spec = jax.random.normal(key, (B, 2 * n_bins, F))
f = jax.jit(lambda s: _istft_ola(s, n_fft, hop, win, F, ola_mode="sliceadd"))
out = jnp.sum(jnp.abs(f(spec)))
""",
    "reanalysis": r"""
spec = jax.random.normal(key, (B, 2 * n_bins, F))
def body(s):
    y = _istft_ola(s, n_fft, hop, win, F, ola_mode="concat")
    return batched_stft_ri(y, n_fft, hop, win)
out = jnp.sum(jnp.abs(jax.jit(body)(spec)))
""",
    "gl2_concat": r"""
mag = jnp.abs(jax.random.normal(key, (B, F, n_bins)))
f = jax.jit(lambda m, k: griffin_lim_jax(m, cfg, k, n_iters=2,
                                         ola_mode="concat"))
out = jnp.sum(jnp.abs(f(mag, key)))
""",
    "gl2_sliceadd": r"""
mag = jnp.abs(jax.random.normal(key, (B, F, n_bins)))
f = jax.jit(lambda m, k: griffin_lim_jax(m, cfg, k, n_iters=2,
                                         ola_mode="sliceadd"))
out = jnp.sum(jnp.abs(f(mag, key)))
""",
    "gl60_concat": r"""
mag = jnp.abs(jax.random.normal(key, (B, F, n_bins)))
f = jax.jit(lambda m, k: griffin_lim_jax(m, cfg, k, n_iters=60,
                                         ola_mode="concat"))
out = jnp.sum(jnp.abs(f(mag, key)))
""",
    "mel2wav_concat": r"""
mel = jnp.clip(jnp.abs(jax.random.normal(key, (B, F, cfg.num_mels))), 0,
               cfg.max_abs_value)
f = jax.jit(lambda m, k: mel_to_wav_jax(m, cfg, k, ola_mode="concat"))
out = jnp.sum(jnp.abs(f(mel, key)))
""",
}

LADDER = ["health", "synthesis_mm", "ola_concat", "ola_sliceadd",
          "istft_concat", "istft_sliceadd", "reanalysis", "gl2_concat",
          "gl2_sliceadd", "gl60_concat", "mel2wav_concat"]


def run_probe(name: str, timeout: float) -> dict:
    code = PREAMBLE.format(repo=REPO) + PROBES[name] + EPILOGUE
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                           capture_output=True, text=True, cwd=REPO)
        ok = r.returncode == 0 and "PROBE_OK" in r.stdout
        return {"probe": name, "ok": ok, "wall_s": round(time.time() - t0, 1),
                "stdout": r.stdout.strip()[-400:],
                "stderr": "" if ok else r.stderr.strip()[-800:]}
    except subprocess.TimeoutExpired:
        return {"probe": name, "ok": False, "timeout": True,
                "wall_s": round(time.time() - t0, 1),
                "stderr": f"TIMEOUT after {timeout:.0f}s (device fault: the "
                          "probe never synced; expect the chip wedged for "
                          "~20-30 min)"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", choices=sorted(PROBES), default=None,
                    help="run a single probe instead of the ladder")
    ap.add_argument("--timeout", type=float, default=480.0,
                    help="per-probe wall limit (tunnel compiles are slow)")
    ap.add_argument("--continue-after-fault", action="store_true")
    ap.add_argument("--recovery-wait", type=float, default=1500.0,
                    help="seconds to wait for chip recovery after a fault "
                         "before the next probe (with --continue-after-fault)")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "VOCODER_BISECT.json"))
    args = ap.parse_args()

    names = [args.probe] if args.probe else LADDER
    results = []
    for name in names:
        print(f"[probe {name}] ...", flush=True)
        res = run_probe(name, args.timeout)
        results.append(res)
        print(f"[probe {name}] {'OK' if res['ok'] else 'FAULT'} "
              f"({res['wall_s']}s)", flush=True)
        if not res["ok"]:
            print(res.get("stderr", "")[-400:], flush=True)
            if not args.continue_after_fault:
                print("stopping at first fault (chip likely wedged; "
                      "re-run later or pass --continue-after-fault)")
                break
            print(f"waiting {args.recovery_wait:.0f}s for chip recovery...",
                  flush=True)
            time.sleep(args.recovery_wait)
            health = run_probe("health", args.timeout)
            results.append(health)
            state = "OK" if health["ok"] else "STILL DOWN"
            print(f"[recovery health] {state}", flush=True)
            if not health["ok"]:
                break
    with open(args.out, "w") as fh:
        json.dump({"results": results}, fh, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
