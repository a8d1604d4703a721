"""Capture a device profile (xplane) of the flagship train step on the
attached TPU, then print the top HLO ops by self time.

The README batch-scaling row and DESIGN.md name bandwidth as the limiter at
batch>32; this script asks the finer question — at the shipped batch 32 the
train step runs at 36% MFU (BENCH_r02), so where do the other 64% go?

Usage:
    python scripts/profile_train.py [--batch 32] [--steps 8] [--logdir DIR]
Then the script parses the captured .xplane.pb itself (xprof / tensorboard
plugin protos) and prints an op-level table; no TensorBoard UI needed.
"""
import os, sys, glob, argparse, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=32)
ap.add_argument("--steps", type=int, default=8)
ap.add_argument("--mel_len", type=int, default=720)
ap.add_argument("--text_len", type=int, default=128)
ap.add_argument("--logdir", default="/tmp/vaenar_profile")
ap.add_argument("--top", type=int, default=30)
ap.add_argument("--parse_only", action="store_true",
                help="skip capture; parse the newest trace in --logdir")
args = ap.parse_args()

import jax
from vaenar_tts_tpu.utils.compile_cache import setup_compile_cache
setup_compile_cache()
import jax.numpy as jnp
import numpy as np


def capture():
    from vaenar_tts_tpu.configs import get_config
    from vaenar_tts_tpu.models import VAENAR
    from vaenar_tts_tpu.training.steps import (init_model, make_optimizer,
                                               make_train_step)
    B, TT, TM, R = args.batch, args.text_len, args.mel_len, 2
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
    step = make_train_step(hp, model, opt, donate=False)

    # warm up; MUST pull a scalar so the remote compile actually finishes
    # before the trace starts (CLAUDE.md tunnel rules)
    p, b, o, m = step(params, bs, ostate, texts, mels, tl, ml,
                      jnp.float32(1e-5), k, reduction_factor=R)
    print("warm-up loss:", float(m["total"]))

    # compiler-side accounting to pair with the measured profile: total
    # flops + bytes accessed (VERDICT r3 #3 asks for bytes accounted) and
    # the peak-memory breakdown. Written next to the trace.
    try:
        import json
        compiled = step.lower(params, bs, ostate, texts, mels, tl, ml,
                              jnp.float32(1e-5), k,
                              reduction_factor=R).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        keep = {kk: float(vv) for kk, vv in dict(ca).items()
                if np.isscalar(vv) and ("flops" in kk or "bytes" in kk
                                        or "time" in kk)}
        ma = compiled.memory_analysis()
        if ma is not None:
            for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                         "output_size_in_bytes", "alias_size_in_bytes",
                         "generated_code_size_in_bytes"):
                v = getattr(ma, attr, None)
                if v is not None:
                    keep[f"memory_{attr}"] = float(v)
        os.makedirs(args.logdir, exist_ok=True)
        out = os.path.join(args.logdir, "cost_analysis.json")
        with open(out, "w") as f:
            json.dump(keep, f, indent=2, sort_keys=True)
        print("cost analysis ->", out)
        for kk in sorted(keep):
            print(f"  {kk}: {keep[kk]:.3e}")
    except Exception as e:  # best effort: profile capture is the main event
        print("cost analysis unavailable:", e)

    with jax.profiler.trace(args.logdir):
        for i in range(args.steps):
            p, b, o, m = step(p, b, o, texts, mels, tl, ml,
                              jnp.float32(1e-5), jax.random.fold_in(k, i),
                              reduction_factor=R)
        print("traced loss:", float(m["total"]))


def parse():
    """Parse the Chrome-trace JSON the profiler writes next to the xplane.

    jax.profiler emits both <host>.xplane.pb and <host>.trace.json.gz; the
    JSON carries everything this report needs per device op (name, dur,
    hlo_category, tf_op source attribution, model_flops,
    raw_bytes_accessed) without the xplane proto bindings, which are not
    importable in this image (xprof/tensorboard_plugin_profile ship without
    generated *_pb2 modules)."""
    import gzip, json, re
    paths = sorted(glob.glob(os.path.join(args.logdir, "**",
                                          "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace.json.gz captured under", args.logdir)
        return
    path = paths[-1]
    print("parsing", path)
    with gzip.open(path) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # Find the device plane's "XLA Ops" lane: process named /device:* with a
    # thread named "XLA Ops". Step/module lanes duplicate the same time.
    dev_pids = set()
    op_lanes = set()  # (pid, tid)
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name" and \
                "/device:" in e["args"]["name"]:
            dev_pids.add(e["pid"])
        if e.get("name") == "thread_name" and \
                e["args"]["name"].lower() in ("xla ops", "xla op"):
            op_lanes.add((e["pid"], e.get("tid")))
    op_lanes = {(p, t) for (p, t) in op_lanes if p in dev_pids}

    per_op = collections.Counter()
    per_cat = collections.Counter()
    per_mod = collections.defaultdict(lambda: [0.0, 0.0, 0.0])  # us,fl,by
    total_us = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_lanes:
            continue
        dur = e.get("dur", 0)  # microseconds
        a = e.get("args", {}) or {}
        per_op[e.get("name", "?")] += dur
        per_cat[a.get("hlo_category", "?")] += dur
        # module attribution: first 3 path parts of the jaxpr scope
        tf_op = (a.get("tf_op") or "?").replace("jit(train_step)/", "")
        mod = "/".join(tf_op.rstrip(":").split("/")[:3])
        m = per_mod[mod]
        m[0] += dur
        m[1] += float(a.get("model_flops", 0) or 0)
        m[2] += float(a.get("raw_bytes_accessed", 0) or 0)
        total_us += dur
    if not per_op:
        print("no XLA Ops lanes found; process/thread metadata was:")
        for e in events:
            if e.get("ph") == "M":
                print("  ", e.get("pid"), e.get("tid"), e["args"].get("name"))
        return
    n = args.steps
    print(f"\ntotal device op time: {total_us/1e3:.2f} ms over {n} "
          f"steps = {total_us/1e3/n:.3f} ms/step")
    print(f"\nby category (ms/step):")
    for cat, us in per_cat.most_common(20):
        print(f"  {us/n/1e3:8.3f} ms  {100*us/total_us:5.1f}%  {cat}")
    print(f"\ntop {args.top} modules by self time "
          f"(ms/step | GFLOP/step | MB/step | achieved TFLOP/s):")
    for mod, (us, fl, by) in sorted(per_mod.items(),
                                    key=lambda kv: -kv[1][0])[:args.top]:
        tput = fl / (us * 1e-6) / 1e12 if us else 0.0
        print(f"  {us/n/1e3:8.3f} ms {100*us/total_us:5.1f}% "
              f"{fl/n/1e9:9.2f} {by/n/1e6:9.1f} {tput:7.1f}  {mod[:86]}")
    print(f"\ntop {args.top} HLO ops by self time:")
    for name, us in per_op.most_common(args.top):
        print(f"  {us/n/1e3:8.4f} ms  {100*us/total_us:5.1f}%  {name[:110]}")


if not args.parse_only:
    capture()
parse()
