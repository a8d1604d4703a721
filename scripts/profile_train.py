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
    paths = sorted(glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane captured under", args.logdir)
        return
    path = paths[-1]
    print("parsing", path)
    try:
        from xprof.protobuf import xplane_pb2  # newer packaging
    except ImportError:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    # Self time per HLO op, summed over TPU device planes. Each line in a
    # device plane is a trace lane; events reference metadata by id.
    per_op = collections.Counter()
    per_cat = collections.Counter()
    total_ns = 0
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lanes carry per-op events; step lanes duplicate time
            if "xla op" not in lname and "xla ops" not in lname:
                continue
            for ev in line.events:
                m = meta[ev.metadata_id]
                dur = ev.duration_ps // 1000  # ns
                name = m.name
                cat = ""
                for st in list(ev.stats) + list(m.stats):
                    sname = stat_meta[st.metadata_id].name
                    if sname in ("hlo_category", "category"):
                        cat = st.str_value or st.ref_value and \
                            stat_meta[st.ref_value].name or ""
                per_op[name] += dur
                per_cat[cat or "?"] += dur
                total_ns += dur
    if not per_op:
        print("no 'XLA Ops' lanes found; plane names were:")
        for plane in xspace.planes:
            print("  ", plane.name, [l.name for l in plane.lines][:6])
        return
    print(f"\ntotal device op time: {total_ns/1e6:.2f} ms over {args.steps} "
          f"steps = {total_ns/1e6/args.steps:.2f} ms/step")
    print(f"\ntop {args.top} HLO ops by self time:")
    for name, ns in per_op.most_common(args.top):
        print(f"  {ns/1e6:8.3f} ms  {100*ns/total_ns:5.1f}%  {name[:110]}")
    print("\nby category:")
    for cat, ns in per_cat.most_common(20):
        print(f"  {ns/1e6:8.3f} ms  {100*ns/total_ns:5.1f}%  {cat}")


if not args.parse_only:
    capture()
parse()
