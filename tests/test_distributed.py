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


def _spawn(workspace, port, pid, n_steps=2, max_epochs=1):  # inclusive: run epoch 1 only
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORM_NAME": "cpu",
        "JAX_PLATFORMS": "cpu",
        # one local device per process -> 2 global devices
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "VAENAR_COORDINATOR": f"localhost:{port}",
        "VAENAR_NUM_PROCESSES": "2",
        "VAENAR_PROCESS_ID": str(pid),
    })
    cmd = [sys.executable, "-m", "vaenar_tts_tpu.cli.train",
           "--dataset", "ljspeech",
           "--data_dir", str(workspace / "records"),
           "--model_dir", str(workspace / "ckpt"),
           "--log_dir", str(workspace / f"logs_p{pid}"),
           "--test_dir", str(workspace / "test_arts"),
           "--max_epochs", str(max_epochs),
           "--steps_per_epoch", str(n_steps),
           "--log_every", "1",
           "--distributed",
           # exercise the distributed test-artifact path (global synthesis,
           # collective fetch, process-0 writes) at epoch 1
           "--override", "train.test_interval=1"] + tiny_overrides()
    return subprocess.Popen(cmd, cwd=REPO, env=env, text=True,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)


def _reference_chain(workspace, hp, n_steps=2):
    """Single-process mirror of the 2-process run: same shard partition,
    same per-process loaders, same RNG chain, global batch = concat of the
    two local slices."""
    import jax
    import jax.numpy as jnp

    from vaenar_tts_tpu.data.loader import BucketedLoader, pad_to_multiple
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
    t_max = pad_to_multiple(max(l.max_text_len for l in loaders),
                            hp.dataset.text_bucket)
    m_max = pad_to_multiple(max(l.max_mel_len for l in loaders),
                            hp.dataset.mel_bucket)
    for l in loaders:
        l.fixed_text_max, l.fixed_mel_max = t_max, m_max

    def global_batches(epoch):
        for b0, b1 in zip(loaders[0].epoch(epoch), loaders[1].epoch(epoch)):
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

    # epoch 1
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
    dev_step = make_dev_step(hp, model)
    dev = BucketedLoader(list_shards(data_dir, "dev"), local_bs,
                         mel_bucket=hp.dataset.mel_bucket,
                         text_bucket=hp.dataset.text_bucket, shuffle=False,
                         seed=hp.train.random_seed)
    dev.fixed_text_max = pad_to_multiple(dev.max_text_len,
                                         hp.dataset.text_bucket)
    dev.fixed_mel_max = pad_to_multiple(dev.max_mel_len,
                                        hp.dataset.mel_bucket)
    slices = [list(BucketedLoader(
        list_shards(data_dir, "dev"), local_bs,
        mel_bucket=hp.dataset.mel_bucket, text_bucket=hp.dataset.text_bucket,
        shuffle=False, seed=hp.train.random_seed, shard_index=p,
        shard_count=2, fixed_text_max=dev.fixed_text_max,
        fixed_mel_max=dev.fixed_mel_max).epoch(1)) for p in range(2)]
    n_groups = -(-dev.num_utterances // local_bs)
    dev_steps = -(-n_groups // 2)
    sums, n_utts = {}, 0
    for s in range(dev_steps):
        parts, vmasks, n_valid = [], [], 0
        for p in range(2):
            b = slices[p][s] if s < len(slices[p]) else slices[p][-1]
            nv = b.n_valid if s < len(slices[p]) else 0
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


def test_partition_shards_disjoint_and_total():
    from vaenar_tts_tpu.parallel.distributed import partition_shards
    paths = [f"train-{i}.vrs" for i in range(8)]
    a = partition_shards(paths, index=0, count=2)
    b = partition_shards(paths, index=1, count=2)
    assert sorted(a + b) == sorted(paths)
    assert not set(a) & set(b)
    with pytest.raises(ValueError):
        partition_shards(["x.vrs"], index=1, count=2)
