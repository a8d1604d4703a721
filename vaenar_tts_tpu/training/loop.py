"""Training driver: epochs, curriculum, eval, checkpoints, artifacts.

Functional re-build of reference train.py:35-329:
  * restore-latest or data-dependent cold init + initial save + priming step
    (train.py:246-266)
  * kl-weight anneal + reduction-factor curriculum per epoch
    (train.py:229-243, :269-271)
  * per-epoch train/dev loss averages -> metrics writer
    (train.py:280-301)
  * checkpoint each epoch; every ``test_interval`` epochs synthesize one test
    batch to wavs/mel plots/alignment plots (train.py:304-325)

TPU specifics: jitted steps with static reduction_factor, shapes bucketed by
the loader (a handful of compilations per curriculum stage), device arrays
donated across steps.
"""

from __future__ import annotations

import os
import signal
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.export import TestUtils
from ..configs.hparams import HParams
from ..configs.serialize import save_hparams
from ..data.loader import BucketedLoader
from ..data.records import list_shards
from ..models.vaenar import VAENAR
from ..utils.checkpoint import CheckpointManager
from ..utils.logging import MetricsWriter
from ..utils.prefetch import prefetch
from ..utils.profiling import RetraceMonitor
from .steps import (TrainState, init_model, make_dev_step, make_epoch_runner,
                    make_optimizer,
                    make_test_step, make_train_step, run_data_dependent_init)


def make_loaders(hp: HParams, data_dir: str, dist=None):
    """Single-process: bucketed loaders over all shards. Multi-process
    (``dist`` = a DistContext): the TRAIN loader owns a disjoint SET of .vrs
    shards (the reference's 8-shard layout is exactly this affordance,
    reference tf_record_utils.py:72-85) with the local batch =
    global_batch / process_count; the DEV loader takes a round-robin slice
    of the batch list (dev is one shard; eval work splits n_hosts ways).
    Batch shapes follow a LOCKSTEP BUCKET SCHEDULE agreed once per epoch
    (``epoch_shape_schedule`` + ``sync_elementwise_max``): step i pads to
    the element-wise max of the processes' natural bucket shapes, so
    multi-process runs keep (most of) the single-process padding savings
    instead of paying global-corpus-max FLOPs every step."""
    mel_b, text_b = hp.dataset.mel_bucket, hp.dataset.text_bucket
    if dist is not None and dist.process_count > 1:
        from ..parallel.distributed import partition_shards
        pc = dist.process_count
        local_bs = hp.train.train_batch_size // pc
        if local_bs * pc != hp.train.train_batch_size:
            raise ValueError(
                f"train_batch_size {hp.train.train_batch_size} must divide "
                f"by process_count {pc}")
        train = BucketedLoader(
            partition_shards(list_shards(data_dir, "train")), local_bs,
            mel_bucket=mel_b, text_bucket=text_b, shuffle=hp.train.shuffle,
            seed=hp.train.random_seed + dist.process_index, drop_last=True)
        dev = BucketedLoader(
            list_shards(data_dir, "dev"), local_bs,
            mel_bucket=mel_b, text_bucket=text_b, shuffle=False,
            seed=hp.train.random_seed,
            shard_index=dist.process_index, shard_count=pc)
        # fail at startup ON EVERY PROCESS if some process would own zero dev
        # batches — the condition is computed from globally identical values
        # (total dev size, process count), so all processes raise together
        # instead of one dying mid-epoch while peers hang in the dev_step
        # collective
        n_dev_groups = -(-dev.num_utterances // local_bs)
        if n_dev_groups < pc:
            raise ValueError(
                f"dev set too small for this fleet: {n_dev_groups} dev "
                f"batch(es) of {local_bs} < {pc} processes; shrink the "
                f"process count or grow the dev set")
        # test loader is NOT sharded: every process reads the same batch and
        # feeds its row-slice of it, so the global test batch (and therefore
        # the artifacts process 0 writes) is identical to a single-process
        # run — and its natural bucket shapes are already identical on every
        # process, no pin or schedule needed
        if hp.train.test_batch_size % pc != 0:
            raise ValueError(
                f"test_batch_size {hp.train.test_batch_size} must divide "
                f"by process_count {pc}")
        test = BucketedLoader(
            list_shards(data_dir, "test"), hp.train.test_batch_size,
            mel_bucket=mel_b, text_bucket=text_b, shuffle=False,
            seed=hp.train.random_seed)
        return train, dev, test
    train = BucketedLoader(
        list_shards(data_dir, "train"), hp.train.train_batch_size,
        mel_bucket=mel_b, text_bucket=text_b,
        shuffle=hp.train.shuffle, seed=hp.train.random_seed, drop_last=True)
    dev = BucketedLoader(
        list_shards(data_dir, "dev"), hp.train.train_batch_size,
        mel_bucket=mel_b, text_bucket=text_b,
        shuffle=False, seed=hp.train.random_seed)
    test = BucketedLoader(
        list_shards(data_dir, "test"), hp.train.test_batch_size,
        mel_bucket=mel_b, text_bucket=text_b,
        shuffle=False, seed=hp.train.random_seed)
    return train, dev, test


def train(hp: HParams, data_dir: str, model_dir: str, log_dir: str,
          test_dir: Optional[str] = None,
          max_epochs: Optional[int] = None,
          steps_per_epoch: Optional[int] = None,
          log_every: int = 50, dist=None,
          neural_vocoder_dir: Optional[str] = None,
          probe=None, probe_every: int = 0,
          probe_start: int = 0) -> TrainState:
    """Run (or resume) training. Returns the final TrainState.

    ``dist``: a parallel.distributed.DistContext for multi-process (pod)
    training — model state is replicated on the global mesh, each process
    feeds its shard-set's slice of the global data-parallel batch, dev eval
    splits across processes, and process 0 writes checkpoints/artifacts.
    ``neural_vocoder_dir``: optional trained ISTFT-head vocoder; test-interval
    wav artifacts then use it instead of Griffin-Lim.
    ``probe``: optional ``probe(epoch, state) -> dict|None`` product-metric
    callback (training/probe.py), run every ``probe_every`` epochs right
    after the checkpoint save so each probed epoch is also a restorable
    checkpoint candidate. Single-process only (skipped under ``dist``);
    failures are logged and never kill the run.
    ``probe_start``: skip probes before this epoch — the free-text LER is
    measured uninformative (~1.0 flat) before the r-curriculum's final
    stage, and each probe costs chip time."""
    if dist is not None and dist.process_count == 1:
        dist = None
    is_main = dist is None or dist.is_main
    test_dir = test_dir or os.path.join(log_dir, "test")
    tester = TestUtils(hp, test_dir, neural_vocoder_dir=neural_vocoder_dir)
    metrics_train = MetricsWriter(os.path.join(
        log_dir, "train" if is_main else f"train_p{dist.process_index}"))
    metrics_dev = MetricsWriter(os.path.join(
        log_dir, "dev" if is_main else f"dev_p{dist.process_index}"))

    train_loader, dev_loader, test_loader = make_loaders(hp, data_dir, dist)
    print(f"train batches/epoch: {len(train_loader)}, "
          f"dev: {len(dev_loader)}, test: {len(test_loader)}")
    print(f"shape census (text_max, mel_max) -> count: "
          f"{train_loader.shape_census()}")
    # lockstep: every process must run the same number of global steps
    steps_cap = dist.sync_min(len(train_loader)) if dist else None
    if dist and steps_cap != len(train_loader):
        print(f"lockstep cap: {steps_cap} steps/epoch "
              f"(local loader has {len(train_loader)})")

    def _train_schedule(epoch):
        """Lockstep bucket schedule: all processes agree per step on the
        element-wise max of their natural bucket shapes (VERDICT r2 #6) —
        one small allgather per epoch, not per step."""
        if dist is None:
            return None
        return dist.sync_elementwise_max(
            train_loader.epoch_shape_schedule(epoch, n_steps=steps_cap))

    dev_sched = None
    if dist is not None:
        n_dev_groups = -(-dev_loader.num_utterances // dev_loader.batch_size)
        dev_steps_total = -(-n_dev_groups // dist.process_count)
        # dev is unshuffled: one schedule serves every epoch
        dev_sched = dist.sync_elementwise_max(
            dev_loader.epoch_shape_schedule(0, n_steps=dev_steps_total))
        sched0 = _train_schedule(0)
        shapes = sorted({(int(t), int(m)) for t, m in sched0})
        mel_frac = float(np.sum(sched0[:, 1])) / (len(sched0)
                                                  * float(np.max(sched0[:, 1])))
        print(f"lockstep bucket schedule (epoch 0): {len(shapes)} distinct "
              f"shapes {shapes}; scheduled mel frames = {100 * mel_frac:.1f}% "
              f"of pad-to-global-max (the round-2 behavior)")

    model = VAENAR(hp)
    optimizer = make_optimizer(hp)
    train_step = make_train_step(hp, model, optimizer)
    dev_step = make_dev_step(hp, model)
    # test synthesis uses the plots twin (fused attention off) so alignment
    # artifacts stay available whatever kernel the hot path runs
    from .steps import plots_variant
    test_step = make_test_step(hp, VAENAR(plots_variant(hp)))
    # jit-recompile detector (the reference's 'tracing back at...' prints)
    retrace = RetraceMonitor(train_step=train_step, dev_step=dev_step,
                             test_step=test_step)

    # -- device-resident dataset cache (TPU-native fast path) -----------------
    # See TrainConfig.device_data_cache_mb: upload the fixed batch groups to
    # HBM once and run each epoch as ONE jitted lax.scan dispatch
    # (steps.py::make_epoch_runner) instead of re-sending every batch every
    # epoch. Single-process only — the multi-process path interleaves
    # per-step collectives and lockstep shape schedules.
    epoch_runner = None
    train_cache = dev_cache = None
    cache_mb = float(getattr(hp.train, "device_data_cache_mb", 0) or 0)
    if cache_mb > 0 and dist is None and len(train_loader) > 0:
        census = train_loader.shape_census()
        n_mels = train_loader.num_mels
        per_utt = lambda t, m: t * 4 + m * n_mels * 4 + 8  # noqa: E731
        total_mb = sum(cnt * hp.train.train_batch_size * per_utt(t, m)
                       for (t, m), cnt in census.items()) / 1e6
        if len(census) != 1:
            print(f"device data cache OFF: {len(census)} static batch "
                  f"shapes (the one-scan epoch needs exactly 1)")
        elif total_mb > cache_mb:
            print(f"device data cache OFF: train split ~{total_mb:.0f} MB > "
                  f"device_data_cache_mb={cache_mb:.0f}")
        else:
            batches = train_loader.all_batches()
            train_cache = (
                jnp.asarray(np.stack([b.texts for b in batches])),
                jnp.asarray(np.stack([b.mels for b in batches])),
                jnp.asarray(np.stack([b.text_lengths for b in batches])),
                jnp.asarray(np.stack([b.mel_lengths for b in batches])))
            # dev is unshuffled (make_loaders), so its base order IS the
            # epoch order; shapes may differ per batch, so keep a list
            dev_cache = [
                (jnp.asarray(b.texts), jnp.asarray(b.mels),
                 jnp.asarray(b.text_lengths), jnp.asarray(b.mel_lengths),
                 jnp.asarray((np.arange(b.texts.shape[0]) < b.n_valid)
                             .astype(np.float32)), b.n_valid)
                for b in dev_loader.all_batches()]
            if bool(getattr(hp.train, "device_cache_epoch_scan", False)):
                epoch_runner = make_epoch_runner(train_step)
                mode = "one lax.scan dispatch per epoch"
            else:
                # per-step dispatch over on-device gathers: same proven
                # step program, zero batch re-upload (only index scalars
                # cross the link). See device_cache_epoch_scan.
                take_batch = jax.jit(lambda cache, i: jax.tree_util.tree_map(
                    lambda x: x[i], cache))
                mode = "per-step dispatch over device gathers"
            print(f"device data cache ON: {len(batches)} train batches "
                  f"(~{total_mb:.0f} MB) + {len(dev_cache)} dev batches "
                  f"HBM-resident; {mode}")

    # -- init or restore ------------------------------------------------------
    params, batch_stats = init_model(
        hp, model, hp.train.random_seed,
        text_max=hp.dataset.text_bucket, mel_max=hp.dataset.mel_bucket)
    opt_state = optimizer.init(params)
    state = TrainState(params, batch_stats, opt_state, epoch=0)

    ckpt = CheckpointManager(model_dir,
                             max_to_keep=hp.train.checkpoint_max_to_keep,
                             keep_every_n_hours=hp.train.checkpoint_keep_every_n_hours,
                             solo_process=dist is not None)
    restored = ckpt.restore(state.as_dict())
    # persist only after the restore attempt: writing first would clobber the
    # trained architecture's hparams.json when a mismatched resume crashes
    if is_main:
        save_hparams(hp, model_dir)  # inference reconstructs this architecture
    rng = jax.random.key(hp.train.random_seed)

    def _ckpt_save(epoch: int, st: TrainState, wait: bool = False) -> None:
        # multi-process: process 0 writes host copies of the replicated state
        # (shared filesystem, as the reference assumes); others wait at the
        # barrier so a restart never races a half-written save
        if dist is None:
            ckpt.save(epoch, st.as_dict(), wait=wait)
        else:
            if dist.is_main:
                host = dict(dist.to_host(
                    {"params": st.params, "batch_stats": st.batch_stats,
                     "opt_state": st.opt_state}), epoch=st.epoch)
                ckpt.save(epoch, host, wait=True)
            dist.barrier(f"ckpt_{epoch}")

    def _key(k):
        return dist.key(k) if dist is not None else k

    def _f32(x):
        return dist.scalar(x) if dist is not None else jnp.float32(x)

    if restored is not None:
        state = TrainState.from_dict(restored)
        print(f"Restored from epoch {state.epoch}")
        if dist is not None:
            state = TrainState(
                dist.replicate(state.params), dist.replicate(state.batch_stats),
                dist.replicate(state.opt_state), epoch=state.epoch)
    else:
        print("Initializing from scratch (data-dependent flow init).")
        first = next(iter(train_loader.epoch(
            0, shape_schedule=sched0 if dist is not None else None)))
        if dist is not None:
            state = TrainState(
                dist.replicate(state.params), dist.replicate(state.batch_stats),
                dist.replicate(state.opt_state), epoch=0)
            f_texts, f_mels, f_tlens, f_mlens = dist.global_batch(
                first.texts, first.mels, first.text_lengths,
                first.mel_lengths)
            init_keys = (_key(jax.random.key(hp.train.random_seed)),
                         _key(jax.random.key(hp.train.random_seed + 1)))
        else:
            f_texts, f_mels, f_tlens, f_mlens = (
                jnp.asarray(first.texts), jnp.asarray(first.mels),
                jnp.asarray(first.text_lengths), jnp.asarray(first.mel_lengths))
            init_keys = None
        new_params = run_data_dependent_init(
            hp, model, state.params, state.batch_stats,
            f_texts, f_tlens, f_mlens,
            max_mel_length=first.mels.shape[1],
            seed=hp.train.random_seed, keys=init_keys)
        state.params = new_params
        state.opt_state = optimizer.init(new_params)
        _ckpt_save(0, state)
        # priming step at max reduction factor (reference train.py:262-266)
        rng, sub = jax.random.split(rng)
        p, bs, os_, m = train_step(
            state.params, state.batch_stats, state.opt_state,
            f_texts, f_mels, f_tlens, f_mlens,
            _f32(hp.train.kl_weight_init), _key(sub),
            reduction_factor=hp.common.max_reduction_factor)
        state = TrainState(p, bs, os_, epoch=0)
        print("Initial step:", {k: float(v) for k, v in m.items()})

    # -- preemption handling: checkpoint-on-SIGTERM, then exit cleanly --------
    # (the reference's only recovery is restore-latest on restart; this makes
    # the restart lose at most the in-flight epoch's steps, not the epoch)
    stop_requested = {"flag": False}

    def _on_sigterm(_sig, _frm):
        stop_requested["flag"] = True
        print("SIGTERM received: will checkpoint and stop at the next step")

    try:
        prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:  # non-main thread (tests)
        prev_handler = None

    # -- epochs ----------------------------------------------------------------
    # The preset epoch count keeps the reference's exclusive-range quirk
    # (train.py:269: range(step+1, 2000) runs epochs 1..1999). The explicit
    # ``max_epochs`` override is INCLUSIVE — "run through epoch N" — because
    # max_epochs=1 silently running zero epochs is a trap, not parity.
    total_epochs = (max_epochs + 1 if max_epochs is not None
                    else hp.train.epochs)
    # both startup paths leave state.epoch on disk (restore-latest, or the
    # post-init epoch-0 save)
    last_saved_epoch = state.epoch
    interrupted_mid_epoch = False
    for epoch in range(state.epoch + 1, total_epochs):
        # per-epoch RNG stream, independent of how the run reached this
        # epoch: a preempted run that restarts from the epoch-N checkpoint
        # replays exactly the stream the uninterrupted run would have used,
        # so resume is bitwise-identical (CI-checked in test_distributed).
        rng = jax.random.fold_in(jax.random.key(hp.train.random_seed), epoch)
        kl_weight = hp.train.kl_weight_at(epoch)
        r = hp.train.reduction_factor_at(epoch)
        print(f"Epoch {epoch}: kl_weight={kl_weight}, reduction_factor={r}")
        epoch_start = time.time()
        sums_dev = None  # metric sums as DEVICE scalars: pulled once/epoch
        n_steps = 0

        if epoch_runner is not None:
            # device-cache fast path: one dispatch for the whole epoch; only
            # the batch-order indices cross the host->device link. Falls
            # through to the shared epoch tail (pull, dev, ckpt, probe).
            if stop_requested["flag"]:
                interrupted_mid_epoch = True
            else:
                order = train_loader.batch_order(epoch)
                if steps_per_epoch:
                    order = order[:steps_per_epoch]
                p, bs, os_, rng, sums_dev = epoch_runner(
                    state.params, state.batch_stats, state.opt_state,
                    *train_cache, jnp.asarray(order, jnp.int32),
                    _f32(kl_weight), rng, reduction_factor=r)
                state = TrainState(p, bs, os_, epoch=state.epoch)
                n_steps = len(order)
        else:
            def to_device(batches):
                # host->device copies enqueue from the prefetch thread, one
                # batch ahead of compute (JAX dispatch is thread-safe +
                # async). BOTH step caps terminate the generator here so the
                # prefetch worker drains and exits instead of blocking on a
                # full queue forever
                for i, b in enumerate(batches):
                    if steps_cap is not None and i >= steps_cap:
                        break  # lockstep across processes
                    if steps_per_epoch and i >= steps_per_epoch:
                        break
                    if dist is not None:
                        yield dist.global_batch(b.texts, b.mels,
                                                b.text_lengths, b.mel_lengths)
                    else:
                        yield (jnp.asarray(b.texts), jnp.asarray(b.mels),
                               jnp.asarray(b.text_lengths),
                               jnp.asarray(b.mel_lengths))

            if train_cache is not None:
                # device-cache gather mode: feed the SAME step loop from
                # HBM-resident batches; gathers dispatch asynchronously so
                # no prefetch thread is needed
                order = train_loader.batch_order(epoch)
                if steps_per_epoch:
                    order = order[:steps_per_epoch]
                batch_iter = (take_batch(train_cache, np.int32(gi))
                              for gi in order)
            else:
                epoch_sched = _train_schedule(epoch)
                batch_iter = prefetch(
                    to_device(train_loader.epoch(epoch,
                                                 shape_schedule=epoch_sched)))
            for texts_d, mels_d, tlens_d, mlens_d in batch_iter:
                if stop_requested["flag"] and dist is None:
                    # single-process: stop NOW (preemption grace periods are
                    # short); the partial epoch is discarded and re-run on
                    # resume. Multi-process keeps epoch-boundary stopping: a
                    # process breaking mid-epoch would leave its peers
                    # hanging in the next step's collective.
                    interrupted_mid_epoch = True
                    break
                rng, sub = jax.random.split(rng)
                step_start = time.time()
                p, bs, os_, m = train_step(
                    state.params, state.batch_stats, state.opt_state,
                    texts_d, mels_d, tlens_d, mlens_d,
                    _f32(kl_weight), _key(sub), reduction_factor=r)
                state = TrainState(p, bs, os_, epoch=state.epoch)
                n_steps += 1
                if n_steps % log_every == 0 or n_steps == 1:
                    mh = {k: float(v) for k, v in m.items()}
                    print(f"  step {n_steps}: " + ", ".join(
                        f"{k} {v:.6f}" for k, v in mh.items())
                        + f", time {time.time() - step_start:.3f}s")
                # accumulate ON DEVICE: a float(v) per step is a blocking
                # device->host pull that serializes dispatch with compute
                # (very slow over the tunnel); one pull per epoch suffices
                sums_dev = (m if sums_dev is None else
                            jax.tree_util.tree_map(jnp.add, sums_dev, m))
        if interrupted_mid_epoch:
            if last_saved_epoch != state.epoch:
                _ckpt_save(state.epoch, state, wait=True)
            print(f"preemption: stopped during epoch {epoch}; checkpoint at "
                  f"completed epoch {state.epoch}")
            break
        sums = ({k: float(v) for k, v in sums_dev.items()}
                if sums_dev is not None else {})
        train_avg = {k: v / max(n_steps, 1) for k, v in sums.items()}
        print(f"Epoch {epoch} train done in {time.time() - epoch_start:.1f}s: "
              f"{train_avg}")
        retrace.check(f"epoch {epoch}")
        metrics_train.scalars(epoch, train_avg)

        # validation (reference train.py:287-296). Per-batch means are
        # weighted by n_valid so a 1-utterance tail batch does not count as
        # much as a full one (the reference averages batch means equally).
        dev_sums: Dict[str, float] = {}
        n_dev_utts = 0
        if dev_cache is not None:
            # device-resident dev batches (dev is unshuffled, so base order
            # IS the epoch order); identical math to the streaming branch
            for texts_d, mels_d, tlens_d, mlens_d, vmask_d, n_valid \
                    in dev_cache:
                rng, sub = jax.random.split(rng)
                m = dev_step(state.params, state.batch_stats, texts_d,
                             mels_d, tlens_d, mlens_d, jnp.float32(kl_weight),
                             vmask_d, sub, reduction_factor=r)
                for k, v in m.items():
                    dev_sums[k] = dev_sums.get(k, 0.0) + float(v) * n_valid
                n_dev_utts += n_valid
        elif dist is None:
            for batch in dev_loader.epoch(epoch):
                rng, sub = jax.random.split(rng)
                vmask = (np.arange(batch.texts.shape[0]) < batch.n_valid
                         ).astype(np.float32)
                m = dev_step(state.params, state.batch_stats,
                             jnp.asarray(batch.texts), jnp.asarray(batch.mels),
                             jnp.asarray(batch.text_lengths),
                             jnp.asarray(batch.mel_lengths),
                             jnp.float32(kl_weight), jnp.asarray(vmask), sub,
                             reduction_factor=r)
                for k, v in m.items():
                    dev_sums[k] = (dev_sums.get(k, 0.0)
                                   + float(v) * batch.n_valid)
                n_dev_utts += batch.n_valid
        else:
            # each process evaluates its round-robin slice of the dev batches;
            # all processes step in LOCKSTEP (a process whose slice ran dry
            # re-feeds its last batch with n_valid=0 so the collective never
            # stalls), and the weighted sums aggregate across processes.
            # dev_sched pins step s on every process to the same synced
            # bucket shape (the dummy re-feed repads to match).
            from ..data.loader import repad_batch
            n_groups = -(-dev_loader.num_utterances // dev_loader.batch_size)
            dev_steps = -(-n_groups // dist.process_count)
            it = iter(dev_loader.epoch(epoch, shape_schedule=dev_sched))
            batch = None
            for s in range(dev_steps):
                n_valid = 0
                try:
                    batch = next(it)
                    n_valid = batch.n_valid
                except StopIteration:
                    # keep the previous batch as a masked dummy, repadded to
                    # this step's scheduled shape
                    batch = repad_batch(batch, int(dev_sched[s][0]),
                                        int(dev_sched[s][1]))
                # make_loaders guarantees every process owns >=1 dev batch
                # (synced startup check), so `batch` is set after step 0
                assert batch is not None
                rng, sub = jax.random.split(rng)
                vmask = (np.arange(batch.texts.shape[0]) < n_valid
                         ).astype(np.float32)
                g_texts, g_mels, g_tlens, g_mlens, g_vmask = dist.global_batch(
                    batch.texts, batch.mels, batch.text_lengths,
                    batch.mel_lengths, vmask)
                m = dev_step(state.params, state.batch_stats,
                             g_texts, g_mels, g_tlens, g_mlens,
                             _f32(kl_weight), g_vmask, _key(sub),
                             reduction_factor=r)
                step_utts = int(dist.allsum(np.asarray([n_valid]))[0])
                for k, v in m.items():
                    # dev_step's vmean is already over the GLOBAL batch
                    dev_sums[k] = dev_sums.get(k, 0.0) + float(v) * step_utts
                n_dev_utts += step_utts
        dev_avg = {k: v / max(n_dev_utts, 1) for k, v in dev_sums.items()}
        print(f"Epoch {epoch} dev: {dev_avg}")
        metrics_dev.scalars(epoch, dev_avg)

        state.epoch = epoch
        if (epoch % hp.train.checkpoint_every_n_epochs == 0
                or epoch == total_epochs - 1):
            _ckpt_save(epoch, state)
            last_saved_epoch = epoch

        if (probe is not None and probe_every > 0 and dist is None
                and epoch >= probe_start and epoch % probe_every == 0):
            if last_saved_epoch != epoch:
                # a probed epoch must be a restorable selection candidate
                _ckpt_save(epoch, state)
                last_saved_epoch = epoch
            try:
                scalars = probe(epoch, state)
                if scalars:
                    stop = bool(scalars.pop("stop_training", False))
                    print(f"Epoch {epoch} probe: " + ", ".join(
                        f"{k} {v:.4f}" for k, v in scalars.items()))
                    metrics_dev.scalars(epoch, scalars)
                    if stop:
                        # probe-driven early stop (e.g. the free-text LER
                        # target was hit — no point training through more
                        # lottery epochs); the epoch is already saved above
                        print(f"stopping after epoch {epoch}: probe "
                              f"requested early stop")
                        break
            except Exception as e:  # a probe must never kill the run
                print(f"probe failed at epoch {epoch}: {e!r}")

        if epoch % hp.train.test_interval == 0 and test_dir:
            rng, test_sub = jax.random.split(rng)  # no key reuse with train
            _run_test_artifacts(hp, state, test_step, test_loader, tester,
                                epoch, r, test_sub, metrics_writer=metrics_dev,
                                dist=dist)
        if dist is not None:
            # collective stop decision: if ANY process was signaled this
            # epoch, the whole fleet stops at this boundary. Without the
            # sync, a SIGTERM landing astride an epoch boundary could stop
            # one process while a peer enters the next epoch and hangs in
            # its first collective.
            any_stop = dist.allsum(
                np.asarray([1.0 if stop_requested["flag"] else 0.0]))
            stop_requested["flag"] = bool(any_stop[0] > 0)
        if stop_requested["flag"]:
            if last_saved_epoch != epoch:
                # the retention schedule skipped this epoch; a preemption
                # exit must still leave the completed work on disk
                _ckpt_save(epoch, state, wait=True)
                last_saved_epoch = epoch
            print(f"stopping after epoch {epoch} (preemption); "
                  f"checkpoint at epoch {epoch}")
            break
    if prev_handler is not None:
        signal.signal(signal.SIGTERM, prev_handler)
    metrics_train.close()
    metrics_dev.close()
    ckpt.close()
    return state


def _run_test_artifacts(hp, state, test_step, test_loader, tester, epoch, r,
                        rng, metrics_writer=None, dist=None):
    """Synthesize one test batch to wavs + plots (reference train.py:309-325),
    plus objective quality metrics vs ground truth (beyond reference, which
    only eyeballs wavs): mel-L1/L2 and MCD over the valid frames.

    Multi-process: every process feeds its row-slice of the SAME test batch
    (the test loader is unsharded), the synthesis runs as one global jit, and
    process 0 pulls the full result and writes the same artifacts a
    single-process run would."""
    try:
        batch = next(iter(test_loader.epoch(epoch)))
    except StopIteration:
        return
    if dist is not None:
        k = batch.texts.shape[0] // dist.process_count
        rows = slice(dist.process_index * k, (dist.process_index + 1) * k)
        g_texts, g_tlens, g_mlens = dist.global_batch(
            batch.texts[rows], batch.text_lengths[rows],
            batch.mel_lengths[rows])
        mels, ali = test_step(
            state.params, state.batch_stats, g_texts, g_tlens, g_mlens,
            dist.key(rng), reduction_factor=r,
            max_mel_length=batch.mels.shape[1])
        # collective pulls: EVERY process participates, then only main writes
        mels = dist.fetch(mels).astype(np.float32)
        ali = {name: (None if a is None else dist.fetch(a))
               for name, a in ali.items()}
        if not dist.is_main:
            return
    else:
        mels, ali = test_step(
            state.params, state.batch_stats, jnp.asarray(batch.texts),
            jnp.asarray(batch.text_lengths), jnp.asarray(batch.mel_lengths),
            rng, reduction_factor=r, max_mel_length=batch.mels.shape[1])
        mels = np.asarray(mels, np.float32)

    from ..utils.metrics import batch_summary
    pairs = [(mels[i][: int(batch.mel_lengths[i])],
              batch.mels[i][: int(batch.mel_lengths[i])])
             for i in range(batch.n_valid)]
    quality = batch_summary(pairs)
    print(f"test quality @ epoch {epoch}: mel_l1 {quality['mel_l1']:.4f}, "
          f"mcd {quality['mcd_db']:.2f} dB over {quality['n']} utts")
    if metrics_writer is not None:
        metrics_writer.scalars(epoch, {"test_mel_l1": quality["mel_l1"],
                                       "test_mel_l2": quality["mel_l2"],
                                       "test_mcd_db": quality["mcd_db"]})
    try:
        tester.synthesize_and_save_wavs_auto(epoch, mels, batch.mel_lengths,
                                             batch.fids, "test")
    except Exception as e:  # reference swallows vocoder failures (train.py:314-318)
        print(f"Something wrong with the generated waveform: {e}")
    tester.draw_melspectrograms(epoch, mels, batch.mel_lengths, batch.fids,
                                "test")
    for k, a in ali.items():
        if a is None:
            continue
        tester.multi_draw_attention_alignments(
            np.asarray(a, np.float32), batch.texts, batch.text_lengths,
            batch.mel_lengths, epoch, batch.fids, f"test-{k}")
