"""Inference CLI (reference inference.py:84-168 ``inference_test`` and
:14-81 ``synthesize_from_text``).

Batch test-set synthesis with RTF accounting:

    python -m vaenar_tts_tpu.cli.inference --dataset ljspeech \
        --data_dir /path/features --model_dir /path/ckpt \
        --test_dir /path/out --batch_size 16 --temperature 0.6 \
        [--write_mels] [--write_wavs] [--draw_alignments]

Free-text synthesis:

    python -m vaenar_tts_tpu.cli.inference --dataset ljspeech \
        --text lines.txt --model_dir /path/ckpt --test_dir /path/out
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.export import TestUtils
from ..configs import get_config
from ..data.corpus import CORPORA
from ..data.loader import BucketedLoader, pad_to_multiple
from ..data.records import list_shards
from ..models.vaenar import VAENAR
from ..training.steps import init_model, make_inference_step
from ..utils.checkpoint import CheckpointManager


def load_model_state(hp, model_dir: str, compute_dtype: str | None = None,
                     epoch: int | None = None):
    """Restore the latest (or ``epoch``-pinned) checkpoint for synthesis
    (the reference's model-only expect_partial restore,
    inference.py:122-123). If the model dir carries an hparams.json
    (written by training), that resolved config wins over the CLI preset -
    checkpoints from --override runs restore exactly.

    ``epoch`` pins a specific persisted epoch instead of the newest one:
    checkpoint SELECTION is part of the product (the reference ships one
    hand-picked checkpoint, README.md:4; ALIGNMENT.md "Checkpoint
    selection" shows why the newest is not always the best).

    ``compute_dtype`` overrides the transformer compute dtype for synthesis
    only (params are stored fp32, so this is a free cast choice): measured
    on v5e, float32 synthesis is ~1.7x FASTER than bfloat16 at the shipped
    short shapes (the cast traffic around the fp32 flow outweighs MXU
    savings; scripts/perf_ab.py), while bfloat16 + the flash kernels win at
    long-form shapes (scripts/perf_longform.py)."""
    import dataclasses

    from ..configs.serialize import load_hparams
    saved = load_hparams(model_dir)
    if saved is not None:
        hp = saved
    if compute_dtype:
        hp = hp.replace(train=dataclasses.replace(
            hp.train, compute_dtype=compute_dtype))
    model = VAENAR(hp)
    params, batch_stats = init_model(hp, model, hp.train.random_seed,
                                     text_max=hp.dataset.text_bucket,
                                     mel_max=hp.dataset.mel_bucket)
    from ..training.steps import make_optimizer
    mgr = CheckpointManager(model_dir)
    full = {"params": params, "batch_stats": batch_stats, "epoch": 0,
            "opt_state": make_optimizer(hp).init(params)}
    r = mgr.restore(full, epoch=epoch)
    mgr.close()
    if r is None and epoch is not None:
        raise FileNotFoundError(f"no epoch-{epoch} checkpoint in {model_dir}")
    if r is None:
        # portable single-file export fallback (utils/export.py): how trained
        # artifacts are shipped/versioned without the Orbax workdir
        from ..utils.export import EXPORT_NAME, load_npz
        export_path = os.path.join(model_dir, EXPORT_NAME)
        if os.path.exists(export_path):
            import chex
            r = load_npz(export_path)
            chex.assert_trees_all_equal_structs(r["params"], params)
        else:
            raise FileNotFoundError(
                f"no checkpoint (Orbax) or {EXPORT_NAME} found in {model_dir}")
    return hp, model, r["params"], r["batch_stats"], int(r["epoch"])


def _resolve_length_source(source: str, hp) -> bool:
    """--length_source -> use_length_quantile. 'auto' reads the quantile
    head whenever the checkpoint was trained with one
    (hp.length_predictor.quantile > 0): that head exists precisely to stop
    free-text truncations (models/length_predictor.py), so a model that has
    it should use it by default."""
    q = float(getattr(hp.length_predictor, "quantile", 0.0))
    if source == "quantile":
        if not q:
            raise SystemExit(
                "--length_source quantile: this checkpoint was trained "
                "without a quantile head (hp.length_predictor.quantile == 0)")
        return True
    if source == "mean":
        return False
    return q > 0.0


def inference_test(args) -> None:
    hp = get_config(args.dataset)
    hp, model, params, batch_stats, epoch = load_model_state(
        hp, args.model_dir, compute_dtype=args.compute_dtype,
        epoch=args.ckpt_epoch)
    # constructing with the vocoder dir fails FAST on a broken/mismatched
    # vocoder — before the multi-minute model compile and synthesis pass
    tester = TestUtils(hp, args.test_dir,
                       neural_vocoder_dir=args.neural_vocoder)
    if args.draw_alignments:
        # alignments are not materialized on the fused attention path; swap
        # to the plots twin (identical params) when the user asks for them
        from ..training.steps import plots_variant
        model = VAENAR(plots_variant(hp))
    inf_step = make_inference_step(hp, model)
    r = hp.common.final_reduction_factor
    use_q = _resolve_length_source(args.length_source, hp)

    loader = BucketedLoader(list_shards(args.data_dir, "test"),
                            args.batch_size,
                            mel_bucket=hp.dataset.mel_bucket,
                            text_bucket=hp.dataset.text_bucket,
                            shuffle=False, seed=0)
    # static headroom: longest test mel + the reference's +80 pad, bucketed
    max_mel = pad_to_multiple(
        max(int(rr.mel_lens.max()) for rr in loader.readers) + 80,
        hp.dataset.mel_bucket)
    rng = jax.random.key(args.sample_seed)

    # warm-up compile, once per distinct bucketed shape, so the RTF loop
    # times pure synthesis (generalizes reference inference.py:146-147,
    # whose single-batch warm-up under-covers bucketed loaders). The census
    # enumerates the shapes without assembling batches; the loop stops as
    # soon as every shape is covered instead of packing the whole epoch
    unseen = {tm for (tm, _mm) in loader.shape_census()}
    for batch in loader.epoch(0):
        key = batch.texts.shape[1]
        if key not in unseen:
            continue
        unseen.discard(key)
        _, pred_w, _ = inf_step(
            params, batch_stats, jnp.asarray(batch.texts),
            jnp.asarray(batch.text_lengths), rng, reduction_factor=r,
            max_mel_length=max_mel, temperature=args.temperature,
            length_headroom=args.length_headroom, use_length_quantile=use_q)
        # force the compile to FINISH here: on async backends (the tunnel)
        # the dispatch returns while the remote compile is still running,
        # and without this pull the first timed batch absorbs it
        np.asarray(pred_w)
        if not unseen:
            break

    time_consumed = 0.0
    durations = 0.0
    for batch in loader.epoch(0):
        t0 = time.time()
        mels, pred_lens, ali = inf_step(
            params, batch_stats, jnp.asarray(batch.texts),
            jnp.asarray(batch.text_lengths), rng, reduction_factor=r,
            max_mel_length=max_mel, temperature=args.temperature,
            length_headroom=args.length_headroom, use_length_quantile=use_q)
        # sync on the [B]-int32 lengths pull: block_until_ready returns
        # before execution completes on tunnel-attached devices, and a
        # same-program output pull is the cheapest true barrier. RTF still
        # times device synthesis only (the reference also excludes the big
        # mel pull: its .numpy() happens inside write_mels,
        # inference.py:152-157)
        pred_lens = np.asarray(pred_lens)
        time_consumed += time.time() - t0
        mels = np.asarray(mels, np.float32)
        durations += (pred_lens[:batch.n_valid].sum()
                      * hp.audio.frame_shift_sample / hp.audio.sample_rate)
        ids = batch.fids[:batch.n_valid]
        if args.write_mels:
            tester.write_mels(epoch, mels[:batch.n_valid],
                              pred_lens[:batch.n_valid], ids, prefix="prior")
        if args.write_wavs:
            if args.neural_vocoder:
                tester.synthesize_and_save_wavs_neural(
                    epoch, mels[:batch.n_valid], pred_lens[:batch.n_valid],
                    ids, args.neural_vocoder, prefix="prior")
            elif args.stream_wavs:
                # --jax_vocoder/--host_vocoder steer the streaming GL
                # window backend too; default probes the device
                sb = ("device" if args.jax_vocoder
                      else "host" if args.host_vocoder else "auto")
                _, ttfas = tester.synthesize_and_save_wavs_streaming(
                    epoch, mels[:batch.n_valid], pred_lens[:batch.n_valid],
                    ids, prefix="prior", backend=sb)
                print(f"streaming vocoder: time-to-first-audio "
                      f"mean {np.mean(ttfas):.3f}s max {np.max(ttfas):.3f}s "
                      f"over {len(ttfas)} utterances")
            else:
                if args.jax_vocoder:
                    synth = tester.synthesize_and_save_wavs_jax
                elif args.host_vocoder:
                    synth = tester.synthesize_and_save_wavs
                else:  # capability probe: device GL on direct-attached TPUs
                    synth = tester.synthesize_and_save_wavs_auto
                synth(epoch, mels[:batch.n_valid], pred_lens[:batch.n_valid],
                      ids, prefix="prior")
        if args.draw_alignments:
            for k, a in ali.items():
                if a is None:
                    continue
                tester.multi_draw_attention_alignments(
                    np.asarray(a, np.float32)[:batch.n_valid], batch.texts,
                    batch.text_lengths, pred_lens, epoch, ids,
                    prefix=f"prior-{k}")
    rtf = time_consumed / max(durations, 1e-9)
    print(f"Total time consumed is {time_consumed:.3f} Secs, "
          f"total synthesis duration is {durations:.3f} Secs, "
          f"Average RTF is {rtf:.5f}.")


def synthesize_from_text(args) -> None:
    hp = get_config(args.dataset)
    hp, model, params, batch_stats, epoch = load_model_state(
        hp, args.model_dir, compute_dtype=args.compute_dtype,
        epoch=args.ckpt_epoch)
    tester = TestUtils(hp, args.test_dir)
    from ..training.steps import plots_variant
    inf_step = make_inference_step(hp, VAENAR(plots_variant(hp)))
    r = hp.common.final_reduction_factor
    use_q = _resolve_length_source(args.length_source, hp)
    corpus = CORPORA[args.dataset](None, None, hp)

    texts, text_lens = [], []
    with open(args.text) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            seq = corpus.text_to_array(line)
            texts.append(seq)
            text_lens.append(len(seq))
    ids = [str(i) for i in range(len(texts))]
    text_max = pad_to_multiple(max(text_lens), hp.dataset.text_bucket)
    batch = np.zeros((len(texts), text_max), np.int32)
    for i, t in enumerate(texts):
        batch[i, :len(t)] = t
    # generous static mel headroom from the len ratio
    max_mel = pad_to_multiple(
        int(text_max * hp.common.mel_text_len_ratio * 2) + 160,
        hp.dataset.mel_bucket)
    from ..utils.metrics import alignment_diagonality

    # Per-take temperatures: takes cycle through --takes_temperatures when
    # given (temperature-diverse ensembling — a broader z spread for the
    # coverage-ranked selection to pick from), else every take samples at
    # --temperature. Temperature is a TRACED scalar in the jitted step
    # (training/steps.py:294-300), so varying it per take costs no recompile.
    take_temps = ([float(x) for x in args.takes_temperatures.split(",")]
                  if args.takes_temperatures else [args.temperature])

    def run_take(t: int):
        mels_t, lens_t, ali_t = inf_step(
            params, batch_stats, jnp.asarray(batch),
            jnp.asarray(np.asarray(text_lens, np.int32)),
            jax.random.fold_in(jax.random.key(args.sample_seed), t),
            reduction_factor=r, max_mel_length=max_mel,
            temperature=take_temps[t % len(take_temps)],
            length_headroom=args.length_headroom, use_length_quantile=use_q)
        # copies: np.asarray of a device array can be a read-only view, and
        # multi-take selection assigns into these buffers per utterance
        return (np.array(mels_t, np.float32), np.array(lens_t),
                {k: np.array(a, np.float32) for k, a in ali_t.items()
                 if a is not None})

    takes = max(1, args.takes)
    mels, pred_lens, ali = run_take(0)
    if takes > 1 and args.take_score == "medoid":
        # Content-aware selection (utils/metrics.py::medoid_take): keep, per
        # line, the take spectrally closest (DTW-MCD) to the rest of the
        # ensemble. Breakdown takes are outliers their siblings expose; the
        # attention-based score below saturates on trained models and cannot
        # rank them (ALIGNMENT.md "take selection").
        from ..utils.metrics import medoid_take
        all_takes = [(mels, pred_lens, ali)]
        all_takes += [run_take(t) for t in range(1, takes)]
        chosen = np.zeros(len(texts), np.int32)
        spreads = []
        for b in range(len(texts)):
            cand = [tk[0][b][: max(int(tk[1][b]), 1)] for tk in all_takes]
            idx, dmat = medoid_take(cand)
            chosen[b] = idx
            spreads.append(float(dmat.sum()
                                 / max(dmat.size - len(cand), 1)))
            mels[b] = all_takes[idx][0][b]
            pred_lens[b] = all_takes[idx][1][b]
            for k in ali:
                ali[k][b] = all_takes[idx][2][k][b]
        temps_note = (f" at temperatures {take_temps}"
                      if len(take_temps) > 1 else "")
        print(f"medoid take selection over {takes} z-samples{temps_note}: "
              f"chosen takes {chosen.tolist()}, mean pairwise DTW-MCD (dB) "
              f"{np.round(spreads, 2).tolist()}")
    elif takes > 1:
        # Multi-take selection, REFERENCE-FREE: prior sampling is stochastic
        # (temperature > 0), and the decoder's own cross-attention is a
        # quality signal that needs no ground truth — a take whose alignment
        # wandered is a take whose synthesis broke. Synthesize `takes`
        # z-samples per line and keep, per line, the best-scoring take.
        # (Lengths are deterministic given text, so takes differ only in z.)
        # Score = diagonality − (1 − text coverage): on a trained model
        # diagonality saturates across takes (measured ~0.997 each,
        # ALIGNMENT.md), so the coverage term — the fraction of text tokens
        # the decoder actually attended — breaks the tie toward the take
        # that rendered the whole text instead of one with a truncated tail
        # or a skipped token mid-utterance.
        def scores_of(lens_t, ali_t):
            s = np.full(len(texts), -3.0)
            for a in ali_t.values():
                for b in range(len(texts)):
                    red = -(-int(lens_t[b]) // r)
                    m = alignment_diagonality(a[b], red, int(text_lens[b]))
                    s[b] = max(s[b],
                               m["diagonality"] - (1.0 - m["coverage"]))
            return s

        best_scores = scores_of(pred_lens, ali)
        chosen = np.zeros(len(texts), np.int32)
        for t in range(1, takes):
            mels_t, lens_t, ali_t = run_take(t)
            s_t = scores_of(lens_t, ali_t)
            better = s_t > best_scores
            for b in np.nonzero(better)[0]:
                mels[b] = mels_t[b]
                pred_lens[b] = lens_t[b]
                for k in ali:
                    ali[k][b] = ali_t[k][b]
                best_scores[b] = s_t[b]
                chosen[b] = t
        temps_note = (f" at temperatures {take_temps}"
                      if len(take_temps) > 1 else "")
        print(f"take selection over {takes} z-samples{temps_note}: chosen "
              f"takes {chosen.tolist()}, score (diagonality - coverage miss) "
              f"{np.round(best_scores, 3).tolist()}")
    if args.write_mels:
        tester.write_mels(epoch, mels, pred_lens, ids, prefix="test")
    tester.synthesize_and_save_wavs(epoch, mels, pred_lens, ids, prefix="test")
    for k, a in ali.items():
        tester.multi_draw_attention_alignments(
            a, batch, np.asarray(text_lens),
            pred_lens, epoch, ids, prefix=f"prior-{k}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser("Inference parameters parser")
    parser.add_argument("--dataset", type=str, required=True,
                        choices=["ljspeech", "databaker"])
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--text", type=str, default=None,
                        help="file of lines to synthesize (free-text mode)")
    parser.add_argument("--model_dir", type=str, required=True)
    parser.add_argument("--ckpt_epoch", type=int, default=None,
                        help="restore this persisted epoch instead of the "
                             "newest one (checkpoint selection: see "
                             "ALIGNMENT.md 'Checkpoint selection')")
    parser.add_argument("--test_dir", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=1)
    # DELIBERATE DEVIATION from the reference default of 0.0 (reference
    # inference.py:24): temperature 0 feeds the decoder the zero-noise
    # latent, which is degenerate — the decoder never sees a zero-variance
    # z in training, and on a fully trained model its alignment collapses
    # only there (measured: ALIGNMENT.md "Temperature"; any value >= 0.33
    # restores it). 0.6 samples the prior the decoder was trained against.
    parser.add_argument("--temperature", type=float, default=0.6)
    # DELIBERATE DEVIATION from the reference's hard-coded +80 (reference
    # inference.py:136): a NAR attention decoder renders the whole text
    # within whatever z-length it gets, so headroom never rescues content —
    # it only appends junk frames the prior never trained to produce
    # (measured: PARITY.md deviation 13). --length_headroom 80 restores
    # exact reference behavior.
    parser.add_argument("--length_headroom", type=int, default=0)
    parser.add_argument("--length_source", type=str, default="auto",
                        choices=["auto", "mean", "quantile"],
                        help="which length-predictor head drives synthesis "
                             "length: 'mean' = reference behavior, "
                             "'quantile' = the trained p-quantile head "
                             "(learned per-text headroom against truncation; "
                             "requires hp.length_predictor.quantile > 0 at "
                             "train time), 'auto' = quantile when the "
                             "checkpoint has one")
    parser.add_argument("--sample_seed", type=int, default=0,
                        help="PRNG seed for prior sampling (temperature > 0 "
                             "synthesis is stochastic; vary for different "
                             "takes of the same text)")
    parser.add_argument("--takes", type=int, default=1,
                        help="free-text mode: synthesize this many z-samples "
                             "per line and keep the one whose decoder cross-"
                             "attention is most monotonic AND covers the "
                             "whole text (reference-free quality selection; "
                             "each extra take is one cheap device pass)")
    parser.add_argument("--take_score", type=str, default="coverage",
                        choices=["coverage", "medoid"],
                        help="multi-take selection rule: 'coverage' ranks by "
                             "decoder-attention diagonality minus text-"
                             "coverage miss (reference-free, saturates on "
                             "trained models); 'medoid' keeps the take "
                             "spectrally closest (pairwise DTW-MCD) to the "
                             "other takes — content breakdowns are ensemble "
                             "outliers (utils/metrics.py::medoid_take)")
    parser.add_argument("--takes_temperatures", type=str, default=None,
                        help="free-text mode with --takes > 1: comma list of "
                             "prior temperatures the takes cycle through "
                             "(e.g. '0.4,0.6,0.8') — temperature-diverse "
                             "ensembling widens the z spread the coverage-"
                             "ranked selection picks from; default: every "
                             "take uses --temperature")
    parser.add_argument("--write_mels", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="write trimmed mel .npy artifacts (default on; "
                             "--no-write_mels disables)")
    parser.add_argument("--write_wavs", action="store_true", default=False)
    parser.add_argument("--draw_alignments", action="store_true",
                        default=False)
    parser.add_argument("--jax_vocoder", action="store_true", default=False,
                        help="force batched on-device Griffin-Lim (default: "
                             "capability probe picks it on TPUs — validated "
                             "~25x the host path, VOCODER.md — and falls "
                             "back to host threads on CPU backends; "
                             "VAENAR_JAX_VOCODER=0/1 overrides)")
    parser.add_argument("--host_vocoder", action="store_true", default=False,
                        help="force the threaded host NumPy Griffin-Lim")
    parser.add_argument("--stream_wavs", action="store_true", default=False,
                        help="vocode in streaming chunks (chunked Griffin-Lim "
                             "with phase propagation) and report "
                             "time-to-first-audio")
    parser.add_argument("--neural_vocoder", type=str, default=None,
                        help="directory of a trained neural ISTFT-head "
                             "vocoder (cli.train_vocoder); vocodes the whole "
                             "batch in one device pass instead of "
                             "Griffin-Lim")
    parser.add_argument("--compute_dtype", type=str, default=None,
                        choices=["float32", "bfloat16"],
                        help="override the transformer compute dtype for "
                             "synthesis (params are fp32; free cast choice). "
                             "Measured: float32 is ~1.7x faster at the "
                             "shipped short shapes, bfloat16 wins long-form")
    args = parser.parse_args(argv)

    # persistent XLA compilation cache: restarts skip the 1-2 min compiles
    from ..utils.compile_cache import setup_compile_cache
    setup_compile_cache()
    os.makedirs(args.test_dir, exist_ok=True)
    if args.text:
        synthesize_from_text(args)
    else:
        if not args.data_dir:
            parser.error("--data_dir required for test-set inference")
        inference_test(args)


if __name__ == "__main__":
    main()
