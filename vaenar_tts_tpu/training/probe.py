"""In-training product-metric probes.

Round-4 finding (ALIGNMENT.md "Checkpoint selection"): alignment formation
in VAENAR-style models is run- and epoch-sensitive — free-text LER
oscillates 0.30→0.98 across late checkpoints of the same run. The reference
sidesteps this by shipping ONE hand-picked checkpoint
(reference README.md:4) and never defends a selection rule. Here the
selection rule is the product metric itself, measured DURING training: a
probe callback runs on the checkpoint cadence, synthesizes held-out
free-form texts through the real inference path (prior sample + PREDICTED
lengths — reference inference.py:14-81), transcribes the mels back to
letters (data/toy.py::ToyLetterDecoder), and appends the letters-only LER
to ``<workdir>/ler_probe.jsonl``. A finished run therefore carries its own
checkpoint-selection sweep (scripts/freetext_epoch_sweep.py computes the
same number post hoc at ~15 min of extra chip time per run).

Durability (round-5): every probe that IMPROVES the running best also
writes a portable fp16 ``export_best.npz`` (+ ``export_best.json`` sidecar)
to the workdir. Orbax retention (max_to_keep=20 / keep-every-4h) can
garbage-collect early probed epochs on a long run, and a tunnel wedge or
OOM can kill the process before any end-of-run export — the running-best
export makes the best-probed weights durable the moment they exist, no
matter how the run ends. Cost: one host-side ~60 MB compressed write per
improvement (a strictly decreasing-minimum sequence — a handful per run).

``make_dev_mcd_probe`` is the real-corpus variant: it synthesizes a fixed
dev-set subset through the real inference path (predicted lengths, prior
sample) and logs DTW-aligned MCD vs the ground-truth mels plus decoder
diagonality — the checkpoint-selection metric for LJSpeech/DataBaker runs
where no toy transcriber exists (the quantitative version of the reference's
eyeballed every-50-epochs test synthesis, reference train.py:309-325).

TPU notes: each probe builds ONE jitted inference step with static shapes
(text/mel bucket-padded) on first call and reuses it for every subsequent
probe — one extra compile per training process, then each probe is a single
device pass. Transcription/metrics are host-side numpy.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

import numpy as np

__all__ = ["make_toy_ler_probe", "make_dev_mcd_probe", "with_early_stop"]


class _BestExporter:
    """Persist the running-best probed checkpoint as a portable export.

    Tracks the minimum of ``metric`` seen so far (resuming from the
    ``jsonl`` history, so a restarted chunk does not clobber a better
    export from an earlier chunk) and writes ``export_best.npz`` +
    ``export_best.json`` whenever a probe improves on it.
    """

    def __init__(self, out_dir: str, metric: str, jsonl_name: str):
        self.out_dir = out_dir
        self.metric = metric
        self.best = float("inf")
        hist = os.path.join(out_dir, jsonl_name)
        side = os.path.join(out_dir, "export_best.json")
        # only trust history as "already exported" if the export exists
        if os.path.exists(side) and os.path.exists(
                os.path.join(out_dir, "export_best.npz")):
            try:
                self.best = float(json.load(open(side))[metric])
            except Exception:
                pass
        elif os.path.exists(hist) and os.path.exists(
                os.path.join(out_dir, "export_best.npz")):
            try:
                rows = [json.loads(l) for l in open(hist)]
                self.best = min(float(r[metric]) for r in rows)
            except Exception:
                pass

    def maybe_export(self, epoch: int, state, value: float) -> bool:
        if not np.isfinite(value) or value >= self.best:
            return False
        from ..utils.export import save_npz
        self.best = float(value)
        save_npz(os.path.join(self.out_dir, "export_best.npz"),
                 {"params": state.params, "batch_stats": state.batch_stats,
                  "epoch": epoch})
        with open(os.path.join(self.out_dir, "export_best.json"), "w") as f:
            json.dump({"epoch": epoch, self.metric: round(value, 4)}, f)
        return True


def with_early_stop(probe: Callable, metric: str, target: float,
                    workdir: str) -> Callable:
    """Wrap a probe so training stops once ``metric`` lands at or under
    ``target``. Also drops a ``PROBE_STOP`` sentinel file so restart-on-death
    drivers (scripts/resume_train_until.sh, chip queues) do not relaunch a
    run that already found its winning epoch."""
    def wrapped(epoch, state):
        scalars = probe(epoch, state)
        if scalars and scalars.get(metric, float("inf")) <= target:
            scalars["stop_training"] = True
            with open(os.path.join(workdir, "PROBE_STOP"), "w") as f:
                f.write(f"{epoch} {metric}={scalars[metric]:.4f}\n")
        return scalars
    return wrapped


def make_toy_ler_probe(hp, out_dir: str, n_texts: int = 8,
                       text_seed: int = 4242, sample_seeds: int = 2,
                       temperature: float = 0.6
                       ) -> Callable[[int, object], Optional[Dict[str, float]]]:
    """Build a ``probe(epoch, state) -> {"probe_ler": ...}`` callback for
    ``training.loop.train``.

    Held-out texts come from the same generator + seed as
    scripts/freetext_toyv2_eval.py so in-training probe numbers are
    comparable to the offline eval tables. ``sample_seeds`` prior draws are
    averaged per probe (stochastic synthesis — less selection noise).
    Everything heavy (model, jit, decoder) is built lazily on the first
    call so constructing the callback is free.
    """
    state_box: dict = {}

    def _build():
        import jax
        import jax.numpy as jnp

        from ..configs import get_config  # noqa: F401  (doc parity import)
        from ..data.corpus import CORPORA
        from ..data.loader import pad_to_multiple
        from ..data.toy import ToyLetterDecoder, letter_error_rate, random_text
        from ..models.vaenar import VAENAR
        from .steps import make_inference_step

        model = VAENAR(hp)
        inf_step = make_inference_step(hp, model)
        r = hp.common.final_reduction_factor
        dec = ToyLetterDecoder(hp)
        corpus = CORPORA["ljspeech"](None, None, hp)

        rng = np.random.default_rng(text_seed)
        texts = [random_text(rng) for _ in range(n_texts)]
        seqs = [corpus.text_to_array(t) for t in texts]
        text_lens = np.asarray([len(s) for s in seqs], np.int32)
        text_max = pad_to_multiple(int(text_lens.max()),
                                   hp.dataset.text_bucket)
        batch = np.zeros((len(texts), text_max), np.int32)
        for i, s in enumerate(seqs):
            batch[i, :len(s)] = s
        max_mel = pad_to_multiple(
            int(text_max * hp.common.mel_text_len_ratio * 2) + 160,
            hp.dataset.mel_bucket)

        batch = jnp.asarray(batch)
        tl = jnp.asarray(text_lens)

        def mean_ler(params, batch_stats) -> float:
            vals = []
            for sseed in range(sample_seeds):
                mels, lens, _ = inf_step(
                    params, batch_stats, batch, tl, jax.random.key(sseed),
                    reduction_factor=r, max_mel_length=max_mel,
                    temperature=temperature, length_headroom=0,
                    use_length_quantile=False)
                mels = np.asarray(mels, np.float32)
                lens = np.asarray(lens)
                for b, text in enumerate(texts):
                    hyp = dec.decode(mels[b, :max(int(lens[b]), 1)])
                    vals.append(letter_error_rate(hyp.replace(" ", ""),
                                                  text.replace(" ", "")))
            return float(np.mean(vals))

        return mean_ler

    exporter = _BestExporter(out_dir, "probe_ler", "ler_probe.jsonl")

    def probe(epoch: int, state) -> Optional[Dict[str, float]]:
        if "mean_ler" not in state_box:
            state_box["mean_ler"] = _build()
        ler = state_box["mean_ler"](state.params, state.batch_stats)
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "ler_probe.jsonl"), "a") as f:
            f.write(json.dumps({"epoch": epoch,
                                "probe_ler": round(ler, 4),
                                "n_texts": n_texts,
                                "sample_seeds": sample_seeds,
                                "temperature": temperature}) + "\n")
        if exporter.maybe_export(epoch, state, ler):
            print(f"  probe: new best LER {ler:.4f} at epoch {epoch} -> "
                  f"export_best.npz")
        return {"probe_ler": ler}

    return probe


def make_dev_mcd_probe(hp, data_dir: str, out_dir: str, n_utts: int = 8,
                       sample_seeds: int = 1, temperature: float = 0.6,
                       frame_stride: int = 2
                       ) -> Callable[[int, object], Optional[Dict[str, float]]]:
    """Real-corpus probe: ``probe(epoch, state) -> {"probe_mcd_dtw": ...,
    "probe_diag": ...}``.

    Synthesizes the first ``n_utts`` dev utterances through the REAL
    inference path (prior sample at ``temperature``, PREDICTED lengths —
    reference inference.py:129-142) and scores DTW-aligned MCD against the
    ground-truth mels (timing-invariant: the prior legitimately picks its
    own durations) plus the inference-path decoder diagonality. Lower
    MCD-DTW = better checkpoint; this is the selection metric for corpora
    with no toy transcriber (LJSpeech/DataBaker, reference
    configs/hparams.py:236-238).

    ``frame_stride`` subsamples frames before the O(T^2) host-side DTW —
    checkpoint RANKING is insensitive to it, and stride 2 keeps a probe of
    8 LJSpeech-scale utterances under ~2 s of host time.
    """
    state_box: dict = {}

    def _build():
        import jax
        import jax.numpy as jnp

        from ..data.loader import BucketedLoader, pad_to_multiple
        from ..data.records import list_shards
        from ..models.vaenar import VAENAR
        from .steps import make_inference_step, plots_variant

        loader = BucketedLoader(
            list_shards(data_dir, "dev"), n_utts,
            mel_bucket=hp.dataset.mel_bucket,
            text_bucket=hp.dataset.text_bucket, shuffle=False, seed=0)
        batch = next(iter(loader.epoch(0)))
        # plots twin: identical params, materializes the decoder alignments
        model = VAENAR(plots_variant(hp))
        inf_step = make_inference_step(hp, model)
        r = hp.common.final_reduction_factor
        max_mel = pad_to_multiple(batch.mels.shape[1] + 80,
                                  hp.dataset.mel_bucket)
        texts_d = jnp.asarray(batch.texts)
        tlens_d = jnp.asarray(batch.text_lengths)

        def measure(params, batch_stats) -> Dict[str, float]:
            from ..utils.metrics import (alignment_diagonality, mcd_dtw)
            mcds, diags = [], []
            for sseed in range(sample_seeds):
                mels, lens, ali = inf_step(
                    params, batch_stats, texts_d, tlens_d,
                    jax.random.key(sseed), reduction_factor=r,
                    max_mel_length=max_mel, temperature=temperature,
                    length_headroom=0, use_length_quantile=False)
                mels = np.asarray(mels, np.float32)
                lens = np.asarray(lens)
                ali_h = {k: np.asarray(a, np.float32)
                         for k, a in ali.items() if a is not None}
                for b in range(batch.n_valid):
                    pl = max(int(lens[b]), frame_stride)
                    gt = batch.mels[b][: int(batch.mel_lengths[b])]
                    mcds.append(mcd_dtw(mels[b, :pl:frame_stride],
                                        gt[::frame_stride]))
                    red = -(-pl // r)
                    d = max((alignment_diagonality(
                        a[b], red, int(batch.text_lengths[b]))["diagonality"]
                        for a in ali_h.values()), default=-1.0)
                    diags.append(d)
            return {"probe_mcd_dtw": float(np.mean(mcds)),
                    "probe_diag": float(np.mean(diags))}

        return measure

    exporter = _BestExporter(out_dir, "probe_mcd_dtw", "mcd_probe.jsonl")

    def probe(epoch: int, state) -> Optional[Dict[str, float]]:
        if "measure" not in state_box:
            state_box["measure"] = _build()
        scalars = state_box["measure"](state.params, state.batch_stats)
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "mcd_probe.jsonl"), "a") as f:
            f.write(json.dumps(dict(
                epoch=epoch, n_utts=n_utts, sample_seeds=sample_seeds,
                temperature=temperature,
                **{k: round(v, 4) for k, v in scalars.items()})) + "\n")
        if exporter.maybe_export(epoch, state, scalars["probe_mcd_dtw"]):
            print(f"  probe: new best MCD-DTW "
                  f"{scalars['probe_mcd_dtw']:.3f} dB at epoch {epoch} -> "
                  f"export_best.npz")
        return scalars

    return probe
