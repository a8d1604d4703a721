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

TPU notes: the probe builds ONE jitted inference step with static shapes
(text/mel bucket-padded) on first call and reuses it for every subsequent
probe — one extra compile per training process, then each probe is a single
device pass. Transcription is host-side numpy.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

import numpy as np

__all__ = ["make_toy_ler_probe"]


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
        return {"probe_ler": ler}

    return probe
