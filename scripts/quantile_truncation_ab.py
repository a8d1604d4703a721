"""Root-cause the measured quantile-length-head LER regression.

Round-4 A/B (ALIGNMENT.md): ``--length_source quantile`` — the learned p90
per-text length head built to stop tail truncations (PARITY.md deviation
14) — REGRESSED free-text LER (0.315 vs 0.283 at takes-1). Hypothesis
(VERDICT r4 item 4): the longer quantile length makes the decoder render
junk PAST the true content — frames the mean-length path would have
trimmed before the transcriber ever saw them — so the regression is
trailing-garbage insertions, not worse content.

Test: take the SAME texts synthesized by the real CLI under both length
sources (two scripts/freetext_toyv2_eval.py variant dirs, same checkpoint),
truncate each quantile render to its mean-render sibling's frame count, and
re-transcribe. If truncation recovers (or beats) the mean path's LER, the
hypothesis is confirmed: the head lengthens renders but the extra frames
are junk, so the feature is measured out rather than mistuned.

Usage (host-only; reads mels already on disk):

    python scripts/quantile_truncation_ab.py --workdir artifacts/toyv2_sNNN \
        [--mean_variant freetext] [--quantile_variant takes1_quantile]

Writes <workdir>/quantile_truncation_ab.json.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_variant(workdir: str, variant: str):
    d = os.path.join(workdir, variant)
    lines = [l.strip() for l in open(os.path.join(d, "lines.txt"))
             if l.strip()]
    paths = glob.glob(os.path.join(d, "test-*-*.npy"))
    epoch = max(int(p.rsplit("-", 2)[1]) for p in paths)
    paths = sorted((p for p in paths if int(p.rsplit("-", 2)[1]) == epoch),
                   key=lambda p: int(p.rsplit("-", 1)[1][:-4]))
    assert len(paths) == len(lines), (variant, len(paths), len(lines))
    return lines, [np.load(p) for p in paths], epoch


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--mean_variant", default="freetext")
    ap.add_argument("--quantile_variant", default="takes1_quantile")
    args = ap.parse_args()

    from vaenar_tts_tpu.configs import get_config
    from vaenar_tts_tpu.data.toy import ToyLetterDecoder, letter_error_rate

    hp = get_config("ljspeech")
    dec = ToyLetterDecoder(hp)

    texts_m, mels_m, ep_m = load_variant(args.workdir, args.mean_variant)
    texts_q, mels_q, ep_q = load_variant(args.workdir, args.quantile_variant)
    assert texts_m == texts_q, "variants must share lines.txt"
    assert ep_m == ep_q, f"variant epochs differ: {ep_m} vs {ep_q}"

    def ler(mel, text):
        hyp = dec.decode(mel)
        return letter_error_rate(hyp.replace(" ", ""), text.replace(" ", ""))

    rows = []
    for text, mm, qm in zip(texts_m, mels_m, mels_q):
        rows.append({
            "text": text,
            "len_mean": int(mm.shape[0]),
            "len_quantile": int(qm.shape[0]),
            "ler_mean": round(ler(mm, text), 3),
            "ler_quantile": round(ler(qm, text), 3),
            # the hypothesis test: quantile render cut to the mean length
            "ler_quantile_truncated": round(ler(qm[:mm.shape[0]], text), 3),
        })
        print(json.dumps(rows[-1]), flush=True)

    means = {k: round(float(np.mean([r[k] for r in rows])), 4)
             for k in ("ler_mean", "ler_quantile", "ler_quantile_truncated")}
    # confirmed iff truncation closes most of the regression: the quantile
    # path's extra error lives in the extra frames
    gap = means["ler_quantile"] - means["ler_mean"]
    recovered = means["ler_quantile"] - means["ler_quantile_truncated"]
    result = {
        "ckpt_epoch": ep_m,
        "n_texts": len(rows),
        **means,
        "regression": round(gap, 4),
        "recovered_by_truncation": round(recovered, 4),
        "hypothesis_confirmed": bool(gap > 0 and recovered >= 0.5 * gap),
        "rows": rows,
    }
    out = os.path.join(args.workdir, "quantile_truncation_ab.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "rows"}))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
