"""Export a training workdir's latest Orbax checkpoint to a portable
single-file ``export.npz`` (utils/export.py) that ``cli.inference
--model_dir`` loads directly.

This is how trained artifacts survive /tmp-lifetime workdirs and get
committed/versioned: params + batch_stats + epoch, fp16-compressed by
default (~70 MB for the 34.7M-param LJ preset vs ~420 MB of Orbax state).
The reference's equivalent artifact is its published TF checkpoint
(reference inference.py:121-123, README pretrained models).

Usage:

    python scripts/export_checkpoint.py --model_dir WORKDIR/ckpt \
        [--out WORKDIR/ckpt/export.npz] [--store_dtype float16|float32]

Loading back for synthesis needs hparams.json next to the export (training
writes it into the ckpt dir; this script copies it when --out points
elsewhere).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vaenar_tts_tpu.utils.compile_cache import setup_compile_cache
setup_compile_cache()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True,
                    help="training workdir's ckpt/ (Orbax + hparams.json)")
    ap.add_argument("--out", default=None,
                    help="output path (default <model_dir>/export.npz)")
    ap.add_argument("--epoch", type=int, default=None,
                    help="export this persisted epoch instead of the newest "
                         "(checkpoint selection, ALIGNMENT.md)")
    ap.add_argument("--store_dtype", default="float16",
                    choices=("float16", "float32"),
                    help="storage dtype for floating leaves (restored to "
                         "the original training dtype on load)")
    args = ap.parse_args()

    from vaenar_tts_tpu.utils.export import export_model_dir

    out = export_model_dir(args.model_dir, args.out,
                           store_dtype=args.store_dtype, epoch=args.epoch)
    hp_src = os.path.join(args.model_dir, "hparams.json")
    hp_dst = os.path.join(os.path.dirname(os.path.abspath(out)),
                          "hparams.json")
    if os.path.exists(hp_src) and not os.path.samefile(
            os.path.dirname(os.path.abspath(out)),
            os.path.abspath(args.model_dir)):
        shutil.copy2(hp_src, hp_dst)
    size_mb = os.path.getsize(out) / 1e6
    print(f"exported {out} ({size_mb:.1f} MB, {args.store_dtype})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
