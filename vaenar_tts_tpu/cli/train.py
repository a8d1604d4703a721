"""Training CLI (reference train.py:35-329).

    python -m vaenar_tts_tpu.cli.train --dataset ljspeech \
        --data_dir /path/features --model_dir /path/ckpt \
        --log_dir /path/logs [--test_dir /path/test]
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np

from ..configs import get_config
from ..configs.overrides import apply_overrides
from ..configs.serialize import load_hparams
from ..training.loop import train
from ..utils.logging import Logger


def set_global_determinism(seed: int) -> None:
    # reference train.py:17-32; JAX is deterministic given explicit keys,
    # host-side RNGs still get seeded.
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser("Training parameters parser")
    parser.add_argument("--dataset", type=str, required=True,
                        choices=["ljspeech", "databaker"])
    parser.add_argument("--data_dir", type=str, required=True,
                        help="record shard directory")
    parser.add_argument("--model_dir", type=str, required=True,
                        help="directory to save model checkpoints")
    parser.add_argument("--log_dir", type=str, required=True)
    parser.add_argument("--test_dir", type=str, default=None)
    parser.add_argument("--max_epochs", type=int, default=None,
                        help="run through epoch N inclusive (the preset "
                             "epoch count keeps the reference's exclusive "
                             "range semantics)")
    parser.add_argument("--steps_per_epoch", type=int, default=None,
                        help="truncate epochs (smoke tests)")
    parser.add_argument("--log_every", type=int, default=50,
                        help="per-step console loss cadence")
    parser.add_argument("--compute_dtype", type=str, default=None,
                        choices=["float32", "bfloat16"])
    parser.add_argument("--override", action="append", default=[],
                        metavar="key.path=value",
                        help="config override, e.g. prior.n_blk=12 "
                             "(repeatable; enables flow-depth ablations)")
    parser.add_argument("--neural_vocoder", type=str, default=None,
                        help="trained ISTFT-head vocoder dir "
                             "(cli.train_vocoder); test-interval wav "
                             "artifacts then use it instead of Griffin-Lim")
    parser.add_argument("--distributed", action="store_true", default=False,
                        help="multi-host: jax.distributed.initialize() and "
                             "shard input batches by process")
    parser.add_argument("--probe", type=str, default="none",
                        choices=["none", "dev_mcd", "toy_ler"],
                        help="in-training product-metric probe on the "
                             "checkpoint cadence (training/probe.py): "
                             "'dev_mcd' synthesizes a fixed dev subset "
                             "through the real inference path and logs "
                             "DTW-MCD vs ground truth + decoder diagonality "
                             "(checkpoint selection for real corpora); "
                             "'toy_ler' transcribes held-out toy-v2 "
                             "free text (toy corpus only). Each improving "
                             "probe also persists export_best.npz")
    parser.add_argument("--probe_every", type=int, default=50,
                        help="probe cadence in epochs (with --probe)")
    parser.add_argument("--stop_probe", type=float, default=0.0,
                        help="early-stop when the probe metric (dev_mcd: "
                             "MCD-DTW dB; toy_ler: LER) lands at or under "
                             "this (0 = never stop)")
    args = parser.parse_args(argv)

    # persistent XLA compilation cache: restarts skip the 1-2 min compiles
    from ..utils.compile_cache import setup_compile_cache
    setup_compile_cache()

    import jax

    dist = None
    if args.distributed:
        from ..parallel.distributed import DistContext, initialize_from_env
        initialize_from_env()
        if jax.process_count() > 1:
            dist = DistContext()
            print(f"distributed: process {dist.process_index}/"
                  f"{dist.process_count}, {len(jax.devices())} global devices")

    # Resume: if the model_dir already holds a checkpoint, the persisted
    # hparams.json is the base config, so a bare re-invocation restores the
    # exact trained architecture without repeating every --override (the
    # reference re-derives config from code on every run, train.py:50).
    saved = load_hparams(args.model_dir)
    has_ckpt = saved is not None and any(
        e.isdigit() for e in os.listdir(args.model_dir))
    if has_ckpt:
        hparams = saved
        print(f"Resuming with persisted hparams.json from {args.model_dir}")
    else:
        hparams = get_config(args.dataset)
    if args.compute_dtype:
        hparams = apply_overrides(
            hparams, [f"train.compute_dtype={args.compute_dtype}"])
    hparams = apply_overrides(hparams, args.override)
    set_global_determinism(hparams.train.random_seed)

    os.makedirs(args.model_dir, exist_ok=True)
    os.makedirs(args.log_dir, exist_ok=True)
    Logger(args.log_dir).install()

    probe = None
    if args.probe != "none":
        from ..training.probe import (make_dev_mcd_probe, make_toy_ler_probe,
                                      with_early_stop)
        probe_dir = os.path.dirname(os.path.abspath(args.model_dir))
        if args.probe == "dev_mcd":
            probe = make_dev_mcd_probe(hparams, args.data_dir, probe_dir)
            metric = "probe_mcd_dtw"
        else:
            probe = make_toy_ler_probe(hparams, probe_dir)
            metric = "probe_ler"
        if args.stop_probe > 0:
            probe = with_early_stop(probe, metric, args.stop_probe, probe_dir)

    train(hparams, args.data_dir, args.model_dir, args.log_dir,
          test_dir=args.test_dir, max_epochs=args.max_epochs,
          steps_per_epoch=args.steps_per_epoch, log_every=args.log_every,
          dist=dist, neural_vocoder_dir=args.neural_vocoder,
          probe=probe, probe_every=args.probe_every)


if __name__ == "__main__":
    main()
