"""Neural vocoder training CLI (new capability; the reference vocodes only
via Griffin-Lim, audio/audio.py:95-102).

Toy-corpus run (procedural audio, no corpus needed):

    python -m vaenar_tts_tpu.cli.train_vocoder --dataset ljspeech \
        --toy --model_dir /path/vocoder --steps 5000

Real-corpus run (a directory of wav files, e.g. LJSpeech/wavs):

    python -m vaenar_tts_tpu.cli.train_vocoder --dataset ljspeech \
        --wav_dir /path/LJSpeech-1.1/wavs --model_dir /path/vocoder

The trained checkpoint plugs into synthesis with
``cli.inference --neural_vocoder /path/vocoder``.
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def main(argv=None) -> None:
    parser = argparse.ArgumentParser("Vocoder training parameters")
    parser.add_argument("--dataset", type=str, default="ljspeech",
                        choices=["ljspeech", "databaker"],
                        help="supplies the audio config (sample rate, STFT "
                             "geometry, mel chain)")
    parser.add_argument("--model_dir", type=str, required=True)
    parser.add_argument("--toy", action="store_true", default=False,
                        help="train on the procedural toy corpus")
    parser.add_argument("--wav_dir", type=str, default=None,
                        help="directory of training .wav files")
    parser.add_argument("--n_toy_utterances", type=int, default=64)
    parser.add_argument("--toy_version", type=int, default=1, choices=(1, 2),
                        help="1 = stationary tones; 2 = speech-like "
                             "(random tempo, coarticulation, declination, "
                             "noise floor)")
    parser.add_argument("--wav_limit", type=int, default=None)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--segment_frames", type=int, default=None)
    parser.add_argument("--hidden", type=int, default=None)
    parser.add_argument("--n_blocks", type=int, default=None)
    parser.add_argument("--learning_rate", type=float, default=None)
    parser.add_argument("--compute_dtype", type=str, default=None)
    parser.add_argument("--log_every", type=int, default=100)
    parser.add_argument("--save_every", type=int, default=2000)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    if bool(args.toy) == bool(args.wav_dir):
        parser.error("exactly one of --toy / --wav_dir is required")

    from ..utils.compile_cache import setup_compile_cache
    setup_compile_cache()

    from ..configs import get_config
    from ..models.vocoder import VocoderConfig
    from ..training.vocoder import (PairSampler, toy_utterances,
                                    train_vocoder, wav_dir_utterances)

    audio = get_config(args.dataset).audio
    cfg = VocoderConfig()
    overrides = {k: getattr(args, k) for k in
                 ("steps", "batch_size", "segment_frames", "hidden",
                  "n_blocks", "learning_rate", "compute_dtype")
                 if getattr(args, k) is not None}
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)

    if args.toy:
        utts = toy_utterances(audio, n=args.n_toy_utterances,
                              seed=args.seed, version=args.toy_version)
    else:
        utts = wav_dir_utterances(args.wav_dir, audio, limit=args.wav_limit)
    print(f"training on {len(utts)} utterances "
          f"({sum(len(u) for u in utts) / audio.sample_rate:.1f} s audio), "
          f"config: {cfg}")
    sampler = PairSampler(utts, audio, cfg.segment_frames, seed=args.seed)
    _, _, loss = train_vocoder(cfg, audio, sampler, args.model_dir,
                               log_every=args.log_every,
                               save_every=args.save_every, seed=args.seed)
    print(f"done: final loss {loss:.4f}; checkpoint in {args.model_dir}")


if __name__ == "__main__":
    main()
