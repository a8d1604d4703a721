"""Corpus preprocessing CLI (reference preprocess.py:13-61).

    python -m vaenar_tts_tpu.cli.preprocess --dataset ljspeech \
        --data_dir /path/LJSpeech-1.1 --save_dir /path/features \
        --record_split 8

Runs text analysis + split + mel extraction, writes sharded .vrs records,
then smoke-prints one batch's shapes (reference preprocess.py:33-61).
"""

from __future__ import annotations

import argparse

from ..configs import get_config
from ..data.corpus import CORPORA
from ..data.loader import BucketedLoader
from ..data.records import RecordWriter, list_shards


def main(argv=None) -> None:
    parser = argparse.ArgumentParser("Preprocessing parameters parser")
    parser.add_argument("--dataset", type=str, required=True,
                        choices=["ljspeech", "databaker"])
    parser.add_argument("--data_dir", type=str, required=True,
                        help="corpus root directory")
    parser.add_argument("--save_dir", type=str, required=True,
                        help="directory to save features and records")
    parser.add_argument("--record_split", type=int, default=8,
                        help="number of train record shards")
    parser.add_argument("--num_workers", type=int, default=None)
    parser.add_argument("--mel_dtype", type=str, default="float32",
                        choices=["float32", "float16"],
                        help="record storage dtype for mels (float16 halves "
                             "shard size; loader upcasts to float32)")
    parser.add_argument("--device_mels", action="store_true", default=False,
                        help="batched mel extraction on the accelerator "
                             "instead of host multiprocessing "
                             "(validated on the CPU backend; tunnel-attached "
                             "TPUs in this environment can be unstable "
                             "with large one-off programs)")
    args = parser.parse_args(argv)

    hps = get_config(args.dataset)
    corpus = CORPORA[args.dataset](args.data_dir, args.save_dir, hps)
    corpus.feature_extraction(num_workers=args.num_workers,
                              use_device=args.device_mels)

    print("Writing sharded records...")
    writer = RecordWriter(args.save_dir, args.save_dir,
                          train_split=args.record_split,
                          num_mels=hps.audio.num_mels,
                          mel_dtype=args.mel_dtype)
    paths = writer.write_all()
    for mode, ps in paths.items():
        print(f"  {mode}: {len(ps)} shard(s)")

    # smoke test: one batch of shapes (reference preprocess.py:33-61)
    loader = BucketedLoader(list_shards(args.save_dir, "train"),
                            hps.train.train_batch_size,
                            mel_bucket=hps.dataset.mel_bucket,
                            text_bucket=hps.dataset.text_bucket,
                            seed=hps.train.random_seed)
    batch = next(iter(loader))
    print("sample batch:",
          "texts", batch.texts.shape, "mels", batch.mels.shape,
          "text_lens", batch.text_lengths[:4], "mel_lens",
          batch.mel_lengths[:4])
    print("distinct static shapes:", loader.shape_census())


if __name__ == "__main__":
    main()
