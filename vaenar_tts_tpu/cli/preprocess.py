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
    parser.add_argument("--worker_index", type=int, default=0,
                        help="multi-host preprocessing: this host's index")
    parser.add_argument("--worker_count", type=int, default=1,
                        help="multi-host preprocessing over a shared "
                             "save_dir: worker 0 runs text/split (others "
                             "wait), every worker extracts its round-robin "
                             "wav slice, then writes its slice of the train "
                             "shards (dev/test on worker 0). Record shards "
                             "draw fids across ALL workers' mels, so run "
                             "phase 1 everywhere first (--skip_records), "
                             "then the record phase (idempotent re-run "
                             "without --skip_records)")
    parser.add_argument("--skip_records", action="store_true", default=False,
                        help="extraction only (multi-host phase 1)")
    args = parser.parse_args(argv)

    from ..utils.compile_cache import setup_compile_cache
    setup_compile_cache()  # --device_mels compiles the batched mel frontend

    hps = get_config(args.dataset)
    corpus = CORPORA[args.dataset](args.data_dir, args.save_dir, hps)
    corpus.feature_extraction(num_workers=args.num_workers,
                              use_device=args.device_mels,
                              worker_index=args.worker_index,
                              worker_count=args.worker_count)

    if args.skip_records:
        print("Skipping record writing (--skip_records).")
        return
    if args.worker_count > 1:
        # record shards draw fids across ALL workers' mels: enforce the
        # documented two-phase contract (phase 1 everywhere with
        # --skip_records, then the record phase) instead of crashing on a
        # peer's not-yet-extracted mel mid-write
        import os as _os
        missing = 0
        for list_f in (corpus.train_list_f, corpus.dev_list_f,
                       corpus.test_list_f):
            with open(list_f) as f:
                for fid in f.read().split():
                    if not _os.path.isfile(
                            _os.path.join(corpus.mel_dir, fid + ".npy")):
                        missing += 1
        if missing:
            raise SystemExit(
                f"{missing} mel files are not extracted yet (other workers "
                f"still in phase 1?). Run phase 1 on every worker with "
                f"--skip_records first, then re-run the record phase.")
    print("Writing sharded records...")
    writer = RecordWriter(args.save_dir, args.save_dir,
                          train_split=args.record_split,
                          num_mels=hps.audio.num_mels,
                          mel_dtype=args.mel_dtype)
    paths = writer.write_all(worker_index=args.worker_index,
                             worker_count=args.worker_count)
    for mode, ps in paths.items():
        print(f"  {mode}: {len(ps)} shard(s)")
    if args.worker_count > 1:
        # the smoke test reads ALL train shards, but peers may still be
        # writing theirs (disjoint slices, no barrier) — a concurrent read
        # would see missing or in-flight shards. Verify with a single-worker
        # invocation (idempotent) after all workers finish.
        print(f"worker {args.worker_index}/{args.worker_count} done; "
              f"skipping the cross-shard smoke test (peers may still be "
              f"writing). Re-run without --worker_count after all workers "
              f"finish to verify the full shard set.")
        return

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
