"""Host input-pipeline throughput: can the loader feed a 29.5 ms/step chip?
Builds an LJ-scale synthetic record set and measures batch assembly rates
for the native C++ packer vs the NumPy fallback."""
import os, sys, time, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from vaenar_tts_tpu.data import BucketedLoader, RecordShardWriter, list_shards

root = tempfile.mkdtemp(prefix="loaderbench_")
rng = np.random.default_rng(0)
N, SHARDS = 2000, 8
print(f"writing {N} synthetic utterances across {SHARDS} shards...")
writers = [RecordShardWriter(os.path.join(root, f"train-{i}.vrs"), 80)
           for i in range(SHARDS)]
for i in range(N):
    tl = int(rng.integers(40, 190))
    ml = int(tl * 5.59 * rng.uniform(0.85, 1.15))
    writers[i % SHARDS].add(
        f"u{i:05d}", rng.integers(0, 43, tl).astype(np.int32),
        rng.standard_normal((ml, 80)).astype(np.float32))
for w in writers:
    w.close()
shards = list_shards(root, "train")
size_mb = sum(os.path.getsize(p) for p in shards) / 1e6
print(f"record set: {size_mb:.0f} MB")

for name, native in [("native C++", True), ("numpy fallback", False)]:
    loader = BucketedLoader(shards, batch_size=32, seed=0, drop_last=True)
    if not native:
        loader._pack_native = lambda *a, **k: False
    # warm the page cache
    for _ in loader.epoch(0):
        pass
    t0 = time.perf_counter()
    nb, utts = 0, 0
    for b in loader.epoch(1):
        nb += 1
        utts += b.n_valid
    dt = time.perf_counter() - t0
    print(f"{name:15s}: {nb/dt:7.1f} batches/s, {utts/dt:9.0f} utt/s, "
          f"{nb and dt/nb*1e3:.2f} ms/batch")
print("chip demand at 29.5 ms/step (batch 32): 33.9 batches/s")
