"""Real-chip smoke run of the shipping train() driver: synthetic corpus ->
records -> a few epochs of the full-size LJ model -> resume -> artifacts.
Exercises the exact CLI code path end-to-end on TPU."""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from vaenar_tts_tpu.utils.compile_cache import setup_compile_cache
setup_compile_cache()

import numpy as np

from vaenar_tts_tpu.configs import get_config
from vaenar_tts_tpu.configs.overrides import apply_overrides
from vaenar_tts_tpu.data import RecordWriter

root = tempfile.mkdtemp(prefix="vaenar_smoke_")
print("workspace:", root)

rng = np.random.default_rng(0)
os.makedirs(f"{root}/texts")
os.makedirs(f"{root}/mels")
fids = [f"utt{i:04d}" for i in range(96)]
for i, fid in enumerate(fids):
    tl = int(rng.integers(40, 160))
    ml = int(tl * 5.59 * rng.uniform(0.9, 1.1))
    np.save(f"{root}/texts/{fid}.npy",
            rng.integers(1, 43, tl).astype(np.int32))
    np.save(f"{root}/mels/{fid}.npy",
            np.clip(rng.standard_normal((ml, 80)) * 0.15 + 0.35, 0,
                    1).astype(np.float32))
open(f"{root}/train.txt", "w").write("\n".join(fids[:80]) + "\n")
open(f"{root}/dev.txt", "w").write("\n".join(fids[80:88]) + "\n")
open(f"{root}/test.txt", "w").write("\n".join(fids[88:]) + "\n")
RecordWriter(root, f"{root}/records", train_split=4, num_mels=80).write_all()

hp = get_config("ljspeech")
hp = apply_overrides(hp, ["train.train_batch_size=16",
                          "train.test_batch_size=4",
                          "train.test_interval=39",
                          "train.reduction_factors=5,4,3,2",
                          "train.reduce_interval=0,10,20,30",
                          # single max-pad bucket: 4 compiles (one per r)
                          "dataset.mel_bucket=960",
                          "dataset.text_bucket=192"])

from vaenar_tts_tpu.training.loop import train  # noqa: E402

t0 = time.time()
state = train(hp, f"{root}/records", f"{root}/ckpt", f"{root}/logs",
              test_dir=f"{root}/test_out", max_epochs=40, log_every=20)
print(f"train run done in {time.time() - t0:.0f}s, final epoch {state.epoch}")

state = train(hp, f"{root}/records", f"{root}/ckpt", f"{root}/logs",
              test_dir=f"{root}/test_out", max_epochs=41, log_every=20)
print("resume ok, epoch", state.epoch)
arts = os.listdir(f"{root}/test_out")
print("artifacts:", len(arts), sorted(arts)[:4])
