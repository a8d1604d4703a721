"""Pod-scale batched synthesis: shard whole-test-set inference over a device
mesh (the BASELINE.json stretch config: batch-sharded, not sequence-sharded).

The batch dim is sharded over the 'data' axis; params are replicated (or TP-
sharded via parallel.mesh rules). Each jitted call then synthesizes
batch_size*n_data utterances worth of frames per step with XLA placing the
collectives over ICI.
"""

from __future__ import annotations

import time
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.hparams import HParams
from ..data.loader import Batch, BucketedLoader
from ..models.vaenar import VAENAR
from ..training.steps import make_inference_step
from .mesh import batch_sharding, make_mesh, replicated


class ShardedSynthesizer:
    def __init__(self, hp: HParams, model: VAENAR, params, batch_stats,
                 mesh=None):
        self.hp = hp
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh(model=1)
        self.n_data = self.mesh.shape["data"]
        rep = replicated(self.mesh)
        # honor the mesh's model axis: TP rules shard wide kernels when
        # model>1, everything else (and all of it at model=1) replicates —
        # a blanket replicated device_put here would silently undo a
        # caller's TP sharding
        from .mesh import shard_params
        self.params = shard_params(params, self.mesh)
        self.batch_stats = jax.device_put(batch_stats, rep)
        self._step = make_inference_step(hp, model)
        self._bsh = batch_sharding(self.mesh)

    def synthesize(self, texts: np.ndarray, text_lengths: np.ndarray,
                   max_mel_length: int, temperature: float = 0.0,
                   rng: Optional[jax.Array] = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
        """texts [B, T] with B divisible by the data-axis size."""
        B = texts.shape[0]
        assert B % self.n_data == 0, (B, self.n_data)
        rng = rng if rng is not None else jax.random.key(0)
        t = jax.device_put(jnp.asarray(texts), self._bsh)
        tl = jax.device_put(jnp.asarray(text_lengths), self._bsh)
        mels, pred_lens, _ = self._step(
            self.params, self.batch_stats, t, tl,
            jax.device_put(rng, replicated(self.mesh)),
            reduction_factor=self.hp.common.final_reduction_factor,
            max_mel_length=max_mel_length, temperature=temperature)
        return np.asarray(mels, np.float32), np.asarray(pred_lens)

    def run_dataset(self, loader: BucketedLoader, max_mel_length: int,
                    temperature: float = 0.0) -> Iterator[Tuple[Batch, np.ndarray, np.ndarray, float]]:
        """Yield (batch, mels, predicted_lengths, seconds) per batch.

        ``seconds`` is wall time INCLUDING the device->host mel pull (the
        pull is also what makes the timing honest — see CLAUDE.md on
        block_until_ready over the tunnel) and, on the first batch of each
        shape, the compile. For device-only throughput use bench.py's
        chained-marginal protocol."""
        rng = jax.random.key(0)
        for i, batch in enumerate(loader.epoch(0)):
            t0 = time.perf_counter()
            mels, lens = self.synthesize(
                batch.texts, batch.text_lengths, max_mel_length,
                temperature, jax.random.fold_in(rng, i))
            yield batch, mels, lens, time.perf_counter() - t0
