"""Sharded (pod-scale) synthesis on the virtual CPU mesh: batch-sharded
inference matches the unsharded result."""

import jax
import jax.numpy as jnp
import numpy as np

from vaenar_tts_tpu.configs.hparams import tiny_test_config
from vaenar_tts_tpu.models import VAENAR
from vaenar_tts_tpu.parallel import make_mesh
from vaenar_tts_tpu.parallel.synthesis import ShardedSynthesizer
from vaenar_tts_tpu.training.steps import init_model, make_inference_step

HP = tiny_test_config()
B, TT, TM = 8, 16, 120


def test_sharded_matches_unsharded():
    model = VAENAR(HP)
    params, bs = init_model(HP, model, 0, TT, TM)
    rng = np.random.default_rng(0)
    texts = rng.integers(1, HP.encoder.vocab_size, (B, TT)).astype(np.int32)
    t_lens = rng.integers(8, TT + 1, (B,)).astype(np.int32)

    mesh = make_mesh(data=8, model=1)
    synth = ShardedSynthesizer(HP, model, params, bs, mesh)
    mels_sharded, lens_sharded = synth.synthesize(texts, t_lens, TM,
                                                  temperature=0.0)

    inf = make_inference_step(HP, model)
    mels_ref, lens_ref, _ = inf(params, bs, jnp.asarray(texts),
                                jnp.asarray(t_lens), jax.random.key(0),
                                reduction_factor=HP.common.final_reduction_factor,
                                max_mel_length=TM, temperature=0.0)
    np.testing.assert_array_equal(lens_sharded, np.asarray(lens_ref))
    np.testing.assert_allclose(mels_sharded, np.asarray(mels_ref, np.float32),
                               atol=2e-4)
