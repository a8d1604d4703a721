"""Multi-device tests on the virtual 8-device CPU mesh: DP/TP sharded train
step runs and matches the single-device step numerically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vaenar_tts_tpu.configs.hparams import tiny_test_config
from vaenar_tts_tpu.models import VAENAR
from vaenar_tts_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    replicated,
)
from vaenar_tts_tpu.training.steps import (
    init_model,
    make_optimizer,
    make_train_step,
)

HP = tiny_test_config()
B, T_TEXT, T_MEL = 8, 16, 60


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    texts = jnp.asarray(rng.integers(1, HP.encoder.vocab_size, (B, T_TEXT)),
                        jnp.int32)
    mels = jnp.asarray(rng.standard_normal((B, T_MEL, 80)) * 0.1, jnp.float32)
    t_lens = jnp.asarray(rng.integers(8, T_TEXT + 1, (B,)), jnp.int32)
    m_lens = jnp.asarray(rng.integers(30, T_MEL + 1, (B,)), jnp.int32)
    return texts, mels, t_lens, m_lens


def test_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh()  # all devices on data
    assert mesh.shape["data"] == 8


def test_dp_step_matches_single_device():
    """The same global batch must produce (nearly) identical losses on a
    1-device layout and an 8-way data-parallel mesh."""
    model = VAENAR(HP)
    params, batch_stats = init_model(HP, model, 0, T_TEXT, T_MEL)
    optimizer = make_optimizer(HP)
    opt_state = optimizer.init(params)
    step = make_train_step(HP, model, optimizer, donate=False)
    texts, mels, t_lens, m_lens = _batch()
    rng = jax.random.key(0)

    _, _, _, m_single = step(params, batch_stats, opt_state, texts, mels,
                             t_lens, m_lens, jnp.float32(1e-5), rng,
                             reduction_factor=2)

    mesh = make_mesh(data=8, model=1)
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    params_s = jax.device_put(params, rep)
    bs_s = jax.device_put(batch_stats, rep)
    opt_s = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), opt_state)
    args = [jax.device_put(a, bsh) for a in (texts, mels, t_lens, m_lens)]
    _, _, _, m_dp = step(params_s, bs_s, opt_s, *args, jnp.float32(1e-5),
                         jax.device_put(rng, rep), reduction_factor=2)
    for k in m_single:
        assert float(m_single[k]) == pytest.approx(float(m_dp[k]), rel=1e-3), k


def test_tp_sharding_rules_only_hit_wide_kernels():
    mesh = make_mesh(data=4, model=2)
    model = VAENAR(HP)
    params, _ = init_model(HP, model, 0, T_TEXT, T_MEL)
    rules = param_sharding_rules(params, mesh)
    flat = jax.tree_util.tree_leaves_with_path(rules)
    sharded = [jax.tree_util.keystr(p) for p, s in flat if s.spec != P()]
    # tiny config has no >=512 dims: everything replicated
    assert sharded == []


def test_ring_sequence_parallel_full_model_matches():
    """VAENAR with seq_mesh set (every eligible self-attention on the
    ppermute ring, time sharded over 'model') must match the plain model's
    losses AND gradients — same params, different schedule. ring_min_seq=0
    through the CONFIG knob (hp.train.ring_min_seq, threaded as
    AttentionTuning) makes the tiny shapes ring — also proving the knob
    reaches every attention site."""
    import dataclasses
    ring_hp = HP.replace(train=dataclasses.replace(HP.train, ring_min_seq=0))
    mesh = make_mesh(data=4, model=2)
    plain = VAENAR(HP)
    ringed = VAENAR(ring_hp, seq_mesh=mesh)
    params, batch_stats = init_model(HP, plain, 0, T_TEXT, T_MEL)
    texts, mels, t_lens, m_lens = _batch(seed=7)
    rng = jax.random.key(5)

    def loss_fn(model):
        def fn(params):
            outs = model.apply(
                {"params": params, "batch_stats": batch_stats},
                texts, mels, m_lens, t_lens, reduction_factor=2, train=False,
                reduce_loss=True, rngs={"sample": rng})
            _dec, mel_l2, kl, len_l2, _ = outs
            return mel_l2 + 1e-5 * kl + len_l2
        return fn

    ref_loss, ref_grads = jax.jit(jax.value_and_grad(loss_fn(plain)))(params)
    ring_loss, ring_grads = jax.jit(jax.value_and_grad(loss_fn(ringed)))(params)
    assert float(ref_loss) == pytest.approx(float(ring_loss), rel=1e-4)
    flat_a = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(ring_grads))
    for path, ga in flat_a:
        gb = flat_b[path]
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), rtol=5e-3, atol=5e-5,
            err_msg=jax.tree_util.keystr(path))


def test_ring_skips_when_time_indivisible():
    """Times that don't divide the mesh axis silently fall back to the XLA
    path (static trace-time check), so ragged buckets still work."""
    from vaenar_tts_tpu.parallel.ring_attention import ring_eligible
    mesh = make_mesh(data=2, model=4)
    assert not ring_eligible(mesh, "model", 30, 30, min_seq=0)  # 30 % 4 != 0
    assert not ring_eligible(mesh, "model", 32, 16, min_seq=0)  # cross-attn
    assert not ring_eligible(None, "model", 32, 32, min_seq=0)
    assert not ring_eligible(mesh, "nope", 32, 32, min_seq=0)
    assert ring_eligible(mesh, "model", 32, 32, min_seq=0)
    # profitability floor: short sequences stay on the local fused path
    assert not ring_eligible(mesh, "model", 512, 512)
    assert ring_eligible(mesh, "model", 2048, 2048)


def test_sequence_sharded_forward_matches():
    """Full-model ELBO with the mel TIME axis sharded over the mesh
    ('sp' via GSPMD: XLA inserts the attention collectives) matches the
    replicated result."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    model = VAENAR(HP)
    params, batch_stats = init_model(HP, model, 0, T_TEXT, T_MEL)
    texts, mels, t_lens, m_lens = _batch(seed=11)
    rng = jax.random.key(3)

    def fwd(params, batch_stats, texts, mels, t_lens, m_lens):
        outs = model.apply(
            {"params": params, "batch_stats": batch_stats},
            texts, mels, m_lens, t_lens, reduction_factor=2, train=False,
            reduce_loss=True, rngs={"sample": rng})
        _dec, mel_l2, kl, len_l2, _ = outs
        return mel_l2, kl, len_l2

    ref = jax.jit(fwd)(params, batch_stats, texts, mels, t_lens, m_lens)

    mesh = make_mesh(data=2, model=4)
    rep = NamedSharding(mesh, P())
    seq_sh = NamedSharding(mesh, P("data", "model", None))  # [B, T, mel]
    b_sh = NamedSharding(mesh, P("data"))
    args = (jax.device_put(params, rep), jax.device_put(batch_stats, rep),
            jax.device_put(texts, b_sh), jax.device_put(mels, seq_sh),
            jax.device_put(t_lens, b_sh), jax.device_put(m_lens, b_sh))
    sharded = jax.jit(fwd)(*args)
    for a, b in zip(ref, sharded):
        assert float(a) == pytest.approx(float(b), rel=2e-3), (a, b)
