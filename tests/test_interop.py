"""Interop: TensorBundle format, weight mapping, reference-checkpoint import.

Three tiers:
  1. pure format tests (writer <-> reader round-trips, no TF);
  2. weight-map/import tests on a synthetic bundle written in the reference's
     exact variable layout (no TF);
  3. cross-validation against TensorFlow itself and an end-to-end ORACLE
     parity test that runs the reference code from /root/reference — both
     skipped automatically when TF or the reference checkout is absent.
"""

import dataclasses
import os

import numpy as np
import pytest

from vaenar_tts_tpu.configs.hparams import LJSpeechConfig, tiny_test_config
from vaenar_tts_tpu.interop.tensorbundle import (BundleReader, BundleWriter,
                                                 crc32c, crc32c_masked)
from vaenar_tts_tpu.interop.weight_map import ATTR, build_weight_map
from vaenar_tts_tpu.interop.importer import (check_tree_match,
                                             export_reference_checkpoint,
                                             load_reference_checkpoint)

REFERENCE_DIR = os.environ.get("VAENAR_REFERENCE_DIR", "/root/reference")


def _has_tf() -> bool:
    try:
        import tensorflow  # noqa: F401

        return True
    except Exception:
        return False


needs_tf = pytest.mark.skipif(not _has_tf(), reason="tensorflow not available")
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR),
    reason="reference checkout not available")


class TestBundleFormat:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        tensors = {
            "model/a/kernel": rng.standard_normal((7, 5)).astype(np.float32),
            "model/a/bias": rng.standard_normal((5,)).astype(np.float32),
            "model/scalar": np.float32(3.25).reshape(()),
            "step": np.int64(17).reshape(()),
            "counts": rng.integers(0, 100, (4, 3)).astype(np.int32),
        }
        w = BundleWriter(str(tmp_path / "ck"))
        for k, v in tensors.items():
            w.add(k, v)
        w.add_strings("_CHECKPOINTABLE_OBJECT_GRAPH", [b"\x01\x02graph"])
        w.close()

        r = BundleReader(str(tmp_path / "ck"))
        assert set(r.keys()) == set(tensors) | {"_CHECKPOINTABLE_OBJECT_GRAPH"}
        for k, v in tensors.items():
            got = r.get(k, verify_crc=True)
            assert got.dtype == v.dtype and got.shape == v.shape
            np.testing.assert_array_equal(got, v)
        assert r.get("_CHECKPOINTABLE_OBJECT_GRAPH") == [b"\x01\x02graph"]

    def test_many_keys_multiple_blocks(self, tmp_path):
        """Enough entries to span several 4KB data blocks, exercising prefix
        compression, restarts, and the index block."""
        rng = np.random.default_rng(1)
        tensors = {f"model/layer_{i:04d}/sub/{j}/kernel":
                   rng.standard_normal((3, 3)).astype(np.float32)
                   for i in range(60) for j in range(4)}
        w = BundleWriter(str(tmp_path / "ck"))
        for k, v in tensors.items():
            w.add(k, v)
        w.close()
        assert os.path.getsize(str(tmp_path / "ck") + ".index") > 8192
        r = BundleReader(str(tmp_path / "ck"))
        assert r.keys() == sorted(tensors)
        for k in list(tensors)[::17]:
            np.testing.assert_array_equal(r.get(k, verify_crc=True),
                                          tensors[k])

    def test_corruption_detected(self, tmp_path):
        w = BundleWriter(str(tmp_path / "ck"))
        w.add("model/x", np.arange(100, dtype=np.float32))
        w.close()
        data_path = str(tmp_path / "ck") + ".data-00000-of-00001"
        raw = bytearray(open(data_path, "rb").read())
        raw[10] ^= 0xFF
        open(data_path, "wb").write(bytes(raw))
        r = BundleReader(str(tmp_path / "ck"))
        with pytest.raises(ValueError, match="crc"):
            r.get("model/x", verify_crc=True)

    def test_crc32c_known_vectors(self):
        # public CRC32C test vectors (RFC 3720 appendix B.4)
        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(b"") == 0
        assert crc32c(bytes(32)) == 0x8A9136AA
        # masking is involutive-checkable: differs from raw and is 32-bit
        m = crc32c_masked(b"123456789")
        assert m != 0xE3069283 and 0 <= m < 2**32


@pytest.fixture(scope="module")
def tiny_setup():
    from vaenar_tts_tpu.models import VAENAR
    from vaenar_tts_tpu.training.steps import init_model

    hp = tiny_test_config()
    model = VAENAR(hp)
    params, batch_stats = init_model(hp, model, 0, 16, 60)
    return hp, model, params, batch_stats


class TestWeightMapAndImport:
    def test_synthetic_reference_layout_roundtrip(self, tiny_setup, tmp_path):
        """Export my tree as a reference-layout bundle, re-import it, and get
        byte-identical trees; then run a forward pass on the import."""
        import jax
        import jax.numpy as jnp

        hp, model, params, batch_stats = tiny_setup
        prefix = str(tmp_path / "ref-layout")
        export_reference_checkpoint(prefix, hp, params, batch_stats)
        p2, bs2 = load_reference_checkpoint(prefix, hp, verify_crc=True)
        check_tree_match(p2, params, "params")
        check_tree_match(bs2, batch_stats, "batch_stats")
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            params, p2)
        texts = jnp.asarray(np.arange(2 * 16).reshape(2, 16) % 40 + 1,
                            jnp.int32)
        mels, _ = model.apply(
            {"params": p2, "batch_stats": bs2}, texts,
            jnp.asarray([50, 60]), jnp.asarray([12, 16]),
            reduction_factor=2, max_mel_length=60, temperature=0.0,
            rngs={"sample": jax.random.key(0)}, method=model.infer)
        assert np.isfinite(np.asarray(mels, np.float32)).all()

    def test_training_checkpoint_with_optimizer_slots_imports(
            self, tiny_setup, tmp_path):
        """Full training checkpoints carry Adam slots under
        'model/<var>/.OPTIMIZER_SLOT/optimizer/m|v/...' — those must be
        ignored, not counted as unmapped model variables."""
        from vaenar_tts_tpu.interop.tensorbundle import BundleWriter

        hp, model, params, batch_stats = tiny_setup
        prefix = str(tmp_path / "train-ckpt")
        export_reference_checkpoint(prefix, hp, params, batch_stats)
        # rewrite the bundle with synthetic slot + bookkeeping entries mixed
        # in, mimicking tf.train.Checkpoint(step, optimizer, model)
        from vaenar_tts_tpu.interop.tensorbundle import BundleReader
        r = BundleReader(prefix)
        w = BundleWriter(str(tmp_path / "train-ckpt2"))
        rng = np.random.default_rng(0)
        for k in r.keys():
            if k == "_CHECKPOINTABLE_OBJECT_GRAPH":
                continue
            arr = r.get(k)
            w.add(k, np.asarray(arr))
            if k.startswith("model/") and k.endswith(
                    "/.ATTRIBUTES/VARIABLE_VALUE"):
                base = k[: -len("/.ATTRIBUTES/VARIABLE_VALUE")]
                for slot in ("m", "v"):
                    w.add(f"{base}/.OPTIMIZER_SLOT/optimizer/{slot}"
                          f"/.ATTRIBUTES/VARIABLE_VALUE",
                          rng.standard_normal(np.shape(arr)).astype(
                              np.float32))
        w.add("optimizer/iter/.ATTRIBUTES/VARIABLE_VALUE",
              np.asarray(7, np.int64))
        w.add("step/.ATTRIBUTES/VARIABLE_VALUE", np.asarray(3, np.int64))
        w.close()
        p2, bs2 = load_reference_checkpoint(str(tmp_path / "train-ckpt2"), hp)
        check_tree_match(p2, params, "params")

    def test_map_covers_every_leaf_and_nothing_else(self, tiny_setup):
        from vaenar_tts_tpu.interop.importer import _tree_paths

        hp, _model, params, batch_stats = tiny_setup
        table = build_weight_map(hp)
        mapped = {("params",): set(), ("batch_stats",): set()}
        for coll, path in table.values():
            mapped[(coll,)].add(path)
        assert mapped[("params",)] == set(_tree_paths(params))
        assert mapped[("batch_stats",)] == set(_tree_paths(batch_stats))

    def test_missing_variable_raises(self, tiny_setup, tmp_path):
        hp, _model, params, batch_stats = tiny_setup
        prefix = str(tmp_path / "partial")
        table = build_weight_map(hp)
        w = BundleWriter(prefix)
        skipped = sorted(table)[0]
        from vaenar_tts_tpu.interop.importer import _get_path
        for ref_name, (coll, path) in table.items():
            if ref_name == skipped:
                continue
            tree = params if coll == "params" else batch_stats
            w.add(ref_name, np.asarray(_get_path(tree, path), np.float32))
        w.close()
        with pytest.raises(ValueError, match="lacks"):
            load_reference_checkpoint(prefix, hp)

    def test_mu_logvar_swap_is_crossed(self):
        """The reference's mu_projection weights must land in flax
        logvar_projection (reference models.py:136 vs posterior.py:130)."""
        hp = tiny_test_config()
        table = build_weight_map(hp)
        coll, path = table[f"model/posterior/mu_projection/kernel{ATTR}"]
        assert path == ("posterior", "logvar_projection", "kernel")
        coll, path = table[f"model/posterior/logvar_projection/kernel{ATTR}"]
        assert path == ("posterior", "mu_projection", "kernel")

    def test_lj_config_map_size(self):
        """The LJ preset's map must cover the reference's full 501-variable
        model (503 checkpoint keys minus the object graph and save_counter)."""
        table = build_weight_map(LJSpeechConfig())
        assert len(table) == 501


@needs_tf
class TestTensorFlowCross:
    def test_tf_reads_our_bundle(self, tmp_path):
        import tensorflow as tf

        rng = np.random.default_rng(2)
        tensors = {
            "model/x/kernel": rng.standard_normal((8, 4)).astype(np.float32),
            "model/x/bias": rng.standard_normal((4,)).astype(np.float32),
            "model/deep/nest/w": rng.standard_normal((2, 3, 5)).astype(np.float32),
        }
        prefix = str(tmp_path / "ours")
        w = BundleWriter(prefix)
        for k, v in tensors.items():
            w.add(k, v)
        w.close()
        reader = tf.train.load_checkpoint(prefix)
        names = set(reader.get_variable_to_shape_map())
        assert names == set(tensors)
        for k, v in tensors.items():
            np.testing.assert_array_equal(reader.get_tensor(k), v)

    def test_we_read_tf_bundle(self, tmp_path):
        import tensorflow as tf

        rng = np.random.default_rng(3)
        a = tf.Variable(rng.standard_normal((16, 16)).astype(np.float32))
        b = tf.Variable(np.int64(5))
        ckpt = tf.train.Checkpoint(a=a, b=b)
        prefix = ckpt.write(str(tmp_path / "tfck"))
        r = BundleReader(prefix)
        key_a = "a/.ATTRIBUTES/VARIABLE_VALUE"
        np.testing.assert_array_equal(r.get(key_a, verify_crc=True),
                                      a.numpy())
        assert int(r.get("b/.ATTRIBUTES/VARIABLE_VALUE",
                         verify_crc=True)) == 5

    def test_reference_object_restore_of_our_export(self, tmp_path):
        """THE export contract: the reference's own object-based
        tf.train.Checkpoint(model=...).restore(prefix) must load our
        exported bundle (reference inference.py:121-123). Without the
        reconstructed _CHECKPOINTABLE_OBJECT_GRAPH, restore falls back to
        name matching, finds nothing, and expect_partial() silently leaves
        fresh weights."""
        os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
        import tensorflow as tf

        if not os.path.isdir(REFERENCE_DIR):
            pytest.skip("reference not present")
        if not tf.keras.__name__.startswith("tf_keras"):
            pytest.skip("legacy keras unavailable")
        TinyHPS, hp = _tiny_ref_hps()
        from models.models import VAENAR as RefVAENAR

        def build_ref(seed):
            tf.random.set_seed(seed)
            np.random.seed(seed)
            m = RefVAENAR(TinyHPS)
            texts = np.random.randint(1, hp.encoder.vocab_size,
                                      (2, 16)).astype(np.int32)
            t_lens = np.array([12, 16], np.int32)
            m_lens = np.array([40, 60], np.int32)
            mels = np.random.randn(2, 60, 80).astype(np.float32) * 0.3
            m.init(tf.constant(texts), tf.constant(m_lens),
                   tf.constant(t_lens))
            m(tf.constant(texts), tf.constant(mels), tf.constant(m_lens),
              tf.constant(t_lens), reduction_factor=2, training=True,
              reduce_loss=True)
            return m

        ref_a = build_ref(21)
        prng = np.random.default_rng(13)
        for v in ref_a.trainable_variables:
            v.assign(v + prng.normal(0.0, 0.05, v.shape).astype(np.float32))
        src_prefix = str(tmp_path / "src")
        tf.train.Checkpoint(model=ref_a).write(src_prefix)

        params, batch_stats = load_reference_checkpoint(src_prefix, hp)
        out_prefix = str(tmp_path / "exported")
        export_reference_checkpoint(out_prefix, hp, params, batch_stats)

        ref_b = build_ref(99)  # different init: restore must overwrite it
        # sanity: A and B genuinely differ before restore
        assert not np.allclose(ref_a.variables[0].numpy(),
                               ref_b.variables[0].numpy())
        status = tf.train.Checkpoint(model=ref_b).restore(out_prefix)
        status.expect_partial()
        # compare positionally: tf variable .name is not unique across
        # sibling modules (several layers own a 'pos_weight:0')
        vars_a, vars_b = ref_a.variables, ref_b.variables
        assert len(vars_a) == len(vars_b) > 50
        for va, vb in zip(vars_a, vars_b):
            # keras uniquifies layer names process-wide ('dense' vs
            # 'dense_24'), so compare positionally; shapes must agree
            assert va.shape == vb.shape, (va.name, vb.name)
            np.testing.assert_allclose(vb.numpy(), va.numpy(),
                                       atol=0, rtol=0, err_msg=va.name)


def _tiny_ref_hps():
    """A reference-format hparams tree scaled to the tiny test config, so the
    oracle test runs in seconds (nested-class subclassing mirrors
    reference configs/hparams.py:233)."""
    import sys

    sys.path.insert(0, REFERENCE_DIR)
    from configs.hparams import LJHPS

    hp = tiny_test_config()

    class Tiny(LJHPS):
        class Common(LJHPS.Common):
            latent_dim = hp.common.latent_dim

        class Encoder:
            class Transformer(LJHPS.Encoder.Transformer):
                vocab_size = hp.encoder.vocab_size
                embd_dim = hp.encoder.embd_dim
                n_conv = hp.encoder.n_conv
                pre_hidden = hp.encoder.pre_hidden
                conv_kernel = hp.encoder.conv_kernel
                n_blk = hp.encoder.n_blk
                attention_dim = hp.encoder.attention_dim
                attention_heads = hp.encoder.attention_heads
                ffn_hidden = hp.encoder.ffn_hidden

        class Decoder:
            class Transformer(LJHPS.Decoder.Transformer):
                nblk = hp.decoder.nblk
                attention_dim = hp.decoder.attention_dim
                attention_heads = hp.decoder.attention_heads
                ffn_hidden = hp.decoder.ffn_hidden
                post_n_conv = hp.decoder.post_n_conv
                post_conv_filters = hp.decoder.post_conv_filters
                post_conv_kernel = hp.decoder.post_conv_kernel

        class Posterior:
            class Transformer(LJHPS.Posterior.Transformer):
                pre_hidden = hp.posterior.pre_hidden
                nblk = hp.posterior.nblk
                attention_dim = hp.posterior.attention_dim
                attention_heads = hp.posterior.attention_heads
                ffn_hidden = hp.posterior.ffn_hidden

        class Prior:
            class Transformer(LJHPS.Prior.Transformer):
                n_blk = hp.prior.n_blk
                n_transformer_blk = hp.prior.n_transformer_blk
                attention_dim = hp.prior.attention_dim
                attention_heads = hp.prior.attention_heads
                ffn_hidden = hp.prior.ffn_hidden

    return Tiny, hp


@needs_tf
@needs_reference
class TestOracleParity:
    """Run the reference implementation itself and require numerical
    agreement through the full deterministic synthesis path."""

    def test_end_to_end_output_parity(self, tmp_path):
        os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
        import tensorflow as tf

        if not tf.keras.__name__.startswith("tf_keras"):  # pragma: no cover
            pytest.skip("legacy keras unavailable (TF_USE_LEGACY_KERAS unset "
                        "before tensorflow import)")
        TinyHPS, hp = _tiny_ref_hps()
        from models.models import VAENAR as RefVAENAR

        tf.random.set_seed(7)
        np.random.seed(7)
        ref = RefVAENAR(TinyHPS)
        texts = np.random.randint(1, hp.encoder.vocab_size,
                                  (2, 16)).astype(np.int32)
        t_lens = np.array([12, 16], np.int32)
        m_lens = np.array([40, 60], np.int32)
        mels = np.random.randn(2, 60, 80).astype(np.float32) * 0.3
        r = 2
        texts_t, t_lens_t = tf.constant(texts), tf.constant(t_lens)
        m_lens_t, mels_t = tf.constant(m_lens), tf.constant(mels)

        ref.init(texts_t, m_lens_t, t_lens_t)
        ref(texts_t, mels_t, m_lens_t, t_lens_t, reduction_factor=r,
            training=True, reduce_loss=True)
        prng = np.random.default_rng(11)
        for v in ref.trainable_variables:
            v.assign(v + prng.normal(0.0, 0.02, v.shape).astype(np.float32))

        pos_step = ref.mel_text_len_ratio / float(r)
        text_embd = ref.text_encoder(texts_t, t_lens_t, pos_step=pos_step,
                                     training=False)
        reduced = (m_lens_t + r - 1) // r
        z, _ = ref.prior.sample(reduced, text_embd, t_lens_t,
                                temperature=0.0, training=False)
        _, ref_mel, _ = ref.decoder(inputs=z, text_embd=text_embd,
                                    z_lengths=reduced, text_lengths=t_lens_t,
                                    training=False, reduction_factor=r)
        prefix = str(tmp_path / "oracle")
        tf.train.Checkpoint(model=ref).write(prefix)

        import jax
        import jax.numpy as jnp

        hp32 = hp.replace(train=dataclasses.replace(hp.train,
                                                    compute_dtype="float32"))
        params, batch_stats = load_reference_checkpoint(prefix, hp32)
        from vaenar_tts_tpu.models import VAENAR

        model = VAENAR(hp32)
        my_mel, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(texts), jnp.asarray(m_lens), jnp.asarray(t_lens),
            reduction_factor=r, max_mel_length=60, temperature=0.0,
            rngs={"sample": jax.random.key(0)}, method=model.infer)
        my_mel = np.asarray(my_mel, np.float32)
        mask = (np.arange(60)[None, :] < m_lens[:, None])[..., None]
        diff = np.abs(ref_mel.numpy() * mask - my_mel * mask)
        assert diff.max() < 5e-4, f"mel max|diff| {diff.max()}"
        assert diff.mean() < 5e-5, f"mel L1 {diff.mean()}"


@needs_tf
@needs_reference
def test_gradient_oracle_tiny(tmp_path):
    """Train-step oracle at tiny scale (the CI twin of
    scripts/parity_vs_reference.py --preset ... gradient section): identical
    imported weights + batch + PINNED reparameterization eps, dev-mode
    forward; loss components and per-submodule grad norms from
    tf.GradientTape must match jax.value_and_grad (reference
    train.py:127-137)."""
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    import importlib.util

    import tensorflow as tf

    if not tf.keras.__name__.startswith("tf_keras"):
        pytest.skip("legacy keras unavailable")
    spec = importlib.util.spec_from_file_location(
        "parity_vs_reference",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "parity_vs_reference.py"))
    pvr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pvr)

    TinyHPS, hp = _tiny_ref_hps()
    from models.models import VAENAR as RefVAENAR

    tf.random.set_seed(5)
    np.random.seed(5)
    model = RefVAENAR(TinyHPS)
    rng = np.random.default_rng(3)
    texts = rng.integers(1, hp.encoder.vocab_size, (2, 16)).astype(np.int32)
    t_lens = np.array([12, 16], np.int32)
    m_lens = np.array([40, 60], np.int32)
    mels = (rng.standard_normal((2, 60, 80)) * 0.3).astype(np.float32)
    r = 2
    model.init(tf.constant(texts), tf.constant(m_lens), tf.constant(t_lens))
    model(tf.constant(texts), tf.constant(mels), tf.constant(m_lens),
          tf.constant(t_lens), reduction_factor=r, training=True,
          reduce_loss=True)
    prng = np.random.default_rng(11)
    for v in model.trainable_variables:
        v.assign(v + prng.normal(0.0, 0.05, v.shape).astype(np.float32))
    prefix = str(tmp_path / "oracle")
    tf.train.Checkpoint(model=model).write(prefix)

    params, batch_stats = load_reference_checkpoint(prefix, hp)
    eps = rng.standard_normal(
        (2, 1, 30, hp.common.latent_dim)).astype(np.float32)
    g_ref = pvr.reference_grads(model, texts, t_lens, m_lens, mels, r, eps)
    g_ours = pvr.ours_grads(hp, params, batch_stats, texts, t_lens, m_lens,
                            mels, r, eps)
    for k in ("loss", "mel_l2", "kl", "len_l2", "grad_global_norm"):
        assert g_ours[k] == pytest.approx(g_ref[k], rel=1e-4), (
            k, g_ref[k], g_ours[k])
    for mod, ref_n in g_ref["grad_norms"].items():
        assert g_ours["grad_norms"][mod] == pytest.approx(ref_n, rel=1e-4), (
            mod, ref_n, g_ours["grad_norms"])
