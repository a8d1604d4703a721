"""Portable npz checkpoint exports (utils/export.py): round-trip fidelity
and the cli.inference fallback contract. The export is the durable form of
a trained artifact (the reference ships TF checkpoints, inference.py:121-123);
it must restore exact trees at fp32 and within fp16 rounding otherwise."""

import numpy as np
import pytest

from vaenar_tts_tpu.utils.export import load_npz, save_npz


def small_state():
    rng = np.random.default_rng(0)
    params = {
        "encoder": {"dense": {"kernel": rng.normal(size=(8, 4)).astype(np.float32),
                              "bias": np.zeros(4, np.float32)}},
        "embed": {"table": rng.normal(size=(11, 8)).astype(np.float32)},
    }
    batch_stats = {"postnet": {"bn0": {"mean": rng.normal(size=16).astype(np.float32),
                                       "var": rng.random(16).astype(np.float32)}}}
    return {"params": params, "batch_stats": batch_stats, "epoch": 123}


class TestNpzExport:
    def test_fp32_roundtrip_is_exact(self, tmp_path):
        state = small_state()
        path = save_npz(str(tmp_path / "export.npz"), state, store_dtype=None)
        back = load_npz(path)
        assert back["epoch"] == 123
        import jax
        for orig, rest in zip(jax.tree_util.tree_leaves(state["params"]),
                              jax.tree_util.tree_leaves(back["params"])):
            np.testing.assert_array_equal(orig, rest)
        for orig, rest in zip(
                jax.tree_util.tree_leaves(state["batch_stats"]),
                jax.tree_util.tree_leaves(back["batch_stats"])):
            np.testing.assert_array_equal(orig, rest)

    def test_fp16_roundtrip_restores_dtype_within_rounding(self, tmp_path):
        state = small_state()
        path = save_npz(str(tmp_path / "export.npz"), state,
                        store_dtype="float16")
        back = load_npz(path)
        k = back["params"]["encoder"]["dense"]["kernel"]
        assert k.dtype == np.float32  # original dtype restored
        np.testing.assert_allclose(
            k, state["params"]["encoder"]["dense"]["kernel"],
            rtol=1e-3, atol=1e-3)

    def test_integer_leaves_survive_fp16_storage(self, tmp_path):
        state = small_state()
        state["params"]["counts"] = np.arange(70000, 70005, dtype=np.int64)
        path = save_npz(str(tmp_path / "export.npz"), state,
                        store_dtype="float16")
        back = load_npz(path)
        assert back["params"]["counts"].dtype == np.int64
        np.testing.assert_array_equal(back["params"]["counts"],
                                      state["params"]["counts"])

    def test_crash_leaves_no_partial_file(self, tmp_path, monkeypatch):
        """The write is buffer-then-rename: a failure mid-write must not
        leave a truncated export.npz for the inference fallback to load."""
        import vaenar_tts_tpu.utils.export as ex
        state = small_state()
        path = str(tmp_path / "export.npz")

        def boom(tmp, final):
            raise OSError("disk full")

        monkeypatch.setattr(ex.os, "replace", boom)
        with pytest.raises(OSError):
            save_npz(path, state)
        import os
        assert not os.path.exists(path)
