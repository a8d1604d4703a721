"""CLI-surface tests: drive the actual preprocess/train/inference mains
in-process with a synthetic corpus (this layer carried the round-1
override/restore bug; lock it)."""

import os

import numpy as np
import pytest

from tests.test_corpus import make_lj_corpus

TINY_OVERRIDES = []
for kv in [
    "encoder.embd_dim=32", "encoder.pre_hidden=32", "encoder.n_conv=1",
    "encoder.n_blk=1", "encoder.attention_dim=16", "encoder.attention_heads=2",
    "encoder.ffn_hidden=32", "decoder.nblk=1", "decoder.attention_dim=16",
    "decoder.attention_heads=2", "decoder.ffn_hidden=32",
    "decoder.post_n_conv=1", "decoder.post_conv_filters=16",
    "posterior.pre_hidden=16", "posterior.nblk=1", "posterior.attention_dim=16",
    "posterior.attention_heads=2", "posterior.ffn_hidden=32",
    "prior.n_blk=1", "prior.n_transformer_blk=1", "prior.attention_dim=16",
    "prior.attention_heads=2", "prior.ffn_hidden=32", "common.latent_dim=8",
    "train.train_batch_size=4", "train.test_batch_size=2",
    "train.compute_dtype=float32", "train.test_interval=1000",
]:
    TINY_OVERRIDES += ["--override", kv]


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    corpus = root / "LJx"
    corpus.mkdir()
    make_lj_corpus(corpus, n=12)
    return root


class TestCLISurface:
    def test_preprocess_train_infer(self, workspace):
        from vaenar_tts_tpu.cli import inference, preprocess, train

        corpus = str(workspace / "LJx")
        feats = str(workspace / "feats")
        preprocess.main(["--dataset", "ljspeech", "--data_dir", corpus,
                         "--save_dir", feats, "--record_split", "2",
                         "--num_workers", "1"])
        assert os.path.isfile(os.path.join(feats, "train-1.vrs"))

        model_dir = str(workspace / "ckpt")
        train.main(["--dataset", "ljspeech", "--data_dir", feats,
                    "--model_dir", model_dir,
                    "--log_dir", str(workspace / "logs"),
                    "--max_epochs", "2", "--steps_per_epoch", "1",
                    *TINY_OVERRIDES])
        assert os.path.isfile(os.path.join(model_dir, "hparams.json"))

        out = str(workspace / "out")
        inference.main(["--dataset", "ljspeech", "--data_dir", feats,
                        "--model_dir", model_dir, "--test_dir", out,
                        "--batch_size", "2"])
        mels = [f for f in os.listdir(out) if f.endswith(".npy")]
        assert mels, os.listdir(out)
        # trimmed mel artifact loads and is finite
        m = np.load(os.path.join(out, mels[0]))
        assert m.ndim == 2 and m.shape[1] == 80 and np.isfinite(m).all()

    def test_bare_resume_uses_persisted_hparams(self, workspace, capsys):
        """Resuming without repeating --override must restore the trained
        architecture from the persisted hparams.json (round-2 regression:
        the bare resume built a full-size model and crashed in Orbax restore;
        worse, it clobbered hparams.json before failing)."""
        import json

        from vaenar_tts_tpu.cli import train
        model_dir = str(workspace / "ckpt")  # trained by the test above
        before = json.load(open(os.path.join(model_dir, "hparams.json")))
        train.main(["--dataset", "ljspeech",
                    "--data_dir", str(workspace / "feats"),
                    "--model_dir", model_dir,
                    "--log_dir", str(workspace / "logs"),
                    "--max_epochs", "3", "--steps_per_epoch", "1"])
        out = capsys.readouterr().out
        assert "Resuming with persisted hparams.json" in out
        assert "Restored from epoch" in out
        after = json.load(open(os.path.join(model_dir, "hparams.json")))
        assert after["encoder"]["embd_dim"] == 32
        assert after == before

    def test_stream_wavs_mode(self, workspace, capsys):
        """--stream_wavs vocodes through the chunked streaming path and
        reports time-to-first-audio."""
        from vaenar_tts_tpu.cli import inference
        out = str(workspace / "streamed")
        inference.main(["--dataset", "ljspeech",
                        "--data_dir", str(workspace / "feats"),
                        "--model_dir", str(workspace / "ckpt"),
                        "--test_dir", out, "--batch_size", "2",
                        "--write_wavs", "--stream_wavs", "--host_vocoder"])
        assert any(f.endswith(".wav") for f in os.listdir(out))
        assert "time-to-first-audio" in capsys.readouterr().out

    def test_free_text_mode(self, workspace):
        from vaenar_tts_tpu.cli import inference
        lines = workspace / "lines.txt"
        lines.write_text("Hello world.\n")
        out = str(workspace / "freetext")
        inference.main(["--dataset", "ljspeech",
                        "--text", str(lines),
                        "--model_dir", str(workspace / "ckpt"),
                        "--test_dir", out])
        assert any(f.endswith(".wav") for f in os.listdir(out))

    def test_inference_from_npz_export(self, workspace, capsys):
        """A model_dir holding only {export.npz, hparams.json} (the portable
        trained-artifact form, scripts/export_checkpoint.py) synthesizes
        through the same CLI path as an Orbax workdir."""
        import shutil

        from vaenar_tts_tpu.cli import inference
        from vaenar_tts_tpu.utils.export import export_model_dir

        model_dir = str(workspace / "ckpt")
        export_dir = workspace / "export_only"
        export_dir.mkdir()
        export_model_dir(model_dir, str(export_dir / "export.npz"),
                         store_dtype="float16")
        shutil.copy2(os.path.join(model_dir, "hparams.json"),
                     str(export_dir / "hparams.json"))
        lines = workspace / "lines_export.txt"
        lines.write_text("Hello exported world.\n")
        out = str(workspace / "freetext_export")
        inference.main(["--dataset", "ljspeech", "--text", str(lines),
                        "--model_dir", str(export_dir), "--test_dir", out])
        assert any(f.endswith(".wav") for f in os.listdir(out))

        # a model_dir with no checkpoint in either format errors clearly,
        # naming both (tiny hparams.json keeps the probe's model init fast)
        empty = workspace / "empty_model_dir"
        empty.mkdir()
        shutil.copy2(os.path.join(model_dir, "hparams.json"),
                     str(empty / "hparams.json"))
        with pytest.raises(FileNotFoundError, match="export.npz"):
            inference.main(["--dataset", "ljspeech", "--text", str(lines),
                            "--model_dir", str(empty), "--test_dir", out,
                            *TINY_OVERRIDES[:0]])

    def test_free_text_multi_take(self, workspace, capsys):
        """--takes N synthesizes N z-samples per line and keeps the most
        monotonic-attention take (reference-free selection); mels + wavs +
        per-take selection report come out."""
        from vaenar_tts_tpu.cli import inference
        lines = workspace / "lines2.txt"
        lines.write_text("Hello world.\nA second line here.\n")
        out = str(workspace / "freetext_takes")
        inference.main(["--dataset", "ljspeech",
                        "--text", str(lines),
                        "--model_dir", str(workspace / "ckpt"),
                        "--test_dir", out, "--takes", "2", "--write_mels"])
        assert sum(f.endswith(".wav") for f in os.listdir(out)) == 2
        assert sum(f.endswith(".npy") for f in os.listdir(out)) == 2
        report = capsys.readouterr().out
        assert "take selection over 2 z-samples" in report

    def test_free_text_takes_temperatures(self, workspace, capsys):
        """--takes_temperatures cycles the takes through a temperature list
        (temperature-diverse ensembling); the selection report names the
        temperatures and artifacts still come out one-per-line."""
        from vaenar_tts_tpu.cli import inference
        lines = workspace / "lines3.txt"
        lines.write_text("Hello world.\n")
        out = str(workspace / "freetext_takes_temps")
        inference.main(["--dataset", "ljspeech",
                        "--text", str(lines),
                        "--model_dir", str(workspace / "ckpt"),
                        "--test_dir", out, "--takes", "3", "--write_mels",
                        "--takes_temperatures", "0.4,0.6,0.8"])
        assert sum(f.endswith(".wav") for f in os.listdir(out)) == 1
        report = capsys.readouterr().out
        assert ("take selection over 3 z-samples at temperatures "
                "[0.4, 0.6, 0.8]" in report)
