"""Tool-chain integration: the full reference workflow on the dummy
corpus (prepare-dataset -> align-text -> calc-stat -> TTS training ->
update-samples synthesis), end to end.
"""

import os

import numpy as np
import pytest
import yaml

from corpus_fixture import make_dummy_corpus


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("work")
    data_dir = str(root / "data")
    make_dummy_corpus(data_dir, n_clips=6)
    return root


def test_prepare_dataset(workdir):
    from voice100_tpu.tools.prepare_dataset import cli_main

    data_dir = str(workdir / "data")
    cli_main([
        "--data_dir", data_dir,
        "--dataset", "dummy_en",
        "--language", "en",
    ])
    out = os.path.join(data_dir, "dummy_en-train.txt")
    lines = open(out).read().strip().split("\n")
    assert len(lines) == 6
    assert all("|" in ln for ln in lines)

    cli_main([
        "--data_dir", data_dir,
        "--dataset", "dummy_en",
        "--language", "en",
        "--use_phone",
    ])
    out = os.path.join(data_dir, "dummy_en-phone-train.txt")
    assert sum(1 for _ in open(out)) == 6


def _tiny_asr_config(path, data_dir):
    cfg = {
        "seed_everything": 1234,
        "trainer": {"max_epochs": 1, "gradient_clip_val": 1.0},
        "model": {
            "class_path": "voice100_tpu.models.AudioToAlignText",
            "init_args": {
                "vocab_size": 29,
                "audio_size": 64,
                "encoder_settings": [[16, False, 3, 2, 1, False]],
                "decoder_num_layers": 1,
                "decoder_hidden_size": 16,
            },
        },
        "data": {
            "class_path": "voice100_tpu.data.AudioTextDataModule",
            "init_args": {
                "vocoder": "mel", "dataset": "dummy_en",
                "language": "en", "batch_size": 3,
                "data_dir": data_dir,
            },
        },
    }
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)


def test_align_text_tool(workdir):
    """Train a tiny ASR for one epoch, then force-align the corpus."""
    from voice100_tpu.training.cli import cli_main as fit_main
    from voice100_tpu.tools.align_text import cli_main as align_main

    data_dir = str(workdir / "data")
    cfg = str(workdir / "asr.yaml")
    _tiny_asr_config(cfg, data_dir)
    ckpt_dir = str(workdir / "asr_ckpt")
    fit_main([
        "fit", "--config", cfg,
        "--cache_dir", str(workdir / "cache"),
        "--checkpoint_dir", ckpt_dir,
    ])

    out = os.path.join(data_dir, "dummy_en-align-train.txt")
    align_main([
        "--config", cfg,
        "--checkpoint", os.path.join(ckpt_dir, "last"),
        "--data_dir", data_dir,
        "--cache_dir", str(workdir / "cache"),
        "--output", out,
    ])
    lines = open(out).read().strip().split("\n")
    assert len(lines) == 6
    for ln in lines:
        text, aligntext, counts = ln.split("|")
        counts = [int(c) for c in counts.split()]
        assert len(counts) == 2 * len(text) + 1
        # total frames distributed over slots equals the logit length
        assert sum(counts) > 0


def test_world_pipeline_and_update_samples(workdir):
    """calc-stat -> tiny TTS align+audio training -> sample synthesis."""
    from voice100_tpu.tools.calc_stat import cli_main as stat_main
    from voice100_tpu.training.cli import cli_main as fit_main
    from voice100_tpu.tools.update_samples import make_samples

    data_dir = str(workdir / "data")
    cache_dir = str(workdir / "cache")
    stat_path = str(workdir / "stat.npz")
    stat_main([
        "--output", stat_path,
        "--dataset", "dummy_en",
        "--vocoder", "world_mcep",
        "--data_dir", data_dir,
        "--cache_dir", cache_dir,
        "--batch_size", "3",
    ])
    stats = dict(np.load(stat_path))
    assert stats["logspc_mean"].shape == (25,)
    assert np.isfinite(stats["logspc_std"]).all()
    assert (stats["logspc_std"] > 0).all()

    # tiny align model config
    align_cfg = str(workdir / "align.yaml")
    with open(align_cfg, "w") as f:
        yaml.safe_dump({
            "seed_everything": 1234,
            "trainer": {"max_epochs": 1, "gradient_clip_val": 1.0,
                        "callbacks": [{"class_path": "ModelCheckpoint",
                                       "init_args": {"monitor": "train_loss"}}]},
            "model": {
                "class_path": "voice100_tpu.models.TextToAlignText",
                "init_args": {"vocab_size": 29, "num_layers": 1,
                              "hidden_size": 16, "num_outputs": 2},
            },
            "data": {
                "class_path": "voice100_tpu.data.AlignTextDataModule",
                "init_args": {"dataset": "dummy_en", "language": "en",
                              "batch_size": 3, "data_dir": data_dir},
            },
        }, f)
    align_ckpt = str(workdir / "align_ckpt")
    fit_main(["fit", "--config", align_cfg,
              "--checkpoint_dir", align_ckpt])

    # tiny TTS audio model config
    tts_cfg = str(workdir / "tts.yaml")
    with open(tts_cfg, "w") as f:
        yaml.safe_dump({
            "seed_everything": 1234,
            "trainer": {"max_epochs": 1, "gradient_clip_val": 1.0,
                        "callbacks": [{"class_path": "ModelCheckpoint",
                                       "init_args": {"monitor": "train_loss"}}]},
            "model": {
                "class_path": "voice100_tpu.models.AlignTextToAudio",
                "init_args": {
                    "vocab_size": 29, "logspc_size": 25, "codeap_size": 1,
                    "encoder_num_layers": 1, "encoder_hidden_size": 16,
                    "decoder_settings": [
                        [16, False, 3, 1, 1, False],
                        [16, True, 5, 2, 2, False],
                    ],
                },
            },
            "data": {
                "class_path": "voice100_tpu.data.AudioTextDataModule",
                "init_args": {"vocoder": "world_mcep", "dataset": "dummy_en",
                              "language": "en", "use_align": True,
                              "batch_size": 3, "data_dir": data_dir,
                              "cache_dir": cache_dir},
            },
        }, f)
    tts_ckpt = str(workdir / "tts_ckpt")
    fit_main(["fit", "--config", tts_cfg, "--checkpoint_dir", tts_ckpt,
              "--audio_stat", stat_path])

    # end-to-end synthesis (char-mode models here, so patch the
    # tokenizer choice by synthesizing from char phonemizer output)
    out_prefix = str(workdir / "sample")
    paths = make_samples(
        align_config=align_cfg,
        align_ckpt_path=os.path.join(align_ckpt, "last"),
        audio_config=tts_cfg,
        audio_ckpt_path=os.path.join(tts_ckpt, "last"),
        sample_texts=["hello world"],
        language="en",
        output_prefix=out_prefix,
        audio_stat=stat_path,
        use_phone=False,
    )
    assert len(paths) == 1
    from voice100_tpu.dsp.wav import read_wav

    wav, rate = read_wav(paths[0])
    assert rate == 16000
    assert wav.shape[1] > 1000
    assert np.isfinite(wav).all()

    # golden-audio determinism: regenerating the same text from the
    # same checkpoints must be bit-identical (catches nondeterminism
    # anywhere in tokenize -> align -> decode -> WORLD synthesis)
    paths2 = make_samples(
        align_config=align_cfg,
        align_ckpt_path=os.path.join(align_ckpt, "last"),
        audio_config=tts_cfg,
        audio_ckpt_path=os.path.join(tts_ckpt, "last"),
        sample_texts=["hello world"],
        language="en",
        output_prefix=str(workdir / "sample_rerun"),
        audio_stat=stat_path,
        use_phone=False,
    )
    with open(paths[0], "rb") as a, open(paths2[0], "rb") as b:
        assert a.read() == b.read(), "sample synthesis is nondeterministic"


def test_export_stablehlo(workdir, tmp_path):
    """Export the tiny ASR checkpoint as StableHLO and reload-run it."""
    import jax
    from jax import export as jax_export
    from voice100_tpu.tools.export import cli_main as export_main

    cfg = str(workdir / "asr.yaml")
    ckpt = os.path.join(str(workdir / "asr_ckpt"), "last")
    out = str(tmp_path / "asr.stablehlo")
    export_main(["--config", cfg, "--ckpt_path", ckpt, "--output", out])
    assert os.path.exists(out)
    assert os.path.exists(out + ".json")

    blob = open(out, "rb").read()
    exported = jax_export.deserialize(bytearray(blob))
    audio = np.zeros((1, 512, 64), np.float32)
    logits, logits_len = exported.call(audio, np.asarray([512], np.int32))
    assert logits.shape == (1, 256, 29)


def test_ja_phone_tts_pipeline(tmp_path):
    """Japanese phone-mode TTS end to end on a JA dummy corpus."""
    from corpus_fixture import make_dummy_corpus
    from voice100_tpu.tools.calc_stat import cli_main as stat_main
    from voice100_tpu.training.cli import cli_main as fit_main
    from voice100_tpu.tools.update_samples import make_samples

    data_dir = str(tmp_path / "data")
    make_dummy_corpus(data_dir, language="ja", n_clips=4)
    cache_dir = str(tmp_path / "cache")
    stat_path = str(tmp_path / "stat.npz")
    stat_main([
        "--output", stat_path, "--dataset", "dummy_ja",
        "--vocoder", "world_mcep", "--language", "ja", "--use_phone",
        "--data_dir", data_dir, "--cache_dir", cache_dir,
        "--batch_size", "2",
    ])

    align_cfg = str(tmp_path / "align.yaml")
    with open(align_cfg, "w") as f:
        yaml.safe_dump({
            "trainer": {"max_epochs": 1},
            "model": {"class_path": "voice100_tpu.models.TextToAlignText",
                      "init_args": {"vocab_size": 44, "num_layers": 1,
                                    "hidden_size": 16}},
            "data": {"class_path": "voice100_tpu.data.AlignTextDataModule",
                     "init_args": {"dataset": "dummy_ja", "language": "ja",
                                   "use_phone": True, "batch_size": 2,
                                   "data_dir": data_dir}},
        }, f)
    fit_main(["fit", "--config", align_cfg,
              "--checkpoint_dir", str(tmp_path / "align_ckpt")])

    tts_cfg = str(tmp_path / "tts.yaml")
    with open(tts_cfg, "w") as f:
        yaml.safe_dump({
            "trainer": {"max_epochs": 1},
            "model": {"class_path": "voice100_tpu.models.AlignTextToAudio",
                      "init_args": {"vocab_size": 44, "logspc_size": 25,
                                    "codeap_size": 1,
                                    "encoder_num_layers": 1,
                                    "encoder_hidden_size": 16,
                                    "decoder_settings": [
                                        [16, True, 5, 2, 2, False]]}},
            "data": {"class_path": "voice100_tpu.data.AudioTextDataModule",
                     "init_args": {"vocoder": "world_mcep",
                                   "dataset": "dummy_ja", "language": "ja",
                                   "use_align": True, "use_phone": True,
                                   "batch_size": 2, "data_dir": data_dir,
                                   "cache_dir": cache_dir}},
        }, f)
    fit_main(["fit", "--config", tts_cfg,
              "--checkpoint_dir", str(tmp_path / "tts_ckpt"),
              "--audio_stat", stat_path])

    paths = make_samples(
        align_config=align_cfg,
        align_ckpt_path=str(tmp_path / "align_ckpt" / "last"),
        audio_config=tts_cfg,
        audio_ckpt_path=str(tmp_path / "tts_ckpt" / "last"),
        sample_texts=["こんにちは世界"],
        language="ja",
        output_prefix=str(tmp_path / "sample"),
        audio_stat=stat_path,
    )
    from voice100_tpu.dsp.wav import read_wav

    wav, rate = read_wav(paths[0])
    assert rate == 16000 and np.isfinite(wav).all()
