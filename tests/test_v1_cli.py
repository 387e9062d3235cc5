"""v1 train CLI smoke tests (tiny models, one epoch, dummy corpus)."""

import os

import numpy as np
import pytest

from corpus_fixture import make_dummy_corpus


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("v1")
    make_dummy_corpus(str(root / "data"), n_clips=4)
    return root


def _common(workdir, name):
    return [
        "--dataset", "dummy_en",
        "--data_dir", str(workdir / "data"),
        "--cache_dir", str(workdir / "cache"),
        "--batch_size", "2",
        "--max_epochs", "1",
        "--hidden_size", "8",
        "--checkpoint_dir", str(workdir / name),
    ]


def test_train_asr_v1(workdir):
    from voice100_tpu.tools.train_v1 import asr_cli_main

    asr_cli_main(_common(workdir, "asr") + ["--embed_size", "8"])
    assert os.path.isdir(str(workdir / "asr" / "last"))


def test_train_align_v1(workdir):
    from voice100_tpu.tools.train_v1 import align_cli_main

    align_cli_main(_common(workdir, "align"))
    assert os.path.isdir(str(workdir / "align" / "last"))


def test_train_ttsalign_v1(workdir):
    from voice100_tpu.tools.train_v1 import ttsalign_cli_main

    ttsalign_cli_main(_common(workdir, "ttsalign"))
    assert os.path.isdir(str(workdir / "ttsalign" / "last"))


def test_train_ttsaudio_v1(workdir, tmp_path):
    from voice100_tpu.tools.calc_stat import cli_main as stat_main
    from voice100_tpu.tools.train_v1 import ttsaudio_cli_main

    stat_path = str(workdir / "data" / "dummy_en-stat.npz")
    stat_main([
        "--output", stat_path, "--dataset", "dummy_en",
        "--vocoder", "world", "--data_dir", str(workdir / "data"),
        "--cache_dir", str(workdir / "cache_w"), "--batch_size", "2",
    ])
    ttsaudio_cli_main(
        _common(workdir, "ttsaudio")
        + ["--vocoder", "world",
           "--cache_dir", str(workdir / "cache_w")]
    )
    assert os.path.isdir(str(workdir / "ttsaudio" / "last"))


def test_train_ttsaudio_mt_v1(workdir):
    from voice100_tpu.tools.train_v1 import ttsaudio_mt_cli_main

    ttsaudio_mt_cli_main(
        _common(workdir, "ttsaudio_mt")
        + ["--vocoder", "world",
           "--cache_dir", str(workdir / "cache_w")]
    )
    assert os.path.isdir(str(workdir / "ttsaudio_mt" / "last"))
