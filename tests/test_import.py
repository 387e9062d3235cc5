"""Import smoke test — every module loads
(mirrors /root/reference/tests/test_import.py)."""

import importlib

import pytest

MODULES = [
    "voice100_tpu",
    "voice100_tpu.text",
    "voice100_tpu.text.tokenizers",
    "voice100_tpu.text.phonemizers",
    "voice100_tpu.text.g2p",
    "voice100_tpu.text.japanese",
    "voice100_tpu.text.japanese.kana",
    "voice100_tpu.text.japanese.yomi",
    "voice100_tpu.ops",
    "voice100_tpu.ops.melspec",
    "voice100_tpu.ops.melspec_pallas",
    "voice100_tpu.ops.lstm",
    "voice100_tpu.ops.ctc",
    "voice100_tpu.ops.augment",
    "voice100_tpu.ops.duration",
    "voice100_tpu.ops.mask",
    "voice100_tpu.models",
    "voice100_tpu.models.layers",
    "voice100_tpu.models.losses",
    "voice100_tpu.dsp",
    "voice100_tpu.dsp.wav",
    "voice100_tpu.dsp.resample",
    "voice100_tpu.dsp.mcep",
    "voice100_tpu.dsp.world",
    "voice100_tpu.data",
    "voice100_tpu.parallel",
    "voice100_tpu.training",
    "voice100_tpu.training.cli",
    "voice100_tpu.inference",
    "voice100_tpu.tools.prepare_dataset",
    "voice100_tpu.tools.align_text",
    "voice100_tpu.tools.calc_stat",
    "voice100_tpu.tools.cache_dataset",
    "voice100_tpu.tools.update_samples",
    "voice100_tpu.tools.export",
    "voice100_tpu.tools.train_v1",
]


@pytest.mark.parametrize("name", MODULES)
def test_import(name):
    importlib.import_module(name)
