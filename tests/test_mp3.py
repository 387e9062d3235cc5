"""MP3 decode + CommonVoice (cv_ja) corpus tests.

The reference loads CommonVoice mp3 clips via torchaudio/sox
(voice100/data_modules.py:303-314, cv_ja registry at 386-390); the
framework decodes them natively (voice100_tpu/native/audioio.cpp via
the system MPEG decoder). Fixtures are encoded hermetically with
libmp3lame (tests/mp3_fixture.py).
"""

import numpy as np
import pytest

from corpus_fixture import make_cv_corpus
from mp3_fixture import lame_available, write_mp3

from voice100_tpu.native import mp3 as native_mp3

needs_codecs = pytest.mark.skipif(
    not (lame_available() and native_mp3.mp3_available()),
    reason="system mp3 codec libraries unavailable",
)


@needs_codecs
def test_mp3_tone_roundtrip(tmp_path):
    from voice100_tpu.dsp.audioio import load_audio

    rate = 24000
    t = np.arange(rate) / rate
    sig = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    path = str(tmp_path / "tone.mp3")
    write_mp3(path, sig, rate)

    raw, r = native_mp3.read_mp3(path)
    assert r == rate
    assert raw.shape[0] == 1
    # encoder delay shifts length slightly; a second at 24 kHz +- 2 frames
    assert abs(raw.shape[1] - rate) < 3000
    assert 0.3 < np.abs(raw).max() < 0.7

    wav = load_audio(path, 16000)
    assert wav.dtype == np.float32
    spec = np.abs(np.fft.rfft(wav * np.hanning(len(wav))))
    freq = np.fft.rfftfreq(len(wav), 1.0 / 16000)
    assert abs(freq[spec.argmax()] - 440.0) < 5.0


@needs_codecs
def test_cv_ja_dataset_and_loading(tmp_path):
    from voice100_tpu.data.registry import get_base_dataset
    from voice100_tpu.dsp.audioio import load_audio

    make_cv_corpus(str(tmp_path), n_clips=4)
    ds = get_base_dataset(str(tmp_path), "cv_ja", "train")
    assert len(ds) == 4
    clipid, path, text = ds[0]
    assert path.endswith(".mp3")
    assert len(text) > 0
    wav = load_audio(path, 16000)
    assert wav.ndim == 1 and len(wav) > 4000


@needs_codecs
def test_cv_ja_asr_trains_one_epoch(tmp_path):
    """The cv_ja path end-to-end: mp3 decode -> mel -> JA char CTC."""
    from voice100_tpu.data import AudioTextDataModule
    from voice100_tpu.models import AudioToAlignText
    from voice100_tpu.tools.prepare_dataset import cli_main as prepare
    from voice100_tpu.training.trainer import Trainer, TrainerConfig

    make_cv_corpus(str(tmp_path), n_clips=4)
    prepare([
        "--data_dir", str(tmp_path), "--dataset", "cv_ja",
        "--language", "ja",
    ])
    data = AudioTextDataModule(
        vocoder="mel",
        dataset="cv_ja",
        language="ja",
        data_dir=str(tmp_path),
        cache_dir=str(tmp_path / "cache"),
        batch_size=2,
        valid_ratio=0.25,
    )
    data.setup("fit")
    model = AudioToAlignText(
        audio_size=64,
        vocab_size=data.vocab_size,
        encoder_settings=((16, False, 3, 2, 1, False),),
        decoder_num_layers=1,
        decoder_hidden_size=16,
    )
    trainer = Trainer(TrainerConfig(max_epochs=1))
    state = trainer.fit(model, data)
    assert state is not None
