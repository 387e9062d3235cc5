"""The reference's own config files instantiate our models unchanged.

Reads every YAML under /root/reference/config (voice100's published
training recipes) and builds the model + datamodule + trainer config
through our CLI loader — the drop-in compatibility claim, tested.
Skipped when the reference tree isn't mounted.
"""

import glob
import os

import pytest

REF_CONFIG_DIR = "/root/reference/config"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CONFIG_DIR), reason="reference not mounted"
)


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(REF_CONFIG_DIR, "*.yaml")))
)
def test_reference_config_builds(path):
    from voice100_tpu.training.cli import load_config, build_from_config
    from voice100_tpu.models import (
        AudioToAlignText, TextToAlignText, AlignTextToAudio,
    )

    config = load_config(path)
    model, data, tc, audio_stat = build_from_config(config, {})
    assert isinstance(
        model, (AudioToAlignText, TextToAlignText, AlignTextToAudio)
    )
    assert tc.gradient_clip_val > 0
    name = os.path.basename(path)
    if name.startswith("asr"):
        assert isinstance(model, AudioToAlignText)
        assert data.vocoder == "mel"
        # model vocab matches the data pipeline's tokenizer
        assert model.vocab_size == data.vocab_size
    elif name.startswith("align"):
        assert isinstance(model, TextToAlignText)
        assert model.vocab_size == data.vocab_size
    elif name.startswith("tts"):
        assert isinstance(model, AlignTextToAudio)
        assert model.logspc_size == 25
        assert data.vocoder == "world_mcep"
        assert audio_stat  # reference TTS configs carry audio_stat


def test_reference_asr_base_model_shapes():
    """asr_en_base built from the reference config runs a forward."""
    import jax
    import jax.numpy as jnp
    from voice100_tpu.training.cli import load_config, build_from_config

    config = load_config(os.path.join(REF_CONFIG_DIR, "asr_en_base.yaml"))
    model, _, _, _ = build_from_config(config, {})
    audio = jnp.zeros((1, 64, 64))
    lengths = jnp.asarray([64])
    v = model.init(jax.random.PRNGKey(0), audio, lengths)
    logits, out_len = model.apply(v, audio, lengths)
    assert logits.shape == (1, 32, 29)


def test_vocab_size_mismatch_fails_fast():
    """A model/tokenizer vocab mismatch must abort with a clear error
    instead of training to a nan CTC loss (out-of-range labels)."""
    from voice100_tpu.training.cli import build_from_config

    config = {
        "model": {
            "class_path": "voice100_tpu.models.AudioToAlignText",
            "init_args": {
                "vocab_size": 44,  # phone vocab is actually 71
                "audio_size": 64,
                "encoder_settings": [[32, False, 3, 2, 1, False]],
                "decoder_num_layers": 1,
                "decoder_hidden_size": 32,
            },
        },
        "data": {
            "class_path": "voice100_tpu.data.AudioTextDataModule",
            "init_args": {
                "vocoder": "mel",
                "dataset": "dummy_en",
                "language": "en",
                "use_phone": True,
                "batch_size": 4,
            },
        },
    }
    with pytest.raises(SystemExit, match="vocab_size=44 does not match"):
        build_from_config(config, {})
