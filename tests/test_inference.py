"""Serving pipeline tests: bucketed batch ASR and TTS inference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_asr_pipeline_transcribes():
    from voice100_tpu.models import AudioToAlignText
    from voice100_tpu.inference import ASRPipeline

    model = AudioToAlignText(
        audio_size=64,
        vocab_size=29,
        encoder_settings=((16, False, 3, 2, 1, False),),
        decoder_num_layers=1,
        decoder_hidden_size=16,
    )
    audio = jnp.zeros((1, 101, 64))
    variables = model.init(
        jax.random.PRNGKey(0), audio, jnp.asarray([101])
    )
    pipe = ASRPipeline(model, variables, batch_size=2,
                       buckets_sec=(0.5, 1.0))
    rng = np.random.RandomState(0)
    wavs = [
        rng.randn(4000).astype(np.float32) * 0.1,
        rng.randn(9000).astype(np.float32) * 0.1,
        rng.randn(2500).astype(np.float32) * 0.1,
    ]
    out = pipe.transcribe(wavs)
    assert len(out) == 3
    for text in out:
        assert isinstance(text, str)
        # untrained model: any decodable string is fine, must not crash


def test_tts_pipeline_synthesizes():
    from voice100_tpu.models import TextToAlignText, AlignTextToAudio
    from voice100_tpu.inference import TTSPipeline

    align = TextToAlignText(vocab_size=29, num_layers=1, hidden_size=16)
    text = jnp.zeros((1, 8), jnp.int32)
    align_vars = align.init(jax.random.PRNGKey(0), text, jnp.asarray([8]))

    audio = AlignTextToAudio(
        vocab_size=29, logspc_size=25, codeap_size=1,
        encoder_num_layers=1, encoder_hidden_size=16,
        decoder_settings=((16, False, 3, 1, 1, False),
                          (16, True, 5, 2, 2, False)),
    )
    audio_vars = audio.init(
        jax.random.PRNGKey(0), text, jnp.asarray([8])
    )
    pipe = TTSPipeline(
        align, align_vars, audio, audio_vars,
        language="en", use_phone=False,
        text_buckets=(32,), frame_buckets=(128, 256),
    )
    wavs = pipe.synthesize(["hello world", "ok"])
    assert len(wavs) == 2
    for w in wavs:
        assert w.ndim == 1
        assert w.size > 100
        assert np.isfinite(w).all()


def test_asr_pipeline_mesh_dp_matches_single_device():
    """Data-parallel serving over an 8-device mesh returns the exact
    transcripts of the single-device pipeline."""
    from voice100_tpu.models import AudioToAlignText
    from voice100_tpu.inference import ASRPipeline
    from voice100_tpu.parallel.mesh import make_mesh

    model = AudioToAlignText(
        audio_size=64,
        vocab_size=29,
        encoder_settings=((16, False, 3, 2, 1, False),),
        decoder_num_layers=1,
        decoder_hidden_size=16,
    )
    audio = jnp.zeros((1, 101, 64))
    variables = model.init(
        jax.random.PRNGKey(0), audio, jnp.asarray([101])
    )
    rng = np.random.RandomState(1)
    wavs = [rng.randn(4000 + 500 * i).astype(np.float32) * 0.1
            for i in range(8)]

    single = ASRPipeline(model, variables, batch_size=8,
                         buckets_sec=(0.5, 1.0)).transcribe(wavs)
    mesh = make_mesh(jax.devices(), data=8, model=1)
    dp = ASRPipeline(model, variables, batch_size=8,
                     buckets_sec=(0.5, 1.0), mesh=mesh).transcribe(wavs)
    assert dp == single

    with pytest.raises(ValueError):
        ASRPipeline(model, variables, batch_size=3, mesh=mesh)
