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


def test_asr_pipeline_int16_pcm_matches_float():
    """int16 PCM input uploads raw and is normalized on device by the
    exact power-of-two 1/32768 — transcripts must match the float32
    path bit-for-bit, including mixed-dtype batches (where int16
    entries are scaled on host into the float batch)."""
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
    rng = np.random.RandomState(1)
    pcm = [
        (rng.randn(4000) * 3000).astype(np.int16),
        (rng.randn(9000) * 3000).astype(np.int16),
        (rng.randn(2500) * 3000).astype(np.int16),
    ]
    floats = [w.astype(np.float32) / 32768.0 for w in pcm]
    assert pipe.transcribe(pcm) == pipe.transcribe(floats)
    mixed = [pcm[0], floats[1], pcm[2]]
    assert pipe.transcribe(mixed) == pipe.transcribe(floats)


def test_streaming_feed_int16_matches_float():
    from voice100_tpu.inference import StreamingASRSession

    rng = np.random.RandomState(2)
    pcm = (rng.randn(3200) * 3000).astype(np.int16)
    buffers = []
    for chunk in (pcm, pcm.astype(np.float32) / 32768.0):
        s = StreamingASRSession.__new__(StreamingASRSession)
        s._buffer = np.zeros(0, np.float32)
        s._committed_ids = []
        s._since_decode = 0
        s.chunk = 10 ** 9  # never triggers a device decode

        class _Tok:
            def decode(self, ids):
                return ""

            def merge_repeated(self, s):
                return s

        class _Pipe:
            tokenizer = _Tok()

        s.pipeline = _Pipe()
        StreamingASRSession.feed(s, chunk)
        buffers.append(s._buffer)
    np.testing.assert_array_equal(buffers[0], buffers[1])


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

    # int16 output is the device-side quantization of the float path
    pcm = pipe.synthesize(["hello world", "ok"], output_dtype=np.int16)
    for w16, w32 in zip(pcm, wavs):
        assert w16.dtype == np.int16
        assert w16.shape == w32.shape
        expect = np.round(np.clip(w32, -1.0, 1.0) * 32767.0)
        np.testing.assert_allclose(
            w16.astype(np.float32), expect, atol=1.0
        )


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


def test_streaming_asr_matches_offline_on_trained_model(tmp_path):
    """Streaming block decode must agree with offline transcription on
    a briefly-trained model (peaked logits -> stable commits), and
    partial transcripts must grow as a prefix chain."""
    import sys

    sys.path.insert(0, "tests")
    from corpus_fixture import make_dummy_corpus

    from voice100_tpu.data import AudioTextDataModule
    from voice100_tpu.dsp.audioio import load_audio
    from voice100_tpu.inference import ASRPipeline, StreamingASRSession
    from voice100_tpu.models import AudioToAlignText
    from voice100_tpu.ops.metrics import levenshtein
    from voice100_tpu.training import Trainer, TrainerConfig

    root = make_dummy_corpus(str(tmp_path), n_clips=4)
    data = AudioTextDataModule(
        vocoder="mel", dataset="dummy_en", data_dir=str(tmp_path),
        cache_dir=str(tmp_path / "cache"), batch_size=4, valid_ratio=0.0,
    )
    model = AudioToAlignText(
        audio_size=64, vocab_size=29,
        encoder_settings=((32, False, 3, 2, 1, False),
                          (32, False, 3, 1, 1, False)),
        decoder_num_layers=1, decoder_hidden_size=32,
    )
    trainer = Trainer(TrainerConfig(max_epochs=10, monitor="train_loss"))
    state = trainer.fit(model, data)
    variables = {"params": state.params, **state.extra}

    wav = load_audio(f"{root}/wavs/clip0000.wav", 16000)
    pipe = ASRPipeline(model, variables, batch_size=1,
                       buckets_sec=(0.5, 1.0, 2.0))
    offline = pipe.transcribe([wav])[0]

    session = StreamingASRSession(pipe, chunk_sec=0.2,
                                  right_context_sec=0.3,
                                  left_context_sec=0.5)
    partials = []
    for start in range(0, len(wav), 1600):  # 100 ms chunks
        partials.append(session.feed(wav[start:start + 1600]))
    final = session.finish()

    # prefix-monotone partial transcripts
    for a, b in zip(partials, partials[1:] + [final]):
        assert b.startswith(a), (a, b)
    # trained logits are peaked: streaming agrees with offline (allow a
    # small boundary tolerance)
    dist = levenshtein(offline, final)
    assert dist <= max(2, len(offline) // 10), (offline, final)


def test_streaming_asr_no_commit_path_is_offline_identical():
    """With an effectively infinite right context nothing commits until
    finish(), which must then equal offline transcription exactly."""
    from voice100_tpu.inference import ASRPipeline, StreamingASRSession
    from voice100_tpu.models import AudioToAlignText

    model = AudioToAlignText(
        audio_size=64, vocab_size=29,
        encoder_settings=((16, False, 3, 2, 1, False),),
        decoder_num_layers=1, decoder_hidden_size=16,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 51, 64)), jnp.asarray([51])
    )
    rng = np.random.RandomState(7)
    wav = (rng.randn(12000) * 0.1).astype(np.float32)
    pipe = ASRPipeline(model, variables, batch_size=1,
                       buckets_sec=(0.5, 1.0))
    offline = pipe.transcribe([wav])[0]

    session = StreamingASRSession(pipe, chunk_sec=0.1,
                                  right_context_sec=1e9,
                                  left_context_sec=None)
    for start in range(0, len(wav), 777):
        session.feed(wav[start:start + 777])
    assert session.finish() == offline


def test_transcribe_long_form_routes_through_streaming():
    """Clips longer than the largest bucket stream instead of being
    truncated; short clips in the same call still batch-decode."""
    from voice100_tpu.inference import ASRPipeline
    from voice100_tpu.models import AudioToAlignText

    model = AudioToAlignText(
        audio_size=64, vocab_size=29,
        encoder_settings=((16, False, 3, 2, 1, False),),
        decoder_num_layers=1, decoder_hidden_size=16,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 51, 64)), jnp.asarray([51])
    )
    rng = np.random.RandomState(3)
    short = (rng.randn(6000) * 0.1).astype(np.float32)
    long = (rng.randn(40000) * 0.1).astype(np.float32)  # > 1.0 s bucket
    pipe = ASRPipeline(model, variables, batch_size=2,
                       buckets_sec=(0.5, 1.0))
    out = pipe.transcribe([short, long, short])
    assert len(out) == 3
    assert all(isinstance(t, str) for t in out)
    # the long clip decodes all ~125 logit frames, not just the first
    # bucket's worth; with random logits the transcript length loosely
    # tracks the audio length, so just assert the session consumed the
    # full stream via its frame bookkeeping
    from voice100_tpu.inference import StreamingASRSession

    session = StreamingASRSession(pipe, chunk_sec=0.5,
                                  right_context_sec=0.5,
                                  left_context_sec=1.0)
    for start in range(0, len(long), 8000):
        session.feed(long[start:start + 8000])
    session.finish()
    assert session._committed_frame >= len(long) // 320


def test_long_form_content_matches_wide_bucket_pipeline(tmp_path):
    """A long clip streamed through a small-bucket pipeline must yield
    (nearly) the transcript of a pipeline whose buckets fit the whole
    clip — no interior audio may be lost to the window bound."""
    import sys

    sys.path.insert(0, "tests")
    from corpus_fixture import make_dummy_corpus

    from voice100_tpu.data import AudioTextDataModule
    from voice100_tpu.dsp.audioio import load_audio
    from voice100_tpu.inference import ASRPipeline
    from voice100_tpu.models import AudioToAlignText
    from voice100_tpu.ops.metrics import levenshtein
    from voice100_tpu.training import Trainer, TrainerConfig

    root = make_dummy_corpus(str(tmp_path), n_clips=4)
    data = AudioTextDataModule(
        vocoder="mel", dataset="dummy_en", data_dir=str(tmp_path),
        cache_dir=str(tmp_path / "cache"), batch_size=4, valid_ratio=0.0,
    )
    model = AudioToAlignText(
        audio_size=64, vocab_size=29,
        encoder_settings=((32, False, 3, 2, 1, False),
                          (32, False, 3, 1, 1, False)),
        decoder_num_layers=1, decoder_hidden_size=32,
    )
    trainer = Trainer(TrainerConfig(max_epochs=10, monitor="train_loss"))
    state = trainer.fit(model, data)
    variables = {"params": state.params, **state.extra}

    # a ~3.3 s "long" clip: three training clips back to back
    wavs = [load_audio(f"{root}/wavs/clip{i:04d}.wav", 16000)
            for i in range(3)]
    long_clip = np.concatenate(wavs)

    wide = ASRPipeline(model, variables, batch_size=1,
                       buckets_sec=(0.5, 1.0, 2.0, 4.0, 8.0))
    offline = wide.transcribe([long_clip])[0]

    narrow = ASRPipeline(model, variables, batch_size=1,
                         buckets_sec=(0.5, 1.0, 2.0))  # clip > 2.0 s
    streamed = narrow.transcribe([long_clip])[0]

    dist = levenshtein(offline, streamed)
    assert dist <= max(3, len(offline) // 5), (offline, streamed)


def test_tts_pipeline_mesh_dp_matches_single_device():
    """Data-parallel TTS over an 8-device mesh synthesizes the same
    waveforms as the single-device pipeline (pad rows sharded off)."""
    from voice100_tpu.inference import TTSPipeline
    from voice100_tpu.models import AlignTextToAudio, TextToAlignText
    from voice100_tpu.parallel.mesh import make_mesh

    align = TextToAlignText(vocab_size=29, num_layers=1, hidden_size=16)
    align_vars = align.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
        jnp.asarray([8]),
    )
    audio = AlignTextToAudio(
        vocab_size=29, encoder_num_layers=1, encoder_hidden_size=16,
        decoder_settings=((16, False, 5, 1, 2, False),
                          (16, True, 5, 2, 2, False)),
    )
    audio_vars = audio.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32),
        jnp.asarray([8]),
    )
    texts = ["hello world", "abc", "testing"]  # 3 texts -> pad to 8 rows

    single = TTSPipeline(align, align_vars, audio, audio_vars,
                         language="en", use_phone=False)
    mesh = make_mesh(jax.devices(), data=8, model=1)
    dp = TTSPipeline(align, align_vars, audio, audio_vars,
                     language="en", use_phone=False, mesh=mesh)
    wav_s = single.synthesize(texts)
    wav_d = dp.synthesize(texts)
    assert len(wav_s) == len(wav_d) == 3
    for a, b in zip(wav_s, wav_d):
        assert a.shape == b.shape
        # batch padding changes reduction order; tiny fp drift expected
        np.testing.assert_allclose(a, b, atol=2e-3)


def test_tts_pipeline_long_form_routing():
    """Texts longer than the largest text bucket synthesize piecewise
    (split at punctuation/word boundaries) and concatenate — the
    bucket is no longer a silent truncation limit."""
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
    audio_vars = audio.init(jax.random.PRNGKey(0), text, jnp.asarray([8]))
    pipe = TTSPipeline(
        align, align_vars, audio, audio_vars,
        language="en", use_phone=False,
        text_buckets=(32,), frame_buckets=(128, 256),
    )

    long_text = ("the quick brown fox jumps over the lazy dog. "
                 "pack my box with five dozen liquor jugs. "
                 "how vexingly quick daft zebras jump.")
    assert pipe._encoded_len(long_text) > 32

    pieces = pipe._split_long(long_text)
    assert len(pieces) > 1
    for p in pieces:
        assert pipe._encoded_len(p) <= 32
    # nothing dropped: the pieces re-join to the original words
    assert " ".join(pieces).split() == long_text.split()

    short_wav = pipe.synthesize(["a short one"])[0]
    long_wav, short2 = pipe.synthesize([long_text, "a short one"])
    assert long_wav.ndim == 1 and np.isfinite(long_wav).all()
    # the long input renders every piece: it is much longer than a
    # single max-bucket synthesis could be
    per_piece_min = short_wav.size  # each piece >= head/tail padding
    assert long_wav.size > 2 * per_piece_min
    # the short text is unaffected by sharing a batch with long-form
    # pieces (same duration model -> same length; synthesis noise may
    # differ bitwise across batch compositions)
    assert short2.shape == short_wav.shape

    # unspaced scripts split too (character-level fallback)
    ja_pipe_split = pipe._split_long("a" * 100)
    assert all(pipe._encoded_len(p) <= 32 for p in ja_pipe_split)
    assert "".join(ja_pipe_split) == "a" * 100
