"""Model construction, shape/length, loss, and parameter-count tests.

Parameter counts are pinned to the reference's published model cards
(/root/reference/README.md:57-168).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def param_count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


# encoder settings from config/asr_en_base.yaml:17-21 / asr_en_small.yaml
ASR_BASE_ENC = ((512, False, 5, 2, 2, False), (512, False, 5, 1, 2, False))
ASR_SMALL_ENC = ((256, False, 3, 2, 1, False), (256, False, 3, 1, 1, False))


def test_asr_v2_shapes_and_loss():
    from voice100_tpu.models import AudioToAlignText

    model = AudioToAlignText(
        audio_size=64,
        vocab_size=29,
        encoder_settings=ASR_SMALL_ENC,
        decoder_num_layers=2,
        decoder_hidden_size=256,
    )
    batch, time = 2, 17
    audio = jnp.zeros((batch, time, 64))
    audio_len = jnp.asarray([17, 9], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), audio, audio_len)
    logits, logits_len = model.apply(variables, audio, audio_len)
    assert logits.shape == (batch, (time + 1) // 2, 29)
    np.testing.assert_array_equal(np.asarray(logits_len), [9, 5])

    text = jnp.asarray([[5, 6, 7, 0], [3, 4, 0, 0]], jnp.int32)
    text_len = jnp.asarray([3, 2], jnp.int32)
    loss = model.apply(
        variables, audio, audio_len, text, text_len,
        method=AudioToAlignText.compute_loss,
    )
    assert np.isfinite(float(loss))

    # train mode with augmentation + dropout rngs
    loss_t = model.apply(
        variables, audio, audio_len, text, text_len, False,
        method=AudioToAlignText.compute_loss,
        rngs={
            "augment": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2),
        },
    )
    assert np.isfinite(float(loss_t))

    res, logits_len = model.apply(
        variables, audio, audio_len, text, text_len,
        method=AudioToAlignText.ctc_best_path,
    )
    assert res.labels.shape == (batch, (time + 1) // 2)


def test_align_v2_shapes_and_loss():
    from voice100_tpu.models import TextToAlignText

    model = TextToAlignText(vocab_size=29, hidden_size=32, num_layers=2)
    text = jnp.asarray([[5, 6, 7, 0], [3, 4, 0, 0]], jnp.int32)
    text_len = jnp.asarray([3, 2], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), text, text_len)
    pred = model.apply(variables, text, text_len)
    assert pred.shape == (2, 4, 2)

    durations = model.apply(
        variables, text, text_len, method=TextToAlignText.predict
    )
    assert np.all(np.asarray(durations) > -1.0)

    align = jnp.asarray(
        [[0, 2, 1, 3, 0, 2, 0, 0, 0], [1, 1, 0, 2, 0, 0, 0, 0, 0]],
        jnp.int32,
    )
    align_len = jnp.asarray([7, 5], jnp.int32)
    loss = model.apply(
        variables, text, text_len, align, align_len,
        method=TextToAlignText.compute_loss,
    )
    assert np.isfinite(float(loss))


def test_tts_v2_shapes_and_loss():
    from voice100_tpu.models import AlignTextToAudio

    model = AlignTextToAudio(
        vocab_size=29,
        logspc_size=25,
        codeap_size=1,
        encoder_num_layers=2,
        encoder_hidden_size=32,
        decoder_settings=(
            (32, False, 5, 1, 2, False),
            (32, True, 5, 2, 2, False),
            (32, False, 5, 1, 2, False),
        ),
    )
    aligntext = jnp.zeros((2, 10), jnp.int32)
    aligntext_len = jnp.asarray([10, 6], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), aligntext, aligntext_len)
    hasf0, f0, logspc, hascodeap, codeap = model.apply(
        variables, aligntext, aligntext_len
    )
    t_out = 2 * 10 - 1  # conv(T) -> convT: 2T-1 -> conv
    assert hasf0.shape == (2, t_out)
    assert logspc.shape == (2, t_out, 25)
    assert codeap.shape == (2, t_out, 1)

    f0p, logspcp, codeapp = model.apply(
        variables, aligntext, aligntext_len, method=AlignTextToAudio.predict
    )
    assert f0p.shape == (2, t_out)

    t_feat = 20
    f0_t = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (2, t_feat))) * 100
    logspc_t = jax.random.normal(jax.random.PRNGKey(2), (2, t_feat, 25))
    codeap_t = -jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (2, t_feat, 1)))
    f0_len = jnp.asarray([20, 12], jnp.int32)
    losses = model.apply(
        variables, f0_t, f0_len, logspc_t, codeap_t, aligntext, aligntext_len,
        method=AlignTextToAudio.compute_loss,
    )
    total = model.total_loss(losses)
    assert np.isfinite(float(total))


def test_param_counts_match_reference_model_cards():
    from voice100_tpu.models import (
        AudioToTextCTC,
        AudioAlignCTC,
        TextToAlignTextModel,
        AlignTextToAudioModel,
    )

    # ASR conv CTC: 11.6M trainable (README.md:135-147)
    model = AudioToTextCTC(audio_size=64, vocab_size=29)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 64)))
    n = param_count(v["params"])
    assert 11.0e6 < n < 12.2e6, n

    # forced aligner: 691K trainable (README.md:155-168)
    model = AudioAlignCTC(audio_size=64, vocab_size=29)
    v = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 64)), jnp.asarray([16])
    )
    n = param_count(v["params"])
    assert 0.65e6 < n < 0.73e6, n

    # TTS align: 8.6M trainable (README.md:59-69)
    model = TextToAlignTextModel(vocab_size=29, hidden_size=512)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16), jnp.int32))
    n = param_count(v["params"])
    assert 8.2e6 < n < 9.0e6, n

    # TTS audio: 11.1M trainable + 518 frozen stats (README.md:71-85)
    model = AlignTextToAudioModel(vocab_size=29, hidden_size=512)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16), jnp.int32))
    n = param_count(v["params"])
    assert 10.6e6 < n < 11.6e6, n
    assert param_count(v["world_norm"]) == 518


def test_asr_v1_loss_and_batchnorm():
    from voice100_tpu.models import AudioToTextCTC

    model = AudioToTextCTC(
        audio_size=8, vocab_size=7, embed_size=16, hidden_size=16
    )
    audio = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 8))
    audio_len = jnp.asarray([12, 8], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), audio)
    logits = model.apply(variables, audio)
    assert logits.shape == (2, 6, 7)

    text = jnp.asarray([[1, 2, 3], [4, 5, 0]], jnp.int32)
    text_len = jnp.asarray([3, 2], jnp.int32)
    loss, mutated = model.apply(
        variables, audio, audio_len, text, text_len, False,
        method=AudioToTextCTC.compute_loss,
        rngs={
            "augment": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2),
        },
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(loss))
    assert "batch_stats" in mutated


def test_tts_v1_multitask_constructible_and_loss():
    from voice100_tpu.models import AlignTextToAudioMultiTaskModel

    model = AlignTextToAudioMultiTaskModel(
        vocab_size=29, target_vocab_size=71, hidden_size=16, use_mcep=True
    )
    aligntext = jnp.zeros((2, 8), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), aligntext)
    f0, logspc, codeap, logits = model.apply(
        v, aligntext, method=AlignTextToAudioMultiTaskModel.predict
    )
    assert f0.shape == (2, 15)
    assert logits.shape == (2, 8, 71)

    t = 15
    losses = model.apply(
        v,
        jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (2, t))) * 100,
        jnp.asarray([15, 10], jnp.int32),
        jax.random.normal(jax.random.PRNGKey(2), (2, t, 25)),
        -jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (2, t, 1))),
        aligntext,
        jnp.asarray([8, 6], jnp.int32),
        jnp.ones((2, 8), jnp.int32),
        jnp.asarray([8, 6], jnp.int32),
        method=AlignTextToAudioMultiTaskModel.compute_loss,
    )
    for loss in losses:
        assert np.isfinite(float(loss))


def test_duration_expansion_matches_reference_loop():
    """Oracle: direct port of the reference cursor loop
    (voice100/models/_align_v2.py:48-75)."""
    from voice100_tpu.ops.duration import expand_alignment, aligntext_length

    def ref_align(text, align, head=5, tail=5):
        aligntext_len = head + int(np.sum(align) - align[0, 0]) + tail
        aligntext = np.zeros(aligntext_len, dtype=np.int64)
        t = head
        u = 0
        for i in range(align.shape[0]):
            if i > 0:
                t += align[i, 0]
            s = int(t)
            s = max(s, u)
            u = s + 1
            t += align[i, 1]
            e = int(t)
            e = max(e, u)
            u = e
            aligntext[s:e] = text[i]
        return aligntext

    rng = np.random.RandomState(0)
    for trial in range(8):
        n = rng.randint(2, 12)
        text = rng.randint(1, 29, size=n)
        align = rng.uniform(0.0, 3.0, size=(n, 2)).astype(np.float32)
        expected = ref_align(text, align)
        out_len = int(
            aligntext_length(jnp.asarray(align))
        )
        got = np.asarray(
            expand_alignment(
                jnp.asarray(text), jnp.asarray(align), jnp.asarray(n), out_len
            )
        )
        assert out_len == expected.shape[0]
        np.testing.assert_array_equal(got, expected)


def test_augment_shapes_and_finiteness():
    from voice100_tpu.ops.augment import batch_spectrogram_augment

    audio = jax.random.normal(jax.random.PRNGKey(0), (3, 40, 64)) - 5.0
    audio_len = jnp.asarray([40, 25, 10], jnp.int32)
    for seed in range(6):
        out, out_len = batch_spectrogram_augment(
            jax.random.PRNGKey(seed), audio, audio_len
        )
        assert out.shape == audio.shape
        assert np.isfinite(np.asarray(out)).all()
        assert np.all(np.asarray(out_len) <= 40)
        assert np.all(np.asarray(out_len) >= 1)
