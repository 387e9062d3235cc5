"""Fine-grained semantics tests for on-device ops."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_sequence_mask():
    from voice100_tpu.ops.mask import sequence_mask

    m = np.asarray(sequence_mask(jnp.asarray([3, 0, 5]), 5))
    assert m.shape == (3, 5)
    np.testing.assert_array_equal(m[0], [1, 1, 1, 0, 0])
    np.testing.assert_array_equal(m[1], [0, 0, 0, 0, 0])
    np.testing.assert_array_equal(m[2], [1, 1, 1, 1, 1])


def test_augment_timestretch_scales_lengths():
    from voice100_tpu.ops.augment import batch_spectrogram_augment

    audio = jnp.zeros((2, 50, 64)) - 5.0
    audio_len = jnp.asarray([50, 30], jnp.int32)
    # find a seed where timestretch fires, verify length scaling bound
    fired = False
    for seed in range(40):
        out, out_len = batch_spectrogram_augment(
            jax.random.PRNGKey(seed), audio, audio_len
        )
        out_len = np.asarray(out_len)
        if not np.array_equal(out_len, np.asarray(audio_len)):
            fired = True
            # stretched lengths stay within the 50-150% window (clamped
            # to capacity)
            assert (out_len >= np.asarray(audio_len) // 2 - 1).all()
            assert (out_len <= 50).all()
    assert fired, "timestretch never fired in 40 seeds"


def test_augment_padding_stays_blank():
    """Padding region is re-masked to the blank level by the final
    mix/mask stage (reference audio.py:100-108)."""
    from voice100_tpu.ops.augment import (
        batch_spectrogram_augment, BLANK_AUDIO,
    )

    audio = jnp.zeros((2, 40, 64))  # loud everywhere incl. padding
    audio_len = jnp.asarray([40, 10], jnp.int32)
    out, out_len = batch_spectrogram_augment(
        jax.random.PRNGKey(3), audio, audio_len
    )
    out = np.asarray(out)
    out_len = np.asarray(out_len)
    pad = out[1, max(out_len[1], 20):]
    # all padding at/below the blank floor (mix adds nothing there)
    assert (pad <= BLANK_AUDIO + 1e-3).all()


def test_ctc_loss_empty_target():
    from voice100_tpu.ops.ctc import ctc_loss

    lp = jax.nn.log_softmax(jnp.zeros((1, 5, 4)), axis=-1)
    loss = float(
        ctc_loss(
            lp, jnp.zeros((1, 2), jnp.int32), jnp.asarray([5]),
            jnp.asarray([0]),
        )
    )
    # all-blank path probability: 5 * log(1/4)
    assert math.isclose(loss, 5 * math.log(4), rel_tol=1e-5)


def test_ctc_loss_impossible_is_zeroed():
    """target longer than input frames -> inf loss -> zero_infinity."""
    from voice100_tpu.ops.ctc import ctc_loss

    lp = jax.nn.log_softmax(jnp.zeros((1, 2, 4)), axis=-1)
    loss = float(
        ctc_loss(
            lp, jnp.asarray([[1, 2, 3]], jnp.int32), jnp.asarray([2]),
            jnp.asarray([3]),
        )
    )
    assert loss == 0.0


def test_conv_stack_lengths_match_shapes():
    from voice100_tpu.models.layers import (
        ConvStack, conv_stack_output_length,
    )

    settings = (
        (8, False, 5, 2, 2, False),
        (8, True, 5, 2, 2, False),
        (8, False, 3, 1, 1, True),
    )
    stack = ConvStack(settings=settings)
    for t in (7, 16, 33):
        x = jnp.zeros((1, t, 4))
        v = stack.init(jax.random.PRNGKey(0), x)
        y = stack.apply(v, x)
        assert y.shape[1] == conv_stack_output_length(settings, t)


def test_bilstm_zero_length_rows():
    """Rows with length 0 produce all-zero outputs, no NaNs."""
    from voice100_tpu.ops.lstm import init_lstm_params, multilayer_bilstm

    params = init_lstm_params(jax.random.PRNGKey(0), 4, 8, 1)
    x = jnp.ones((2, 6, 4))
    out = np.asarray(
        multilayer_bilstm(params, x, jnp.asarray([6, 0], jnp.int32))
    )
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out[1], 0.0)
    assert np.abs(out[0]).max() > 0


def test_greedy_merge_flow():
    """Greedy ids -> tokenizer decode -> merge_repeated, the runtime
    decode flow (/root/reference/tests/test_onnx.py:39-43)."""
    from voice100_tpu.text import CharTokenizer

    tok = CharTokenizer()
    ids = [8, 8, 0, 5, 0, 0, 12, 12, 12, 0]
    raw = tok.decode(ids)
    assert raw == "gg_d__kkk_"
    assert tok.merge_repeated(raw) == "gdk"


def test_ctc_viterbi_long_sequence():
    """Larger randomized forced alignment: path validity invariants."""
    from voice100_tpu.ops.ctc import ctc_viterbi_align

    rng = np.random.RandomState(7)
    batch, time, vocab, L = 4, 120, 12, 30
    logits = rng.randn(batch, time, vocab).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    labels = rng.randint(1, vocab, size=(batch, L)).astype(np.int32)
    label_lens = np.asarray([30, 22, 11, 30], np.int32)
    input_lens = np.asarray([120, 100, 64, 120], np.int32)
    labels_arr = labels.copy()
    for b in range(batch):
        labels_arr[b, label_lens[b]:] = 0

    res = ctc_viterbi_align(
        log_probs, jnp.asarray(labels_arr), jnp.asarray(input_lens),
        jnp.asarray(label_lens),
    )
    path = np.asarray(res.path)
    out_labels = np.asarray(res.labels)
    for b in range(batch):
        p = path[b, : input_lens[b]]
        # monotone non-decreasing, steps of 0..2, ends at last slots
        d = np.diff(p)
        assert (d >= 0).all() and (d <= 2).all()
        assert p[0] in (0, 1)
        assert p[-1] in (2 * label_lens[b], 2 * label_lens[b] - 1)
        # emitted labels match lattice content
        z = np.zeros(2 * label_lens[b] + 1, np.int32)
        z[1::2] = labels_arr[b, : label_lens[b]]
        np.testing.assert_array_equal(out_labels[b, : input_lens[b]], z[p])
        # every real label visited (CTC path must consume all labels)
        visited = set(p[p % 2 == 1].tolist())
        assert len(visited) == label_lens[b]
