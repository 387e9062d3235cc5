"""CTC prefix beam search tests."""

import numpy as np
import jax
import jax.numpy as jnp

from voice100_tpu.ops.ctc_beam import ctc_prefix_beam_search


def test_beam_recovers_mass_split_across_alignments():
    """The canonical case where greedy is wrong: per frame
    P(blank)=0.6 > P(a)=0.4, so greedy outputs the empty string, but
    the total probability of emitting 'a' is 0.64 > 0.36."""
    p = np.log(np.asarray([[0.6, 0.4], [0.6, 0.4]]))
    greedy = p.argmax(axis=1)
    assert list(greedy) == [0, 0]  # greedy says all blank
    assert ctc_prefix_beam_search(p, beam_size=4) == [1]


def test_beam_equals_greedy_on_peaked_logits():
    rng = np.random.RandomState(0)
    vocab, time = 8, 30
    labels = rng.randint(1, vocab, size=10)
    # build strongly peaked frames: label, label, blank, ...
    frames = []
    for lab in labels:
        for s in (lab, lab, 0):
            row = np.full(vocab, -12.0)
            row[s] = 0.0
            frames.append(row)
    log_probs = np.asarray(frames) - np.log(
        np.exp(np.asarray(frames)).sum(axis=1, keepdims=True))
    got = ctc_prefix_beam_search(log_probs, beam_size=4)
    assert got == list(labels)


def test_pipeline_beam_mode_runs_and_matches_on_trained_logits():
    """beam_size>0 on the pipeline produces strings; on a random
    (peaked-nowhere) model it must still run without error."""
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
    rng = np.random.RandomState(2)
    wavs = [(rng.randn(6000) * 0.1).astype(np.float32) for _ in range(3)]
    beam = ASRPipeline(model, variables, batch_size=2,
                       buckets_sec=(0.5, 1.0), beam_size=4)
    out = beam.transcribe(wavs)
    assert len(out) == 3 and all(isinstance(t, str) for t in out)
