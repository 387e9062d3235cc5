"""On-device batched CTC prefix beam search vs the host reference.

With ``topk >= V - 1`` the device decoder considers every non-blank
symbol per frame, i.e. exactly the host decoder's unpruned candidate
set — the two then run the same dynamic program and must produce the
same prefixes (up to float ties, which the random logits avoid by
being non-degenerate float32 draws).
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

from voice100_tpu.ops.ctc_beam import ctc_prefix_beam_search  # noqa: E402
from voice100_tpu.ops.ctc_beam_device import (  # noqa: E402
    ctc_prefix_beam_search_batched,
)


def _random_log_probs(rng, b, t, v, peak=3.0):
    x = rng.randn(b, t, v).astype(np.float32) * peak
    x = x - x.max(axis=-1, keepdims=True)
    lse = np.log(np.exp(x).sum(axis=-1, keepdims=True))
    return (x - lse).astype(np.float32)


def test_device_beam_matches_host_unpruned():
    rng = np.random.RandomState(0)
    b, t, v = 12, 24, 6
    lp = _random_log_probs(rng, b, t, v)
    lens = rng.randint(3, t + 1, size=b).astype(np.int32)

    ids, n = ctc_prefix_beam_search_batched(
        lp, lens, beam_size=8, topk=v - 1
    )
    ids, n = np.asarray(ids), np.asarray(n)

    mismatches = 0
    for i in range(b):
        want = ctc_prefix_beam_search(
            lp[i, : lens[i]], beam_size=8, prune_log_prob=-1e9
        )
        got = list(ids[i, : n[i]])
        if got != want:
            mismatches += 1
    # identical DP; disagreement would mean a float tie broke the
    # other way, which these non-degenerate draws do not produce
    assert mismatches == 0, mismatches


def test_device_beam_padding_invariant():
    """Extra padded frames and extra padded batch rows must not change
    any decoded sequence."""
    rng = np.random.RandomState(1)
    b, t, v = 6, 20, 8
    lp = _random_log_probs(rng, b, t, v)
    lens = rng.randint(4, t + 1, size=b).astype(np.int32)

    ids1, n1 = ctc_prefix_beam_search_batched(lp, lens, beam_size=4)
    # pad time with garbage frames and add two garbage rows
    pad_t = np.concatenate(
        [lp, rng.randn(b, 7, v).astype(np.float32)], axis=1
    )
    pad_bt = np.concatenate(
        [pad_t, rng.randn(2, t + 7, v).astype(np.float32)], axis=0
    )
    pad_lens = np.concatenate([lens, np.array([5, 9], np.int32)])
    ids2, n2 = ctc_prefix_beam_search_batched(
        pad_bt, pad_lens, beam_size=4
    )
    ids1, n1 = np.asarray(ids1), np.asarray(n1)
    ids2, n2 = np.asarray(ids2), np.asarray(n2)
    for i in range(b):
        assert n1[i] == n2[i]
        assert list(ids1[i, : n1[i]]) == list(ids2[i, : n2[i]])


def test_device_beam_certain_sequence():
    """On near-one-hot logits the beam must read off the argmax path's
    collapsed labels (and match greedy decoding semantics)."""
    v, t = 5, 12
    path = [1, 1, 0, 2, 2, 3, 0, 0, 3, 4, 4, 0]  # collapse: 1 2 3 3 4
    lp = np.full((1, t, v), -20.0, np.float32)
    for i, s in enumerate(path):
        lp[0, i, s] = 0.0
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    ids, n = ctc_prefix_beam_search_batched(
        lp, np.array([t], np.int32), beam_size=4
    )
    assert list(np.asarray(ids)[0, : int(n[0])]) == [1, 2, 3, 3, 4]


def test_device_beam_sums_alignment_mass():
    """The canonical case where beam search beats greedy: per-frame
    argmax is blank, but the summed mass of non-blank alignments wins
    (Hannun et al. 2014 §2's toy example)."""
    # two frames: P(blank)=0.4 > P(a)=0.35 > P(b)=0.25 each frame;
    # greedy reads blank-blank -> ""; prefix mass of "a" is
    # 0.35*0.4 + 0.4*0.35 + 0.35*0.35 = 0.4025 > P("")=0.16
    probs = np.array([[0.4, 0.35, 0.25], [0.4, 0.35, 0.25]],
                     np.float32)
    lp = np.log(probs)[None]
    ids, n = ctc_prefix_beam_search_batched(
        lp, np.array([2], np.int32), beam_size=4
    )
    assert list(np.asarray(ids)[0, : int(n[0])]) == [1]


@pytest.mark.parametrize("pcm16", [False, True])
def test_pipeline_device_beam_matches_host_beam(pcm16):
    """ASRPipeline(beam_size>0) decodes on device by default and must
    agree with the host decoder on the same model outputs (random
    model weights give smooth, non-degenerate distributions; no
    frame's symbol falls below the host pruning threshold)."""
    from voice100_tpu.models import AudioToAlignText
    from voice100_tpu.inference import ASRPipeline

    model = AudioToAlignText(
        audio_size=64, vocab_size=29,
        encoder_settings=((16, False, 3, 2, 1, False),),
        decoder_num_layers=1, decoder_hidden_size=16,
    )
    rng = np.random.RandomState(2)
    import jax.numpy as jnp

    mel0 = jnp.zeros((1, 16, 64), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(3), mel0, jnp.asarray([16], jnp.int32)
    )
    wavs = [
        (rng.randn(n).astype(np.float32) * 0.1)
        for n in (5000, 9000, 16000)
    ]
    if pcm16:
        wavs = [(w * 32767).astype(np.int16) for w in wavs]
    kwargs = dict(
        batch_size=4, buckets_sec=(0.5, 1.0, 2.0), beam_size=6,
        beam_topk=28,
    )
    dev = ASRPipeline(model, variables, **kwargs)
    host = ASRPipeline(model, variables, beam_device=False, **kwargs)
    got = dev.transcribe(wavs)
    want = host.transcribe(wavs)
    assert got == want, (got, want)


# ---------------------------------------------------------------------------
# n-gram shallow fusion


def _toy_lm(v=6):
    from voice100_tpu.text.ngram import CharNgramLM

    rng = np.random.RandomState(7)
    seqs = [[1, 2, 3], [1, 2, 4]] * 50 + [
        list(rng.randint(1, v, size=4)) for _ in range(20)
    ]
    return CharNgramLM.fit(seqs, vocab_size=v)


def test_ngram_lm_is_normalized_and_learns():
    lm = _toy_lm()
    # every context row is a distribution over non-blank symbols
    p = np.exp(lm.table)
    p[np.isneginf(lm.table)] = 0.0
    assert np.allclose(p.sum(axis=-1), 1.0, atol=1e-5)
    assert lm.table[:, :, 0].max() == -np.inf  # blank never emitted
    # the trained trigram 1,2 -> 3 dominates an unseen continuation
    assert lm.table[1, 2, 3] > lm.table[1, 2, 5]
    # round-trip
    import tempfile, os
    from voice100_tpu.text.ngram import CharNgramLM

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "lm.npz")
        lm.save(path)
        lm2 = CharNgramLM.load(path)
        assert np.array_equal(lm.table, lm2.table)


def test_device_fused_beam_matches_host_fused():
    """Same-candidate-set parity as the plain test, with the trigram
    fusion term active on both sides."""
    lm = _toy_lm()
    rng = np.random.RandomState(3)
    b, t, v = 10, 18, 6
    lp = _random_log_probs(rng, b, t, v)
    lens = rng.randint(3, t + 1, size=b).astype(np.int32)

    ids, n = ctc_prefix_beam_search_batched(
        lp, lens, beam_size=8, topk=v - 1,
        lm_table=lm.table, lm_weight=0.7, lm_bonus=0.3,
    )
    ids, n = np.asarray(ids), np.asarray(n)
    for i in range(b):
        want = ctc_prefix_beam_search(
            lp[i, : lens[i]], beam_size=8, prune_log_prob=-1e9,
            lm_table=lm.table, lm_weight=0.7, lm_bonus=0.3,
        )
        assert list(ids[i, : n[i]]) == want, i


def test_lm_fusion_disambiguates():
    """The canonical fusion win: acoustics slightly prefer an
    LM-implausible string; fusion flips to the corpus-consistent one."""
    lm = _toy_lm()
    v, t = 6, 6
    # acoustics: frames spell 1 2 5 with symbol 3 a close second at
    # the last position; the LM strongly prefers 1 2 3
    lp = np.full((1, t, v), -12.0, np.float32)
    for i, s in enumerate([1, 0, 2, 0, 5, 5]):
        lp[0, i, s] = 0.0
    lp[0, 4, 3] = -0.35
    lp[0, 5, 3] = -0.35
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    lens = np.array([t], np.int32)

    plain, n0 = ctc_prefix_beam_search_batched(lp, lens, beam_size=4)
    fused, n1 = ctc_prefix_beam_search_batched(
        lp, lens, beam_size=4,
        lm_table=lm.table, lm_weight=1.5, lm_bonus=0.0,
    )
    assert list(np.asarray(plain)[0, : int(n0[0])]) == [1, 2, 5]
    assert list(np.asarray(fused)[0, : int(n1[0])]) == [1, 2, 3]


def test_pipeline_lm_fusion_device_matches_host():
    from voice100_tpu.models import AudioToAlignText
    from voice100_tpu.inference import ASRPipeline
    from voice100_tpu.text.ngram import CharNgramLM

    model = AudioToAlignText(
        audio_size=64, vocab_size=29,
        encoder_settings=((16, False, 3, 2, 1, False),),
        decoder_num_layers=1, decoder_hidden_size=16,
    )
    import jax.numpy as jnp

    mel0 = jnp.zeros((1, 16, 64), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(5), mel0, jnp.asarray([16], jnp.int32)
    )
    rng = np.random.RandomState(11)
    lm = CharNgramLM.fit(
        [list(rng.randint(1, 29, size=12)) for _ in range(40)],
        vocab_size=29,
    )
    wavs = [(rng.randn(n).astype(np.float32) * 0.1) for n in (6000, 14000)]
    kwargs = dict(batch_size=2, buckets_sec=(0.5, 1.0),
                  beam_size=5, beam_topk=28, lm=lm, lm_weight=0.6,
                  lm_bonus=0.2)
    dev = ASRPipeline(model, variables, **kwargs)
    host = ASRPipeline(model, variables, beam_device=False, **kwargs)
    assert dev.transcribe(wavs) == host.transcribe(wavs)


def test_train_lm_cli(tmp_path):
    """The train-lm tool reads prepared transcript files and writes an
    .npz the pipeline can load by path."""
    from voice100_tpu.tools.train_lm import cli_main
    from voice100_tpu.text.ngram import CharNgramLM

    text = tmp_path / "dummy_en-train.txt"
    text.write_text(
        "clip1|hello world\nclip2|the quick brown fox\n"
        "clip3|hello again\n", encoding="utf-8"
    )
    out = str(tmp_path / "lm.npz")
    cli_main(["--text", str(text), "--language", "en", "--output", out])
    lm = CharNgramLM.load(out)
    assert lm.vocab_size == 29
    # 'hello' appears twice: P(l | h,e) should beat an unseen letter
    from voice100_tpu.text import get_tokenizer

    tok = get_tokenizer("en", False)
    h, e, l_, z = (int(tok(c)[0]) for c in "helz")
    assert lm.table[h, e, l_] > lm.table[h, e, z]


def test_pipeline_rejects_mismatched_lm_vocab():
    """A [V,V,V] table for the wrong tokenizer must be rejected at
    construction (it would silently gather wrong rows on device)."""
    import pytest

    from voice100_tpu.inference import ASRPipeline
    from voice100_tpu.models import AudioToAlignText

    model = AudioToAlignText(
        vocab_size=29, audio_size=64,
        encoder_settings=((8, False, 3, 2, 1, False),),
        decoder_num_layers=1, decoder_hidden_size=8,
    )
    bad = np.zeros((44, 44, 44), np.float32)  # JA-sized table, EN model
    with pytest.raises(ValueError, match="LM vocab"):
        ASRPipeline(model, {"params": {}}, beam_size=4, lm=bad)
