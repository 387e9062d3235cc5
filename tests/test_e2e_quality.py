"""End-to-end learning quality: overfit ASR, transcribe through the
serving pipeline, check the text comes back.

This is the strongest functional test in the suite: raw WAV -> native
load -> log-mel -> conv+biLSTM -> CTC training until convergence ->
greedy decode + merge_repeated -> string comparison.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from corpus_fixture import make_dummy_corpus


def _char_error_rate(hyp: str, ref: str) -> float:
    # Levenshtein distance / ref length
    m, n = len(hyp), len(ref)
    dp = np.arange(n + 1)
    for i in range(1, m + 1):
        prev = dp.copy()
        dp[0] = i
        for j in range(1, n + 1):
            dp[j] = min(
                prev[j] + 1,
                dp[j - 1] + 1,
                prev[j - 1] + (hyp[i - 1] != ref[j - 1]),
            )
    return dp[n] / max(n, 1)


@pytest.mark.slow
def test_overfit_asr_and_transcribe(tmp_path):
    import optax
    from voice100_tpu.data import AudioTextDataModule
    from voice100_tpu.dsp.audioio import load_audio
    from voice100_tpu.inference import ASRPipeline
    from voice100_tpu.models import AudioToAlignText
    from voice100_tpu.training import make_task

    data_dir = str(tmp_path / "data")
    make_dummy_corpus(data_dir, n_clips=4)

    data = AudioTextDataModule(
        vocoder="mel", dataset="dummy_en", data_dir=data_dir,
        cache_dir=str(tmp_path / "cache"), batch_size=4, valid_ratio=0.0,
    )
    data.setup("fit")
    batch = next(iter(data.train_dataloader()))

    model = AudioToAlignText(
        audio_size=64, vocab_size=29,
        encoder_settings=((64, False, 3, 2, 1, False),),
        decoder_num_layers=1, decoder_hidden_size=64,
    )
    task = make_task(model)
    variables = dict(task.init(jax.random.PRNGKey(0), batch))
    params = variables.pop("params")
    extra = variables
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            # deterministic: no augmentation so the model can overfit
            loss, _, _ = task.loss(p, extra, batch, None, train=False)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for i in range(400):
        params, opt_state, loss = step(params, opt_state)
    final_loss = float(loss)
    assert final_loss < 0.35, final_loss

    # transcribe the training clips through the full serving pipeline
    pipe = ASRPipeline(
        model, {"params": params, **extra}, batch_size=4,
        buckets_sec=(2.0,),
    )
    wavs, refs = [], []
    root = os.path.join(data_dir, "dummy-speech-en")
    with open(os.path.join(root, "metadata.csv")) as f:
        for line in f:
            clipid, text, _ = line.strip().split("|")
            wavs.append(
                load_audio(os.path.join(root, "wavs", clipid + ".wav"))
            )
            refs.append(text)
    hyps = pipe.transcribe(wavs)
    cers = [_char_error_rate(h, r) for h, r in zip(hyps, refs)]
    # overfit on 4 clips: transcripts come back near-verbatim
    assert float(np.mean(cers)) < 0.25, list(zip(hyps, refs))

    # beam search on genuinely trained logits tracks greedy quality
    # (on peaked overfit logits they typically coincide). Beam
    # maximizes sequence posterior, not CER, so a strict <= is not a
    # guaranteed invariant on un-peaked logits — allow a small margin
    # while still catching real decoder regressions.
    beam_pipe = ASRPipeline(
        model, {"params": params, **extra}, batch_size=4,
        buckets_sec=(2.0,), beam_size=8,
    )
    beam_hyps = beam_pipe.transcribe(wavs)
    beam_cers = [_char_error_rate(h, r) for h, r in zip(beam_hyps, refs)]
    assert float(np.mean(beam_cers)) <= float(np.mean(cers)) + 0.01, (
        list(zip(beam_hyps, hyps, refs)))
    # and an absolute ceiling on the overfit clips, so a decoder bug
    # can't hide behind a simultaneously-degraded greedy baseline
    assert float(np.mean(beam_cers)) < 0.25, (
        list(zip(beam_hyps, refs)))

    # trigram shallow fusion trained on the corpus transcripts must
    # not hurt on trained logits (the LM agrees with the acoustics
    # here; a sign/indexing bug in the fusion term would wreck CER)
    from voice100_tpu.text.ngram import CharNgramLM
    from voice100_tpu.text import get_tokenizer

    tok = get_tokenizer("en", False)
    lm = CharNgramLM.fit([list(tok(r)) for r in refs], vocab_size=29)
    lm_pipe = ASRPipeline(
        model, {"params": params, **extra}, batch_size=4,
        buckets_sec=(2.0,), beam_size=8, lm=lm, lm_weight=0.5,
        lm_bonus=0.5,
    )
    lm_hyps = lm_pipe.transcribe(wavs)
    lm_cers = [_char_error_rate(h, r) for h, r in zip(lm_hyps, refs)]
    assert float(np.mean(lm_cers)) <= float(np.mean(beam_cers)) + 0.01, (
        list(zip(lm_hyps, beam_hyps, refs)))


@pytest.mark.slow
def test_tts_to_asr_round_trip(tmp_path):
    """The full loop: text -> (overfit) duration + acoustic models ->
    WORLD synthesis -> waveform -> (overfit) ASR -> text.

    Uses the tonecode corpus (each character renders as a distinct
    pitch), so text->audio and audio->text are genuinely learnable and
    the round trip is meaningful — unlike the random-sine dummy corpus,
    where texts and audio are unrelated. All three models overfit with
    deterministic full-batch Adam (no augmentation), as in the ASR
    overfit test above; the loop synthesizes training transcripts, so
    it verifies composed-pipeline fidelity (synthesis intelligible to
    the recognizer), not few-shot generalization to novel texts.
    """
    import optax

    from corpus_fixture import add_resynth_clips, make_tonecode_corpus

    from voice100_tpu.data import (
        AlignTextDataModule, AudioTextDataModule,
    )
    from voice100_tpu.inference import ASRPipeline, TTSPipeline
    from voice100_tpu.models import (
        AlignTextToAudio, AudioToAlignText, TextToAlignText,
    )
    from voice100_tpu.training import make_task

    data_dir = str(tmp_path / "data")
    root = make_tonecode_corpus(data_dir, n_clips=12)
    with open(os.path.join(root, "metadata.csv")) as f:
        sentences = [line.split("|")[1] for line in f][:4]

    def overfit(model, batch, steps, lr=3e-3, world_norm=None):
        task = make_task(model)
        variables = dict(task.init(jax.random.PRNGKey(0), batch))
        if world_norm is not None:
            variables["world_norm"] = world_norm
        params = variables.pop("params")
        extra = variables
        opt = optax.adam(lr)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                loss, _, _ = task.loss(p, extra, batch, None, train=False)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        loss = None
        for _ in range(steps):
            params, opt_state, loss = step(params, opt_state)
        return {"params": params, **extra}, float(loss)

    # --- overfit the TTS pair ----------------------------------------
    align_model = TextToAlignText(vocab_size=29, num_layers=1,
                                  hidden_size=64)
    align_data = AlignTextDataModule(
        data_dir=data_dir, dataset="dummy_tonecode", batch_size=12,
        valid_ratio=0.0,
    )
    align_data.setup("fit")
    align_vars, align_loss = overfit(
        align_model, next(iter(align_data.train_dataloader())), 500)
    assert align_loss < 0.1, align_loss

    audio_model = AlignTextToAudio(
        vocab_size=29, encoder_num_layers=1, encoder_hidden_size=128,
        decoder_settings=((128, False, 5, 1, 2, False),
                          (128, True, 5, 2, 2, False),
                          (128, False, 5, 1, 2, False)),
    )
    audio_data = AudioTextDataModule(
        vocoder="world_mcep", dataset="dummy_tonecode", use_align=True,
        data_dir=data_dir, cache_dir=str(tmp_path / "cache_w"),
        batch_size=12, valid_ratio=0.0,
    )
    audio_data.setup("fit")
    audio_batch = next(iter(audio_data.train_dataloader()))
    # WORLD feature statistics, as the real recipe computes via
    # calc-stat before TTS training (masks per reference calc_stat.py):
    # without normalization the f0 stream (~100-360 Hz) dominates the
    # loss and starves the spectral envelope
    (f0_b, f0_len_b, logspc_b, codeap_b), _ = audio_batch
    frames = np.arange(f0_b.shape[1])[None, :] < np.asarray(f0_len_b)[:, None]
    voiced = (np.asarray(f0_b) > 30.0) & frames
    stats = {
        "f0_mean": np.asarray([np.asarray(f0_b)[voiced].mean()], np.float32),
        "f0_std": np.asarray([np.asarray(f0_b)[voiced].std() + 1e-6],
                             np.float32),
        "logspc_mean": np.asarray(logspc_b)[frames].mean(0).astype(np.float32),
        "logspc_std": (np.asarray(logspc_b)[frames].std(0) + 1e-6
                       ).astype(np.float32),
        "codeap_mean": np.asarray(codeap_b)[frames].mean(0).astype(np.float32),
        "codeap_std": (np.asarray(codeap_b)[frames].std(0) + 1e-6
                       ).astype(np.float32),
    }
    audio_vars, _ = overfit(
        audio_model, audio_batch, 800,
        world_norm={"norm": stats})

    # --- overfit ASR on the corpus + vocoded copies -------------------
    # (the round trip feeds the ASR WORLD-synthesized audio; training
    # on resynthesized clips closes that domain gap)
    add_resynth_clips(data_dir)
    asr_data = AudioTextDataModule(
        vocoder="mel", dataset="dummy_tonecode", data_dir=data_dir,
        cache_dir=str(tmp_path / "cache_m"), batch_size=24,
        valid_ratio=0.0,
    )
    asr_data.setup("fit")
    asr_model = AudioToAlignText(
        audio_size=64, vocab_size=29,
        encoder_settings=((64, False, 3, 2, 1, False),),
        decoder_num_layers=1, decoder_hidden_size=64,
    )
    # budget provenance: 500 -> 800 landed with the frequency-domain
    # synthesis rewrite (commit 89534ae), whose ~2e-6 waveform epsilon
    # on the resynthesized training clips flipped one char at the old
    # margin — NOT with the f16 mel cache (mel features quantize to
    # f16 either way on upload; the supervision targets stay f32)
    asr_vars, asr_loss = overfit(
        asr_model, next(iter(asr_data.train_dataloader())), 800)
    assert asr_loss < 0.35, asr_loss

    # --- synthesize and transcribe -----------------------------------
    tts = TTSPipeline(align_model, align_vars, audio_model, audio_vars,
                      language="en", use_phone=False)
    wavs = tts.synthesize(sentences)
    assert all(len(w) > 1600 for w in wavs)  # > 0.1 s of audio each

    asr = ASRPipeline(asr_model, asr_vars, batch_size=4,
                      buckets_sec=(2.0, 5.0))
    hyps = asr.transcribe([np.asarray(w) for w in wavs])
    cers = [_char_error_rate(h, r) for h, r in zip(hyps, sentences)]
    print("round-trip CERs:", cers, "hyps:", hyps)
    assert np.mean(cers) < 0.4, (cers, hyps)


def _token_error_rate(hyp_tokens, ref_tokens) -> float:
    m, n = len(hyp_tokens), len(ref_tokens)
    dp = np.arange(n + 1)
    for i in range(1, m + 1):
        prev = dp.copy()
        dp[0] = i
        for j in range(1, n + 1):
            dp[j] = min(
                prev[j] + 1,
                dp[j - 1] + 1,
                prev[j - 1] + (hyp_tokens[i - 1] != ref_tokens[j - 1]),
            )
    return dp[n] / max(n, 1)


@pytest.mark.slow
def test_overfit_asr_and_transcribe_ja_phone(tmp_path):
    """The Japanese phone pipeline end to end: dummy_ja corpus ->
    phone-mode datamodule (44-symbol Julius vocab) -> CTC training
    until convergence -> ASRPipeline transcribe in language='ja'
    phone mode -> phone-token error rate vs the corpus phone files.
    The JA twin of test_overfit_asr_and_transcribe (the reference
    trains JA models from the same registry, voice100/README.md)."""
    import optax
    from voice100_tpu.data import AudioTextDataModule
    from voice100_tpu.dsp.audioio import load_audio
    from voice100_tpu.inference import ASRPipeline
    from voice100_tpu.models import AudioToAlignText
    from voice100_tpu.training import make_task

    data_dir = str(tmp_path / "data")
    make_dummy_corpus(data_dir, language="ja", n_clips=4)

    data = AudioTextDataModule(
        vocoder="mel", dataset="dummy_ja", language="ja", use_phone=True,
        data_dir=data_dir, cache_dir=str(tmp_path / "cache"),
        batch_size=4, valid_ratio=0.0,
    )
    data.setup("fit")
    assert data.vocab_size == 44
    batch = next(iter(data.train_dataloader()))

    model = AudioToAlignText(
        audio_size=64, vocab_size=44,
        encoder_settings=((64, False, 3, 2, 1, False),),
        decoder_num_layers=1, decoder_hidden_size=64,
    )
    task = make_task(model)
    variables = dict(task.init(jax.random.PRNGKey(0), batch))
    params = variables.pop("params")
    extra = variables
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            loss, _, _ = task.loss(p, extra, batch, None, train=False)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for _ in range(400):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < 0.35, float(loss)

    refs = {}
    with open(
        os.path.join(data_dir, "dummy_ja-phone-train.txt"),
        encoding="utf-8",
    ) as f:
        for line in f:
            clipid, phone = line.strip().split("|")
            refs[clipid] = phone.split(" ")

    pipe = ASRPipeline(
        model, {"params": params, **extra}, batch_size=4,
        buckets_sec=(2.0,), language="ja", use_phone=True,
    )
    root = os.path.join(data_dir, "dummy-speech-ja")
    clipids = sorted(refs)
    wavs = [
        load_audio(os.path.join(root, "wavs", c + ".wav"))
        for c in clipids
    ]
    hyps = pipe.transcribe(wavs)
    ters = [
        _token_error_rate(h.split(" "), refs[c])
        for h, c in zip(hyps, clipids)
    ]
    assert float(np.mean(ters)) < 0.25, list(zip(hyps, clipids))
