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
