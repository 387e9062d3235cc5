"""Headline benchmark: ASR real-time factor per chip.

Runs the flagship asr_en_base model (conv encoder + 2x biLSTM(512) +
dense over 29 symbols) on realistic shapes — a batch of 10-second
utterances (1000 mel frames at the reference's 10 ms hop,
voice100/data_modules.py:23-26) — end to end from log-mel features to
greedy-decoded token ids, jitted on the local accelerator.

Prints ONE JSON line (the driver's contract):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured RTF / 100 (the project's north-star target of
100x real-time ASR per chip, BASELINE.md — the reference publishes no
throughput numbers of its own).

``--metric tts`` measures the TTS serving path instead (text ->
durations -> aligned text -> WORLD features -> waveform synthesis,
all on-device), against the 50x real-time TTS target.
``--metric train`` measures training step throughput (audio-seconds of
training data consumed per second at asr_en_base batch 64).
"""

import argparse
import json
import os
import time

import jax

# Persistent compilation cache: first-compile of the 500-step recurrent
# scan takes tens of minutes over the tunneled backend; cached reruns
# start in seconds.
os.makedirs("/tmp/voice100_tpu_jax_cache", exist_ok=True)
try:
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/voice100_tpu_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np


def _flagship_asr():
    from voice100_tpu.models import AudioToAlignText

    model = _make_asr_model()
    # batch 8 measured faster per audio-second than 64 on v5e: the
    # recurrent scan is HBM-bound (weight+projection restreaming), so
    # larger batches scale worse than linear
    batch = 8
    seconds_per_clip = 10.0
    frames = int(seconds_per_clip * 100)  # 10 ms hop
    rng = np.random.RandomState(0)
    audio = jnp.asarray(
        rng.randn(batch, frames, 64).astype(np.float32)
    )
    audio_len = jnp.full((batch,), frames, jnp.int32)

    variables = model.init(jax.random.PRNGKey(0), audio, audio_len)

    @jax.jit
    def decode(variables, audio, audio_len):
        return model.apply(
            variables, audio, audio_len,
            method=AudioToAlignText.greedy_decode,
        )

    # warmup/compile; a host fetch is the only reliable sync on the
    # tunneled TPU backend (block_until_ready returns early there)
    ids, out_len = decode(variables, audio, audio_len)
    _ = np.asarray(ids[0, :1])

    def timed(iters: int) -> float:
        t0 = time.perf_counter()
        last = None
        for _ in range(iters):
            last, _ = decode(variables, audio, audio_len)
        _ = np.asarray(last[0, :1])  # force completion
        return time.perf_counter() - t0

    # subtract the dispatch+fetch overhead measured at 1 iteration so
    # the number reflects steady-state per-batch compute
    iters = 50
    elapsed_n = timed(iters)
    elapsed_1 = min(timed(1), timed(1))
    elapsed = max(elapsed_n - elapsed_1, 1e-6) / (iters - 1) * iters

    audio_seconds = batch * seconds_per_clip * iters
    rtf = audio_seconds / elapsed
    return {
        "metric": "asr_en_base_rtf_per_chip",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 100.0, 3),
    }


def _tts_bench():
    """TTS serving RTF: durations + aligned text + WORLD features +
    synthesis for a batch of ~6.4 s utterances."""
    from voice100_tpu.models import TextToAlignText, AlignTextToAudio
    from voice100_tpu.ops.duration import expand_alignment_batch
    from voice100_tpu.dsp.world.synthesis import synthesize_fn
    from voice100_tpu.dsp.world.codec import decode_aperiodicity
    from voice100_tpu.dsp.mcep import create_mc2sp_matrix

    batch, text_len_v, out_frames = 8, 128, 512  # 20ms tokens, 10ms frames
    align = TextToAlignText(vocab_size=71, num_layers=2, hidden_size=256)
    audio = AlignTextToAudio(vocab_size=71)
    rng = np.random.RandomState(0)
    text = jnp.asarray(
        rng.randint(1, 71, size=(batch, text_len_v)).astype(np.int32)
    )
    text_len = jnp.full((batch,), text_len_v, jnp.int32)
    align_vars = align.init(jax.random.PRNGKey(0), text, text_len)
    aligntext0 = jnp.zeros((batch, out_frames), jnp.int32)
    audio_vars = audio.init(
        jax.random.PRNGKey(1), aligntext0, text_len
    )
    mc2sp = jnp.asarray(
        create_mc2sp_matrix(512, 24, 0.410).astype(np.float32)
    )
    ap_row = jnp.asarray(
        decode_aperiodicity(
            np.full((1, 1), -30.0), 16000, 512
        )[0].astype(np.float32)
    )

    @jax.jit
    def synth(align_vars, audio_vars, text, text_len, key):
        durations = align.apply(
            align_vars, text, text_len, method=TextToAlignText.predict
        )
        aligntext, aligntext_len = expand_alignment_batch(
            text, durations, text_len, out_frames
        )
        f0, mcep, codeap = audio.apply(
            audio_vars, aligntext, aligntext_len,
            method=AlignTextToAudio.predict,
        )
        f0 = jnp.clip(jnp.abs(f0) * 50 + 120, 0, 400)  # plausible range
        spc = jnp.exp(jnp.clip(mcep @ mc2sp, -30, 5))
        ap = jnp.broadcast_to(
            ap_row[None, None, :], spc.shape
        )
        keys = jax.random.split(key, batch)
        wav = jax.vmap(
            lambda a, b, c, k: synthesize_fn(
                a, b, c, fs=16000, frame_period=10.0, noise_key=k
            )
        )(f0, spc, ap, keys)
        return wav

    key = jax.random.PRNGKey(2)
    wav = synth(align_vars, audio_vars, text, text_len, key)
    _ = np.asarray(wav[0, :1])
    n_samples = wav.shape[-1]

    def timed(iters):
        t0 = time.perf_counter()
        for _ in range(iters):
            wav = synth(align_vars, audio_vars, text, text_len, key)
        _ = np.asarray(wav[0, :1])
        return time.perf_counter() - t0

    iters = 30
    elapsed_n = timed(iters)
    elapsed_1 = min(timed(1), timed(1))
    elapsed = max(elapsed_n - elapsed_1, 1e-6) / (iters - 1) * iters
    audio_seconds = batch * (n_samples / 16000.0) * iters
    rtf = audio_seconds / elapsed
    return {
        "metric": "tts_en_base_rtf_per_chip",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 50.0, 3),
    }


def _train_bench():
    """Training throughput: audio-seconds consumed per wall second for
    the asr_en_base recipe (batch 64, ~10 s clips, augmentation on)."""
    import optax
    from voice100_tpu.training.tasks import make_task

    model = _make_asr_model()
    batch, frames = 64, 1000
    rng = np.random.RandomState(0)
    batch_data = (
        (
            rng.randn(batch, frames, 64).astype(np.float32),
            np.full((batch,), frames, np.int32),
        ),
        (
            rng.randint(1, 29, size=(batch, 128)).astype(np.int32),
            np.full((batch,), 128, np.int32),
        ),
    )
    task = make_task(model)
    variables = dict(task.init(jax.random.PRNGKey(0), batch_data))
    params = variables.pop("params")
    extra = variables
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adam(1e-3)
    )
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, extra, opt_state, batch, key):
        def loss_fn(p):
            loss, metrics, new_extra = task.loss(
                p, extra, batch, key, train=True
            )
            return loss, new_extra

        grads, new_extra = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_extra, opt_state

    key = jax.random.PRNGKey(0)
    params, extra, opt_state = step(params, extra, opt_state, batch_data, key)
    _ = np.asarray(jax.tree_util.tree_leaves(params)[0])[:1]

    def timed(iters):
        nonlocal params, extra, opt_state
        t0 = time.perf_counter()
        for _ in range(iters):
            params, extra, opt_state = step(
                params, extra, opt_state, batch_data, key
            )
        _ = np.asarray(jax.tree_util.tree_leaves(params)[0].ravel()[:1])
        return time.perf_counter() - t0

    iters = 20
    elapsed_n = timed(iters)
    elapsed_1 = min(timed(1), timed(1))
    elapsed = max(elapsed_n - elapsed_1, 1e-6) / (iters - 1) * iters
    throughput = batch * 10.0 * iters / elapsed
    return {
        "metric": "asr_en_base_train_audio_seconds_per_second",
        "value": round(throughput, 2),
        "unit": "audio_s_per_s",
        "vs_baseline": round(throughput / 3600.0, 3),  # 1h audio/s scale
    }


def _make_asr_model():
    from voice100_tpu.models import AudioToAlignText

    return AudioToAlignText(
        audio_size=64,
        vocab_size=29,
        encoder_settings=(
            (512, False, 5, 2, 2, False),
            (512, False, 5, 1, 2, False),
        ),
        decoder_num_layers=2,
        decoder_hidden_size=512,
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--metric", default="asr", choices=["asr", "tts", "train"]
    )
    args = parser.parse_args()
    if args.metric == "asr":
        result = _flagship_asr()
    elif args.metric == "tts":
        result = _tts_bench()
    else:
        result = _train_bench()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
