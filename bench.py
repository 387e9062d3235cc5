"""Headline benchmark: ASR real-time factor per chip.

Runs the flagship asr_en_base model (conv encoder + 2x biLSTM(512) +
dense over 29 symbols) on realistic shapes — a batch of 10-second
utterances (1000 mel frames at the reference's 10 ms hop,
voice100/data_modules.py:23-26) — end to end from log-mel features to
greedy-decoded token ids, jitted on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured RTF / 100 (the project's north-star target of
100x real-time ASR per chip, BASELINE.md — the reference publishes no
throughput numbers of its own).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from voice100_tpu.models import AudioToAlignText

    model = AudioToAlignText(
        audio_size=64,
        vocab_size=29,
        encoder_settings=(
            (512, False, 5, 2, 2, False),
            (512, False, 5, 1, 2, False),
        ),
        decoder_num_layers=2,
        decoder_hidden_size=512,
    )

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
    print(
        json.dumps(
            {
                "metric": "asr_en_base_rtf_per_chip",
                "value": round(rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 100.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
