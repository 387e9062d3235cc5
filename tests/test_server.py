"""HTTP serving daemon tests (in-process server + stdlib client)."""

import http.client
import json

import numpy as np
import jax
import jax.numpy as jnp

from voice100_tpu.dsp.wav import parse_wav, write_wav_bytes
from voice100_tpu.inference import ASRPipeline, TTSPipeline
from voice100_tpu.models import (
    AlignTextToAudio, AudioToAlignText, TextToAlignText,
)
from voice100_tpu.server import SpeechServer


def _request(port, method, path, body=None, headers=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request(method, path, body=body, headers=headers or {})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), data


def _asr_pipeline():
    model = AudioToAlignText(
        audio_size=64, vocab_size=29,
        encoder_settings=((16, False, 3, 2, 1, False),),
        decoder_num_layers=1, decoder_hidden_size=16,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 51, 64)), jnp.asarray([51])
    )
    return ASRPipeline(model, variables, batch_size=1,
                       buckets_sec=(0.5, 1.0))


def _tts_pipeline():
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
    return TTSPipeline(align, align_vars, audio, audio_vars,
                       language="en", use_phone=False)


def test_server_endpoints():
    server = SpeechServer(_asr_pipeline(), _tts_pipeline(), port=0)
    port = server.start()
    try:
        status, ctype, data = _request(port, "GET", "/healthz")
        assert status == 200
        assert json.loads(data) == {"status": "ok",
                                    "models": ["asr", "tts"]}

        # transcribe a WAV body
        rng = np.random.RandomState(0)
        wav = (rng.randn(8000) * 0.1).astype(np.float32)
        status, ctype, data = _request(
            port, "POST", "/transcribe", body=write_wav_bytes(wav, 16000))
        assert status == 200, data
        assert isinstance(json.loads(data)["text"], str)

        # transcribe raw float32 PCM at a different rate (resampled)
        status, _, data2 = _request(
            port, "POST", "/transcribe",
            body=(rng.randn(12000) * 0.1).astype(np.float32).tobytes(),
            headers={"X-Raw-Sample-Rate": "24000"},
        )
        assert status == 200, data2

        # synthesize returns playable WAV
        status, ctype, data = _request(
            port, "POST", "/synthesize",
            body=json.dumps({"text": "hello"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        assert status == 200 and ctype == "audio/wav"
        samples, rate = parse_wav(data)
        assert rate == 16000 and samples.shape[1] > 100

        # malformed request surfaces as an error, server stays up
        status, _, data = _request(port, "POST", "/synthesize",
                                   body=b"not json")
        assert status == 500
        status, _, _ = _request(port, "GET", "/healthz")
        assert status == 200
    finally:
        server.stop()


def test_parse_wav_keep_int16_matches_float():
    """keep_int16 returns the raw PCM samples; scaling them by 1/32768
    reproduces the default float parse exactly."""
    rng = np.random.RandomState(3)
    pcm = (rng.randn(2, 500) * 3000).astype(np.int16)
    data = write_wav_bytes(pcm, 16000)
    raw, rate = parse_wav(data, keep_int16=True)
    assert raw.dtype == np.int16 and rate == 16000
    np.testing.assert_array_equal(raw, pcm)
    flt, _ = parse_wav(data)
    np.testing.assert_array_equal(
        raw.astype(np.float32) / 32768.0, flt
    )


def test_concurrent_requests_micro_batch():
    """N concurrent clients must ride ONE batched device dispatch (the
    micro-batcher flushes them together) and each response must equal
    the sequential per-request result."""
    import concurrent.futures as cf

    n = 4
    model = AudioToAlignText(
        audio_size=64, vocab_size=29,
        encoder_settings=((16, False, 3, 2, 1, False),),
        decoder_num_layers=1, decoder_hidden_size=16,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 51, 64)), jnp.asarray([51])
    )
    pipeline = ASRPipeline(model, variables, batch_size=n,
                           buckets_sec=(0.5, 1.0))
    rng = np.random.RandomState(7)
    wavs = [(rng.randn(8000) * 0.2).astype(np.float32)
            for _ in range(n)]
    sequential = [pipeline.transcribe([w])[0] for w in wavs]

    # generous window so all n clients land in one flush even when the
    # first device dispatch is still compiling
    server = SpeechServer(pipeline, None, port=0,
                          batch_window_ms=2000.0)
    port = server.start()
    try:
        # warm the jit so the timed flush window isn't competing with
        # compilation
        _request(port, "POST", "/transcribe",
                 body=write_wav_bytes(wavs[0], 16000))
        server.asr_batcher.batch_sizes.clear()
        with cf.ThreadPoolExecutor(n) as pool:
            results = list(pool.map(
                lambda w: _request(port, "POST", "/transcribe",
                                   body=write_wav_bytes(w, 16000)),
                wavs,
            ))
        texts = [json.loads(data)["text"]
                 for status, _, data in results]
        assert all(status == 200 for status, _, _ in results)
        assert texts == sequential
        # one batched dispatch carried all n concurrent requests
        assert list(server.asr_batcher.batch_sizes) == [n], (
            server.asr_batcher.batch_sizes)
    finally:
        server.stop()


def test_micro_batcher_propagates_errors_and_closes():
    from voice100_tpu.server import MicroBatcher

    calls = []

    def fn(items):
        calls.append(len(items))
        if items[0] == "boom":
            raise ValueError("kaput")
        return [x * 2 for x in items]

    b = MicroBatcher(fn, max_batch=4, flush_ms=1.0)
    try:
        assert b.submit(3) == 6
        import pytest

        with pytest.raises(ValueError, match="kaput"):
            b.submit("boom")
    finally:
        b.close()
    with pytest.raises(RuntimeError):
        b.submit(1)


def test_micro_batcher_retries_items_on_batch_failure():
    """A failing co-batched request must not 500 its neighbors: the
    batcher retries the failed batch item-by-item, so good inputs get
    their results and only the bad input gets the error."""
    import concurrent.futures as cf

    from voice100_tpu.server import MicroBatcher

    calls = []

    def fn(items):
        calls.append(list(items))
        if "boom" in items:
            raise ValueError("kaput")
        return [x * 2 for x in items]

    b = MicroBatcher(fn, max_batch=4, flush_ms=200.0)
    try:
        with cf.ThreadPoolExecutor(3) as pool:
            futs = [pool.submit(b.submit, x) for x in (3, "boom", 5)]
            results = []
            for f in futs:
                try:
                    results.append(f.result())
                except ValueError as e:
                    results.append(e)
        assert results[0] == 6
        assert isinstance(results[1], ValueError)
        assert results[2] == 10
        # the co-batched flush failed, then each item ran solo
        assert any(len(c) > 1 for c in calls)
    finally:
        b.close()


def test_micro_batcher_batch_sizes_bounded():
    """batch_sizes is a bounded ring, not an unbounded log — a
    long-running server's memory must not grow per request."""
    from voice100_tpu.server import MicroBatcher

    b = MicroBatcher(lambda items: items, max_batch=1, flush_ms=0.0)
    try:
        assert b.batch_sizes.maxlen is not None
        for _ in range(b.batch_sizes.maxlen + 10):
            b.submit(1)
        assert len(b.batch_sizes) == b.batch_sizes.maxlen
    finally:
        b.close()


def test_server_without_models_rejects():
    server = SpeechServer(None, None, port=0)
    port = server.start()
    try:
        status, _, data = _request(port, "POST", "/transcribe", body=b"x")
        assert status == 400
        assert "no ASR model" in json.loads(data)["error"]
    finally:
        server.stop()
