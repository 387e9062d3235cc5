"""HTTP serving daemon for ASR and TTS.

The reference delegates serving to exported ONNX files and the separate
voice100-runtime project; this framework also ships a first-class
network surface: a small stdlib HTTP server wrapping the batched
serving pipelines (inference.py) or the framework-free ONNX classes
(onnx/serve.py).

Endpoints (JSON unless noted):

  GET  /healthz               -> {"status": "ok", "models": [...]}
  POST /transcribe            body: WAV bytes (or float32 PCM with
                              X-Raw-Sample-Rate header)
                              -> {"text": "..."}
  POST /synthesize            body: {"text": "..."}
                              -> WAV bytes (16-bit PCM)

Start:
  python -m voice100_tpu.server --asr_config ... --asr_ckpt ... \
      [--tts_align_config/--tts_align_ckpt \
       --tts_audio_config/--tts_audio_ckpt] [--port 8080]

Concurrent requests MICRO-BATCH: the HTTP layer is threaded, request
bodies decode in parallel, and a per-endpoint batcher queues decoded
inputs and flushes them into ONE batched pipeline call by size
(pipeline batch size) or timeout (``--batch_window_ms``, default 10).
Per-request results are identical to sequential serving — the batched
pipelines are row-independent (pinned by tests/test_server.py).
Scale-out stays one process per chip, DP via ASRPipeline(mesh=...)
inside a process.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

__all__ = ["MicroBatcher", "SpeechServer", "cli_main"]


class _Slot:
    __slots__ = ("event", "result", "error")

    def __init__(self):
        self.event = threading.Event()
        self.result = None
        self.error = None


class MicroBatcher:
    """Flush concurrent single-item requests into one batched call.

    ``fn(list_of_inputs) -> list_of_outputs`` runs on a dedicated
    worker thread. A batch dispatches when ``max_batch`` items are
    queued or ``flush_ms`` after the first queued item, whichever
    comes first — a lone request pays at most the flush window, and
    concurrent requests ride one device dispatch instead of
    serializing. ``batch_sizes`` records recent dispatched batch sizes
    (bounded ring — observability + tests). When a batched call fails,
    its items RETRY individually so one bad input 500s only its own
    request, not every co-batched neighbor."""

    def __init__(self, fn, max_batch: int = 8,
                 flush_ms: float = 10.0) -> None:
        from collections import deque

        self._fn = fn
        self._max = max(1, int(max_batch))
        self._flush_s = max(0.0, flush_ms) / 1000.0
        self._items: List = []
        self._cond = threading.Condition()
        self._stop = False
        # bounded: a long-running server must not grow this forever
        self.batch_sizes = deque(maxlen=1024)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, item):
        slot = _Slot()
        with self._cond:
            if self._stop:
                raise RuntimeError("MicroBatcher is closed")
            self._items.append((item, slot))
            self._cond.notify_all()
        slot.event.wait()
        if slot.error is not None:
            raise slot.error
        return slot.result

    def close(self) -> None:
        with self._cond:
            self._stop = True
            self._cond.notify_all()
        self._thread.join(timeout=5)

    def _run(self) -> None:
        while True:
            with self._cond:
                while not self._items and not self._stop:
                    self._cond.wait()
                if self._stop and not self._items:
                    return
                deadline = time.monotonic() + self._flush_s
                while len(self._items) < self._max and not self._stop:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._cond.wait(remaining)
                batch = self._items[: self._max]
                del self._items[: self._max]
            self.batch_sizes.append(len(batch))
            try:
                outs = self._fn([item for item, _ in batch])
                if len(outs) != len(batch):
                    raise RuntimeError(
                        f"batched fn returned {len(outs)} results "
                        f"for {len(batch)} inputs"
                    )
                for (_, slot), out in zip(batch, outs):
                    slot.result = out
                    slot.event.set()
            except Exception as e:
                if len(batch) == 1:
                    batch[0][1].error = e
                    batch[0][1].event.set()
                    continue
                # one bad input must not fail its co-batched neighbors:
                # retry item-by-item, delivering each its own outcome
                for item, slot in batch:
                    try:
                        outs = self._fn([item])
                        if len(outs) != 1:
                            raise RuntimeError(
                                f"batched fn returned {len(outs)} "
                                "results for 1 input"
                            )
                        slot.result = outs[0]
                    except Exception as item_e:
                        slot.error = item_e
                    slot.event.set()


class SpeechServer:
    """Holds the pipelines and serves them over HTTP."""

    def __init__(
        self,
        asr_pipeline=None,
        tts_pipeline=None,
        host: str = "127.0.0.1",
        port: int = 8080,
        batch_window_ms: float = 10.0,
    ) -> None:
        self.asr = asr_pipeline
        self.tts = tts_pipeline
        self.host = host
        self.port = port
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None
        # cross-request micro-batching: only the framework pipelines
        # take input LISTS (the Onnx* classes are single-item); cap the
        # batch at the pipeline's own padding bucket so a flush never
        # splits into multiple device batches internally.
        self.asr_batcher = None
        if asr_pipeline is not None and hasattr(asr_pipeline,
                                                "batch_size"):
            self.asr_batcher = MicroBatcher(
                asr_pipeline.transcribe,
                max_batch=asr_pipeline.batch_size,
                flush_ms=batch_window_ms,
            )
        self.tts_batcher = None
        if tts_pipeline is not None and hasattr(tts_pipeline,
                                                "frame_buckets"):
            self.tts_batcher = MicroBatcher(
                tts_pipeline.synthesize,
                max_batch=getattr(tts_pipeline, "batch_size", 8),
                flush_ms=batch_window_ms,
            )

    # -- request handling -------------------------------------------------
    def _decode_audio_body(self, body: bytes, headers) -> np.ndarray:
        raw_rate = headers.get("X-Raw-Sample-Rate")
        if raw_rate:
            wav = np.frombuffer(body, np.float32)
            rate = int(raw_rate)
        else:
            from .dsp.wav import parse_wav

            # 16-bit PCM stays int16 so ASRPipeline can upload it raw
            # (half the host->device bytes, normalized on device)
            samples, rate = parse_wav(body, keep_int16=True)
            wav = samples[0]
        target = getattr(self.asr, "sample_rate", 16000)
        if rate != target:
            from .dsp.resample import resample

            if wav.dtype == np.int16:
                wav = wav.astype(np.float32) * (1.0 / 32768.0)
            wav = resample(wav, rate, target)
        if wav.dtype == np.int16:
            return wav
        return np.asarray(wav, np.float32)

    def handle_transcribe(self, body: bytes, headers) -> dict:
        if self.asr is None:
            raise LookupError("no ASR model loaded")
        wav = self._decode_audio_body(body, headers)
        if self.asr_batcher is not None:  # ASRPipeline, micro-batched
            text = self.asr_batcher.submit(wav)
        else:  # OnnxASR (float-only frontend)
            if wav.dtype == np.int16:
                wav = wav.astype(np.float32) * (1.0 / 32768.0)
            text = self.asr.transcribe(wav)
        return {"text": text}

    def handle_synthesize(self, body: bytes) -> bytes:
        if self.tts is None:
            raise LookupError("no TTS model loaded")
        payload = json.loads(body.decode("utf-8"))
        text = payload["text"]
        if self.tts_batcher is not None:  # TTSPipeline, micro-batched
            wav = self.tts_batcher.submit(text)
        else:  # OnnxTTS
            wav = self.tts.synthesize(text)
        from .dsp.wav import write_wav_bytes

        rate = getattr(self.tts, "sample_rate", 16000)
        return write_wav_bytes(np.asarray(wav, np.float32), rate)

    # -- server lifecycle --------------------------------------------------
    def _make_handler(server):  # noqa: N805 (closure over the server)
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet by default
                pass

            def _send(self, code: int, body: bytes,
                      content_type: str) -> None:
                self.send_response(code)
                self.send_header("Content-Type", content_type)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _send_json(self, code: int, obj) -> None:
                self._send(code, json.dumps(obj).encode("utf-8"),
                           "application/json")

            def do_GET(self):
                if self.path == "/healthz":
                    models = []
                    if server.asr is not None:
                        models.append("asr")
                    if server.tts is not None:
                        models.append("tts")
                    self._send_json(200, {"status": "ok",
                                          "models": models})
                else:
                    self._send_json(404, {"error": "not found"})

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                try:
                    if self.path == "/transcribe":
                        self._send_json(
                            200,
                            server.handle_transcribe(body, self.headers),
                        )
                    elif self.path == "/synthesize":
                        self._send(200, server.handle_synthesize(body),
                                   "audio/wav")
                    else:
                        self._send_json(404, {"error": "not found"})
                except LookupError as e:
                    self._send_json(400, {"error": str(e)})
                except Exception as e:  # surface, don't kill the server
                    self._send_json(500, {"error": f"{type(e).__name__}: {e}"})

        return Handler

    def start(self) -> int:
        """Start serving on a background thread; returns the bound port."""
        self._httpd = ThreadingHTTPServer((self.host, self.port),
                                          self._make_handler())
        self._httpd.daemon_threads = True
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self.port

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        for batcher in (self.asr_batcher, self.tts_batcher):
            if batcher is not None:
                batcher.close()

    def serve_forever(self) -> None:
        """Blocking variant of start() (same bind/handler path)."""
        self.start()
        print(f"[server] listening on {self.host}:{self.port}")
        self._thread.join()


def _load_model(config_path: str, ckpt_path: str):
    """Instantiate just the model section of a config + its checkpoint
    (serving needs no datamodule or trainer config)."""
    from .training.checkpoint import load_variables
    from .training.cli import (
        _MODEL_CLASSES, _filter_kwargs, _resolve_class, load_config,
    )

    config = load_config(config_path)
    model_cfg = config["model"]
    cls = _resolve_class(model_cfg["class_path"], _MODEL_CLASSES)
    kwargs = dict(model_cfg.get("init_args") or {})
    kwargs.pop("audio_stat", None)
    model = cls(**_filter_kwargs(cls, kwargs))
    return model, dict(load_variables(ckpt_path))


def cli_main(argv=None) -> None:
    import argparse

    parser = argparse.ArgumentParser(prog="voice100-tpu-serve")
    parser.add_argument("--asr_config")
    parser.add_argument("--asr_ckpt")
    parser.add_argument("--tts_align_config")
    parser.add_argument("--tts_align_ckpt")
    parser.add_argument("--tts_audio_config")
    parser.add_argument("--tts_audio_ckpt")
    parser.add_argument("--language", default="en")
    parser.add_argument("--use_phone", action="store_true")
    parser.add_argument(
        "--beam_size", type=int, default=0,
        help="CTC prefix beam search width for /transcribe (0 = "
             "greedy); runs batched on device (ops/ctc_beam_device.py)",
    )
    parser.add_argument(
        "--lm", default=None,
        help="trigram LM .npz (tools/train_lm.py) fused into the beam "
             "search on device; needs --beam_size > 0",
    )
    parser.add_argument("--lm_weight", type=float, default=0.5)
    parser.add_argument("--lm_bonus", type=float, default=0.0)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument(
        "--batch_window_ms", type=float, default=10.0,
        help="micro-batch flush window: concurrent requests arriving "
             "within this window share one batched device dispatch",
    )
    parser.add_argument("--platform", default=None)
    args = parser.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    asr = tts = None
    if args.asr_config and args.asr_ckpt:
        from .inference import ASRPipeline

        model, variables = _load_model(args.asr_config, args.asr_ckpt)
        asr = ASRPipeline(model, variables, language=args.language,
                          use_phone=args.use_phone,
                          beam_size=args.beam_size, lm=args.lm,
                          lm_weight=args.lm_weight,
                          lm_bonus=args.lm_bonus)
    tts_flags = (args.tts_align_config, args.tts_align_ckpt,
                 args.tts_audio_config, args.tts_audio_ckpt)
    if any(tts_flags):
        if not all(tts_flags):
            raise SystemExit(
                "TTS serving needs all four flags: --tts_align_config, "
                "--tts_align_ckpt, --tts_audio_config, --tts_audio_ckpt"
            )
        from .inference import TTSPipeline

        align_model, align_vars = _load_model(
            args.tts_align_config, args.tts_align_ckpt)
        audio_model, audio_vars = _load_model(
            args.tts_audio_config, args.tts_audio_ckpt)
        tts = TTSPipeline(align_model, align_vars, audio_model,
                          audio_vars, language=args.language,
                          use_phone=args.use_phone)
    if asr is None and tts is None:
        raise SystemExit("load at least one model (--asr_config/--asr_ckpt"
                         " or the four --tts_* flags)")
    SpeechServer(asr, tts, host=args.host, port=args.port,
                 batch_window_ms=args.batch_window_ms).serve_forever()


if __name__ == "__main__":
    cli_main()
