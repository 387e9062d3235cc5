"""Serving pipelines: batched, bucketed ASR and TTS inference.

The reference has no in-repo serving path (inference is delegated to
exported ONNX models consumed by voice100-runtime; the only end-to-end
synth flow is update_samples.py). This module is the framework's
first-class serving surface, designed for TPU batch inference:

* inputs bucket to a small set of padded shapes (one compiled program
  per bucket, no retrace storms),
* ASR runs waveform -> log-mel -> encoder -> greedy ids entirely
  on-device in one jit; token merging happens on host via the tokenizer
  (same decode flow the reference's runtime uses,
  /root/reference/tests/test_onnx.py:39-43),
* TTS runs text -> durations -> aligned text -> WORLD features ->
  waveform with the duration expansion and vocoder synthesis on-device.
"""

from __future__ import annotations

import functools
import re
from typing import Any, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .models import AudioToAlignText, TextToAlignText, AlignTextToAudio
from .ops.melspec import log_mel_spectrogram
from .ops.augment import BLANK_AUDIO
from .text import get_phonemizer, get_tokenizer

__all__ = ["ASRPipeline", "StreamingASRSession", "TTSPipeline"]


def _bucket(n: int, sizes: Sequence[int]) -> int:
    for s in sizes:
        if n <= s:
            return s
    return sizes[-1]


class ASRPipeline:
    """waveforms -> transcripts with the v2 ASR model."""

    def __init__(
        self,
        model: AudioToAlignText,
        variables,
        language: str = "en",
        use_phone: bool = False,
        sample_rate: int = 16000,
        batch_size: int = 8,
        buckets_sec: Sequence[float] = (2.0, 5.0, 10.0, 20.0, 40.0),
        mel_kernel: Optional[str] = None,
        mesh=None,
        beam_size: int = 0,
        beam_device: bool = True,
        beam_topk: int = 8,
        lm=None,
        lm_weight: float = 0.5,
        lm_bonus: float = 0.0,
    ) -> None:
        import os

        # beam_size > 0 switches greedy decoding to CTC prefix beam
        # search (strictly better when the model is uncertain; the
        # reference only decodes greedily). By default the search runs
        # ON DEVICE as a batched lax.scan (ops/ctc_beam_device.py) —
        # the host fetches only the decoded [B, L] ids instead of the
        # full [B, T, V] log-prob tensor, and nothing decodes one clip
        # at a time in Python. beam_device=False keeps the host
        # reference decoder (ops/ctc_beam.py). beam_topk bounds the
        # non-blank extension symbols considered per frame on device.
        # Long-form clips that stream through StreamingASRSession
        # always decode greedily — beam prefixes cannot be committed
        # frame-aligned mid-stream.
        # lm: optional trigram shallow fusion inside the beam search —
        # a CharNgramLM, a saved .npz path, or a raw [V, V, V] table
        # (text/ngram.py; the reference decodes with no LM at all).
        self.beam_size = beam_size
        self.beam_device = beam_device
        self.beam_topk = beam_topk
        self.lm_weight = float(lm_weight)
        self.lm_bonus = float(lm_bonus)
        if lm is None:
            self.lm_table = None
        else:
            from .text.ngram import CharNgramLM

            if isinstance(lm, str):
                lm = CharNgramLM.load(lm)
            self.lm_table = np.asarray(
                lm.table if isinstance(lm, CharNgramLM) else lm,
                np.float32,
            )
        self.model = model
        self.tokenizer = get_tokenizer(language, use_phone)
        if (
            self.lm_table is not None
            and self.lm_table.shape[2] != self.tokenizer.vocab_size
        ):
            # a mismatched table would silently gather wrong rows in
            # the fused beam search
            raise ValueError(
                f"LM vocab {self.lm_table.shape[2]} != tokenizer vocab "
                f"{self.tokenizer.vocab_size} (language={language!r}, "
                f"use_phone={use_phone}) — train the LM on the same "
                "prepared corpus (tools/train_lm.py)"
            )
        self.sample_rate = sample_rate
        self.batch_size = batch_size
        self.buckets = [int(s * sample_rate) for s in buckets_sec]
        # data-parallel serving: batches shard over the mesh 'data'
        # axis (batch_size must divide by it), parameters replicate;
        # GSPMD runs the decode across chips over ICI
        self.mesh = mesh
        if mesh is not None:
            from .parallel.mesh import replicated

            if batch_size % mesh.shape["data"] != 0:
                raise ValueError(
                    f"batch_size {batch_size} must be divisible by the "
                    f"mesh data axis {mesh.shape['data']}"
                )
            variables = jax.device_put(variables, replicated(mesh))
        self.variables = variables
        # mel frontend selection is fixed at construction ("pallas" or
        # "xla"); the env var is only a default, so flipping it after
        # the first jitted call cannot silently do nothing
        self.mel_kernel = (
            mel_kernel
            if mel_kernel is not None
            else os.environ.get("VOICE100_TPU_MEL_KERNEL", "xla")
        )

    def _features(self, wav, wav_len):
        """Shared mel frontend for the jitted decode paths."""
        if wav.dtype == jnp.int16:
            # int16 PCM normalized on device: WAV files store 16-bit
            # samples, and uploading them raw halves host->device
            # bandwidth vs a host-side float conversion. 1/32768 is a
            # power of two, so this is bit-exact with dividing on host.
            wav = wav.astype(jnp.float32) * (1.0 / 32768.0)
        if self.mel_kernel == "pallas":
            from .ops.melspec_pallas import log_mel_spectrogram_pallas

            mel = log_mel_spectrogram_pallas(
                wav, sample_rate=self.sample_rate
            )
        else:
            mel = log_mel_spectrogram(wav, sample_rate=self.sample_rate)
        mel_len = wav_len // 160 + 1
        # padded waveform tails produce mel frames past mel_len; mask
        # them to the blank level the model was trained with
        t = jnp.arange(mel.shape[1])
        mask = (t[None, :] < mel_len[:, None])[:, :, None]
        return jnp.where(mask, mel, BLANK_AUDIO), mel_len

    @functools.partial(jax.jit, static_argnums=(0,))
    def _decode(self, variables, wav, wav_len):
        mel, mel_len = self._features(wav, wav_len)
        ids, out_len = self.model.apply(
            variables, mel, mel_len,
            method=AudioToAlignText.greedy_decode,
        )
        return ids, out_len

    @functools.partial(jax.jit, static_argnums=(0,))
    def _log_probs(self, variables, wav, wav_len):
        mel, mel_len = self._features(wav, wav_len)
        logits, out_len = self.model.apply(variables, mel, mel_len)
        return jax.nn.log_softmax(logits, axis=-1), out_len

    @functools.partial(jax.jit, static_argnums=(0,))
    def _beam_decode(self, variables, wav, wav_len):
        from .ops.ctc_beam_device import ctc_prefix_beam_search_batched

        log_probs, out_len = self._log_probs(variables, wav, wav_len)
        return ctc_prefix_beam_search_batched(
            log_probs, out_len,
            beam_size=self.beam_size, topk=self.beam_topk,
            lm_table=self.lm_table, lm_weight=self.lm_weight,
            lm_bonus=self.lm_bonus,
        )

    def transcribe(self, waveforms: List[np.ndarray]) -> List[str]:
        """Batch transcription; inputs are mono at sample_rate, either
        float32 in [-1, 1] or int16 PCM (uploaded raw and normalized
        on device — half the host->device bytes, bit-identical mel).

        Inputs longer than the largest bucket stream through a
        :class:`StreamingASRSession` (block decode with right-context
        commitment) instead of being truncated.

        Two-phase: every batch is dispatched before any result is
        fetched, so host→device uploads and device compute for batch
        k+1 overlap the fetch + token decode of batch k (JAX dispatch
        is asynchronous; the blocking point is the host fetch).
        """
        results: List[Optional[str]] = [None] * len(waveforms)
        long_form = [
            i for i, w in enumerate(waveforms) if len(w) > self.buckets[-1]
        ]
        for i in long_form:
            # contexts derived from the largest bucket so the decode
            # window always covers the committed frontier (worst-case
            # buffer ~= left + right + 2*chunk = 7/8 bucket): no
            # interior audio is ever lost to the window bound
            bucket_sec = self.buckets[-1] / self.sample_rate
            session = StreamingASRSession(
                self,
                chunk_sec=bucket_sec / 4,
                right_context_sec=bucket_sec / 8,
                left_context_sec=bucket_sec / 4,
            )
            wav = waveforms[i]
            step = self.buckets[0]
            for start in range(0, len(wav), step):
                session.feed(wav[start:start + step])
            results[i] = session.finish()
        short = [i for i in range(len(waveforms)) if results[i] is None]
        order = [short[j] for j in np.argsort(
            [len(waveforms[i]) for i in short])]
        pcm16 = all(
            np.asarray(waveforms[i]).dtype == np.int16 for i in short
        )
        pending = []
        for start in range(0, len(order), self.batch_size):
            chunk = order[start:start + self.batch_size]
            max_len = _bucket(
                max(len(waveforms[i]) for i in chunk), self.buckets
            )
            batch = np.zeros(
                (self.batch_size, max_len),
                np.int16 if pcm16 else np.float32,
            )
            lengths = np.zeros(self.batch_size, np.int32)
            for row, i in enumerate(chunk):
                w = np.asarray(waveforms[i])[:max_len]
                if w.dtype == np.int16 and not pcm16:
                    w = w.astype(np.float32) * (1.0 / 32768.0)
                batch[row, : len(w)] = w
                lengths[row] = len(w)
            if self.mesh is not None:
                from .parallel.mesh import batch_sharding

                sharding = batch_sharding(self.mesh)
                wav_dev = jax.device_put(batch, sharding)
                len_dev = jax.device_put(lengths, sharding)
            else:
                wav_dev = jnp.asarray(batch)
                len_dev = jnp.asarray(lengths)
            if self.beam_size > 0 and not self.beam_device:
                out = self._log_probs(self.variables, wav_dev, len_dev)
            elif self.beam_size > 0:
                out = self._beam_decode(self.variables, wav_dev, len_dev)
            else:
                out = self._decode(self.variables, wav_dev, len_dev)
            pending.append((chunk, *out))
        if self.beam_size > 0 and not self.beam_device:
            from .ops.ctc_beam import ctc_prefix_beam_search

            for chunk, log_probs, out_len in pending:
                log_probs = np.asarray(log_probs)
                out_len = np.asarray(out_len)
                for row, i in enumerate(chunk):
                    prefix = ctc_prefix_beam_search(
                        log_probs[row, : out_len[row]],
                        beam_size=self.beam_size,
                        lm_table=self.lm_table,
                        lm_weight=self.lm_weight,
                        lm_bonus=self.lm_bonus,
                    )
                    results[i] = self.tokenizer.decode(prefix)
            return results  # type: ignore[return-value]
        if self.beam_size > 0:
            # device beam: rows are already collapsed label sequences
            for chunk, ids, n in pending:
                ids, n = np.asarray(ids), np.asarray(n)
                for row, i in enumerate(chunk):
                    results[i] = self.tokenizer.decode(
                        list(ids[row, : n[row]])
                    )
            return results  # type: ignore[return-value]
        for chunk, ids, out_len in pending:
            ids = np.asarray(ids)
            out_len = np.asarray(out_len)
            for row, i in enumerate(chunk):
                raw = self.tokenizer.decode(ids[row, : out_len[row]])
                results[i] = self.tokenizer.merge_repeated(raw)
        return results  # type: ignore[return-value]


class StreamingASRSession:
    """Incremental transcription over a live audio stream.

    Beyond the reference's scope (it only transcribes whole clips):
    block-processing streaming for the bidirectional v2 CTC model.
    Audio arrives in arbitrary chunks via :meth:`feed`; every
    ``chunk_sec`` of new audio the current window is decoded and logit
    frames older than ``right_context_sec`` are *committed* — the
    backward LSTM direction has seen at least that much future audio
    for them, so their ids are stable. ``left_context_sec`` of
    committed audio is kept in the window as warm-up context; older
    samples are dropped, bounding memory and compute for unbounded
    streams. CTC collapse (merge_repeated) runs over the committed id
    sequence, so tokens merge correctly across block boundaries.

    Committed ids are stable in practice once ``right_context_sec`` of
    future audio has been seen (the backward recurrence forgets
    geometrically), but are not re-decoded; for a trained model the
    final transcript matches offline transcription. The transcript
    grows prefix-monotonically across :meth:`feed` calls.
    """

    def __init__(
        self,
        pipeline: ASRPipeline,
        chunk_sec: float = 0.5,
        right_context_sec: float = 0.64,
        left_context_sec: Optional[float] = 2.0,
    ) -> None:
        self.pipeline = pipeline
        rate = pipeline.sample_rate
        # samples per logit frame: 160-sample mel hop x the encoder's
        # total time downsampling (product of conv strides)
        downsample = 1
        for setting in pipeline.model.encoder_settings:
            _, transpose, _, stride, _, _ = setting
            if transpose:
                raise ValueError(
                    "streaming requires a downsampling (non-transpose) "
                    "encoder"
                )
            downsample *= stride
        self._SAMPLES_PER_FRAME = 160 * downsample
        self.chunk = int(chunk_sec * rate)
        self.right_context = int(right_context_sec * rate)
        self.left_context = (
            None if left_context_sec is None
            else int(left_context_sec * rate)
        )
        self._buffer = np.zeros(0, np.float32)
        self._base = 0  # absolute sample index of _buffer[0]
        self._committed_frame = 0  # absolute logit frames committed
        self._committed_ids: List[int] = []
        self._since_decode = 0

    @property
    def transcript(self) -> str:
        tok = self.pipeline.tokenizer
        return tok.merge_repeated(tok.decode(self._committed_ids))

    def _decode_window(self):
        spf = self._SAMPLES_PER_FRAME
        n = len(self._buffer)
        # when the buffer outgrows the largest bucket, slide the window
        # to its tail (frame-aligned) — the frames that fall off are
        # either already committed or sacrificed to the window bound
        # (keep right_context + left_context well under the largest
        # bucket to avoid the latter)
        offset = 0
        if n > self.pipeline.buckets[-1]:
            offset = n - self.pipeline.buckets[-1]
            offset = -(-offset // spf) * spf
        window = self._buffer[offset:]
        max_len = _bucket(len(window), self.pipeline.buckets)
        wav = np.zeros((1, max_len), np.float32)
        valid = min(len(window), max_len)
        wav[0, :valid] = window[:valid]
        ids, out_len = self.pipeline._decode(
            self.pipeline.variables,
            jnp.asarray(wav),
            jnp.asarray([valid], np.int32),
        )
        ids = np.asarray(ids)[0][: int(np.asarray(out_len)[0])]
        window_start_frame = (self._base + offset) // spf
        return ids, window_start_frame

    def _commit_until(self, end_frame_abs: int) -> None:
        if end_frame_abs <= self._committed_frame:
            return
        ids, window_start_frame = self._decode_window()
        # frames before the window start were lost to the window bound
        # (misconfigured contexts vs bucket size); skip them
        rel_start = max(self._committed_frame - window_start_frame, 0)
        self._committed_frame = max(self._committed_frame,
                                    window_start_frame)
        rel_end = end_frame_abs - window_start_frame
        rel_end = min(rel_end, len(ids))
        if rel_end <= rel_start:
            return
        self._committed_ids.extend(int(i) for i in ids[rel_start:rel_end])
        self._committed_frame = window_start_frame + rel_end
        if self.left_context is not None:
            spf = self._SAMPLES_PER_FRAME
            keep_from_abs = max(
                self._committed_frame * spf - self.left_context, self._base
            )
            keep_from_abs = (keep_from_abs // spf) * spf  # frame-aligned
            drop = keep_from_abs - self._base
            if drop > 0:
                self._buffer = self._buffer[drop:]
                self._base = keep_from_abs

    def feed(self, chunk: np.ndarray) -> str:
        """Append audio; returns the transcript committed so far.
        Accepts float32 in [-1, 1] or int16 PCM chunks."""
        chunk = np.asarray(chunk)
        if chunk.dtype == np.int16:
            chunk = chunk.astype(np.float32) * (1.0 / 32768.0)
        else:
            chunk = chunk.astype(np.float32)
        self._buffer = np.concatenate([self._buffer, chunk])
        self._since_decode += len(chunk)
        if self._since_decode >= self.chunk:
            self._since_decode = 0
            total = self._base + len(self._buffer)
            stable_end = (total - self.right_context) // self._SAMPLES_PER_FRAME
            self._commit_until(stable_end)
        return self.transcript

    def finish(self) -> str:
        """Flush: commit every remaining frame and return the final
        transcript."""
        total = self._base + len(self._buffer)
        if len(self._buffer) > 0:
            # mel frames = wav_len // 160 + 1; after x2 downsample the
            # decode yields ceil frames — commit everything available
            self._commit_until(total // self._SAMPLES_PER_FRAME + 1)
        return self.transcript


class TTSPipeline:
    """texts -> waveforms with the v2 align + audio models."""

    def __init__(
        self,
        align_model: TextToAlignText,
        align_variables,
        audio_model: AlignTextToAudio,
        audio_variables,
        language: str = "en",
        use_phone: bool = True,
        sample_rate: int = 16000,
        text_buckets: Sequence[int] = (64, 128, 256),
        frame_buckets: Sequence[int] = (256, 512, 1024, 2048),
        mesh=None,
    ) -> None:
        from .dsp.world import WORLDVocoder

        self.align_model = align_model
        self.audio_model = audio_model
        # data-parallel serving: text batches shard over the mesh
        # 'data' axis, parameters replicate (same policy as ASRPipeline)
        self.mesh = mesh
        if mesh is not None:
            from .parallel.mesh import replicated

            align_variables = jax.device_put(
                align_variables, replicated(mesh))
            audio_variables = jax.device_put(
                audio_variables, replicated(mesh))
        self.align_variables = align_variables
        self.audio_variables = audio_variables
        self.phonemizer = get_phonemizer(language, use_phone)
        self.tokenizer = get_tokenizer(language, use_phone)
        self.sample_rate = sample_rate
        self.text_buckets = list(text_buckets)
        self.frame_buckets = list(frame_buckets)
        self.vocoder = WORLDVocoder(
            sample_rate=sample_rate,
            use_mcep=audio_model.logspc_size == 25,
        )

    @functools.partial(jax.jit, static_argnums=(0,))
    def _acoustics(self, variables, aligntext, aligntext_len):
        return self.audio_model.apply(
            variables, aligntext, aligntext_len,
            method=AlignTextToAudio.predict,
        )

    @functools.partial(jax.jit, static_argnums=(0,))
    def _durations(self, variables, text, text_len):
        return self.align_model.apply(
            variables, text, text_len, method=TextToAlignText.predict
        )

    @functools.partial(jax.jit, static_argnums=(0, 5))
    def _expand(self, variables, text, durations, text_len, out_len):
        return self.align_model.apply(
            variables, text, durations, text_len, out_len,
            method=TextToAlignText.align,
        )

    def _encoded_len(self, text: str) -> int:
        return len(self.tokenizer(self.phonemizer(text)))

    def _split_long(self, text: str) -> List[str]:
        """Split a text whose token encoding exceeds the largest text
        bucket into pieces that each fit: sentence-ish punctuation
        boundaries first, then word boundaries (characters for
        unspaced scripts), bisection as a last resort. The reference
        has no long-input path at all (update_samples.py synthesizes
        fixed sample sentences); the v2 models are trained on whole
        utterances, so per-piece synthesis matches training
        conditions better than one oversized input would."""
        return self._split_rec(text, max(self.text_buckets), level=0)

    def _split_rec(
        self, text: str, max_tokens: int, level: int
    ) -> List[str]:
        """level 0: sentence punctuation; 1: words (characters for
        unspaced scripts); 2+: bisection."""
        if self._encoded_len(text) <= max_tokens or len(text) <= 1:
            return [text]
        if level >= 2:
            mid = len(text) // 2
            return (
                self._split_rec(text[:mid], max_tokens, 2)
                + self._split_rec(text[mid:], max_tokens, 2)
            )
        if level == 0:
            parts = [
                p.strip() for p in re.split(
                    r"(?<=[.!?;:,、。！？；，])\s*", text
                ) if p.strip()
            ]
        else:
            parts = text.split(" ") if " " in text else list(text)
        if len(parts) <= 1:
            return self._split_rec(text, max_tokens, level + 1)
        sep = " " if " " in text else ""
        pieces: List[str] = []
        cur = ""
        cur_len = 0
        # token length is close to additive over parts, so the greedy
        # packing runs on per-part encodings (one G2P pass per part,
        # not per growing candidate — the final per-piece check below
        # re-encodes once and recurses if the estimate was low)
        sep_len = 1 if sep else 0
        for part in parts:
            part_len = self._encoded_len(part)
            cand_len = (cur_len + sep_len + part_len) if cur else part_len
            if cur and cand_len > max_tokens:
                pieces.append(cur)
                cur = part
                cur_len = part_len
            else:
                cur = (cur + sep + part) if cur else part
                cur_len = cand_len
        if cur:
            pieces.append(cur)
        out: List[str] = []
        for p in pieces:
            if self._encoded_len(p) <= max_tokens:
                out.append(p)
            else:
                out.extend(self._split_rec(p, max_tokens, level + 1))
        return out

    def synthesize(
        self, texts: List[str], output_dtype=np.float32
    ) -> List[np.ndarray]:
        """``output_dtype=np.int16`` quantizes to 16-bit PCM on device
        before the fetch (half the device->host bytes; int16 is the
        WAV storage format the waveforms are headed for anyway).

        Texts longer than the largest text bucket route through
        :meth:`_split_long` and are synthesized piecewise in the same
        bucketed batch, then concatenated (each piece carries the
        align model's own head/tail silence padding)."""
        max_tokens = max(self.text_buckets)
        segments: List[str] = []
        seg_encoded: List[Any] = []
        spans: List[tuple] = []
        for t in texts:
            enc = self.tokenizer(self.phonemizer(t))
            if len(enc) <= max_tokens:
                # fast path: the one encoding above is reused by
                # _synthesize_batch — no second G2P pass
                pieces, piece_enc = [t], [enc]
            else:
                pieces = self._split_long(t)
                piece_enc = [None] * len(pieces)
            spans.append((len(segments), len(pieces)))
            segments.extend(pieces)
            seg_encoded.extend(piece_enc)
        wavs = self._synthesize_batch(
            segments, output_dtype, encoded=seg_encoded
        )
        if any(count > 1 for _, count in spans):
            return [
                np.concatenate(wavs[start:start + count])
                if count > 1 else wavs[start]
                for start, count in spans
            ]
        return wavs

    def _synthesize_batch(
        self, texts: List[str], output_dtype=np.float32, encoded=None
    ) -> List[np.ndarray]:
        if encoded is None:
            encoded = [None] * len(texts)
        encoded = [
            e if e is not None else self.tokenizer(self.phonemizer(t))
            for t, e in zip(texts, encoded)
        ]
        text_bucket = _bucket(
            max(len(e) for e in encoded), self.text_buckets
        )
        n = len(texts)
        if self.mesh is not None:
            data_axis = self.mesh.shape["data"]
            n = -(-n // data_axis) * data_axis  # pad rows to shard evenly
        text = np.zeros((n, text_bucket), np.int32)
        text_len = np.ones(n, np.int32)
        for i, e in enumerate(encoded):
            e = e[:text_bucket]
            text[i, : len(e)] = e
            text_len[i] = max(len(e), 1)
        if self.mesh is not None:
            from .parallel.mesh import batch_sharding

            sharding = batch_sharding(self.mesh)
            text = jax.device_put(text, sharding)
            text_len = jax.device_put(text_len, sharding)

        # first pass for capacity, then the bucketed expansion (both
        # jitted: one compile per text/frame bucket)
        durations = self._durations(
            self.align_variables, jnp.asarray(text), jnp.asarray(text_len)
        )
        mask = (
            np.arange(text_bucket)[None, :] < text_len[:, None]
        )
        totals = np.asarray(
            jnp.sum(durations * mask[:, :, None], axis=(1, 2))
        )
        need = int(np.max(totals)) + text_bucket + 16
        out_len = _bucket(need, self.frame_buckets)

        aligntext, aligntext_len = self._expand(
            self.align_variables, jnp.asarray(text), durations,
            jnp.asarray(text_len), out_len,
        )
        f0, feat, codeap = self._acoustics(
            self.audio_variables, aligntext, aligntext_len
        )
        aligntext_len = np.asarray(aligntext_len)
        audio_lens = np.minimum(aligntext_len * 2, np.asarray(f0).shape[1])
        batch_wav = self.vocoder.decode_batch(
            f0, feat, np.asarray(codeap), audio_lens, dtype=output_dtype
        )
        hop = self.sample_rate * self.vocoder.frame_period / 1000.0
        wavs = []
        for i in range(len(texts)):
            # round the total, not per-frame: hop is fractional at
            # 22.05 kHz (matches the synthesizers' length math)
            n_samples = int(round(max(int(audio_lens[i]) - 1, 1) * hop)) + 1
            wav = batch_wav[i, :n_samples]
            if batch_wav.dtype == np.int16:
                # clipped + quantized on device; copy so the result is
                # writable and does not pin the whole padded batch
                # buffer (the float path's clip/astype copies anyway)
                wavs.append(np.array(wav, dtype=np.int16))
            else:
                wavs.append(np.clip(wav, -1.0, 1.0).astype(np.float32))
        return wavs
