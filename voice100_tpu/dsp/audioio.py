"""Audio file loading with rate conversion.

The framework's equivalent of torchaudio.load + resample /
sox remix+rate (voice100/data_modules.py:287-292,303-314): decode,
mix down to mono, resample to the target rate.

WAV decodes in NumPy; FLAC uses the native C++ decoder when built
(voice100_tpu.native), with a clear error otherwise.
"""

from __future__ import annotations

import os

import numpy as np

from .wav import read_wav
from .resample import resample

__all__ = ["load_audio"]


def _read_any(path: str):
    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav":
        return read_wav(path)
    if ext == ".flac":
        try:
            from ..native import flac  # C++ decoder, built on demand

            return flac.read_flac(path)
        except ImportError as e:
            raise RuntimeError(
                f"FLAC decoding requires the native extension "
                f"(voice100_tpu.native): {e}"
            ) from e
    if ext == ".mp3":
        # CommonVoice (cv_ja) clips; reference decodes them through
        # torchaudio/sox (voice100/data_modules.py:303-314)
        try:
            from ..native import mp3

            return mp3.read_mp3(path)
        except ImportError as e:
            raise RuntimeError(
                f"MP3 decoding requires the native extension "
                f"(voice100_tpu.native): {e}"
            ) from e
    raise ValueError(f"Unsupported audio format: {path}")


def load_audio(path: str, sample_rate: int = 16000) -> np.ndarray:
    """Load an audio file -> mono float32 ``[T]`` at ``sample_rate``.

    Channel policy matches sox ``remix 1`` (first channel) used by the
    reference WORLD pipeline and torchaudio's ``waveform[0]`` for mel
    (voice100/data_modules.py:289,303-315).
    """
    samples, rate = _read_any(path)
    mono = samples[0] if samples.ndim == 2 else samples
    if rate != sample_rate:
        mono = resample(mono, rate, sample_rate)
    return np.asarray(mono, dtype=np.float32)
