"""Host/device DSP: audio I/O, resampling, mel-cepstrum, WORLD vocoder."""

from .wav import read_wav, write_wav
from .resample import resample
from .audioio import load_audio

__all__ = ["read_wav", "write_wav", "resample", "load_audio"]
