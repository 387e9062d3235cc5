"""Log-mel spectrogram front-end as on-device JAX ops.

Replaces torchaudio's MelSpectrogram as used by the reference
(voice100/data_modules.py:262-292: 16 kHz, n_fft=512, win=400, hop=160,
64 mels, log(x + 1e-6)) with numerics matched to torch.stft semantics:
centered reflect padding, periodic Hann window zero-padded to n_fft,
power-2 spectrum, HTK mel scale, no filterbank normalization.

TPU-first design: the whole transform is three matmuls per utterance
(frames @ DFT_cos, frames @ DFT_sin, power @ mel) — all MXU work — plus
cheap elementwise ops that XLA fuses. A batched waveform therefore runs
as one big [B*F, n_fft] x [n_fft, n_freq] contraction. ``use_fft=True``
switches to XLA's FFT if preferred.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "hann_window",
    "mel_filterbank",
    "frame_signal",
    "power_spectrum",
    "log_mel_spectrogram",
    "MelSpectrogram",
    "num_frames",
    "LOG_OFFSET",
    "MELSPEC_DIM",
]

LOG_OFFSET = 1e-6  # reference voice100/data_modules.py:25
MELSPEC_DIM = 64   # reference voice100/data_modules.py:24


def hann_window(win_length: int, n_fft: int) -> np.ndarray:
    """Periodic Hann window of ``win_length``, zero-padded (centered) to
    ``n_fft`` — the torch.stft convention."""
    n = np.arange(win_length)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    pad_left = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype=np.float64)
    out[pad_left:pad_left + win_length] = w
    return out


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
) -> np.ndarray:
    """Triangular HTK-mel filterbank ``[n_freqs, n_mels]`` (norm=None),
    matching torchaudio.functional.melscale_fbanks defaults."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    f_pts = _mel_to_hz(mel_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                      # [n_mels+1]
    slopes = f_pts[None, :] - all_freqs[:, None]         # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def num_frames(n_samples, hop_length: int):
    """Frame count for a centered STFT (works on ints or arrays)."""
    return n_samples // hop_length + 1


def frame_signal(waveform: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """``[..., T] -> [..., F, n_fft]`` with centered reflect padding."""
    pad = n_fft // 2
    pad_widths = [(0, 0)] * (waveform.ndim - 1) + [(pad, pad)]
    x = jnp.pad(waveform, pad_widths, mode="reflect")
    n = waveform.shape[-1]
    frames = n // hop_length + 1
    idx = (
        jnp.arange(frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    )
    return jnp.take(x, idx, axis=-1)


@functools.lru_cache(maxsize=8)
def _dft_matrices(n_fft: int):
    """Real-DFT cos/sin matrices [n_fft, n_fft//2+1] (host constants)."""
    n_freq = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None] * np.arange(n_freq)[None, :]
    ang = 2.0 * np.pi * t / n_fft
    return (
        np.cos(ang).astype(np.float32),
        -np.sin(ang).astype(np.float32),
    )


def power_spectrum(
    waveform: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    use_fft: bool = False,
) -> jnp.ndarray:
    """``[..., T] -> [..., F, n_fft//2+1]`` power-2 STFT magnitude."""
    window = jnp.asarray(hann_window(win_length, n_fft), dtype=waveform.dtype)
    frames = frame_signal(waveform, n_fft, hop_length) * window
    if use_fft:
        spec = jnp.fft.rfft(frames, axis=-1)
        return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    cos_m, sin_m = _dft_matrices(n_fft)
    # Full-precision matmuls: spectral parity matters more than the few
    # extra MXU passes (TPU default would run these in bfloat16).
    highest = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, jnp.asarray(cos_m, waveform.dtype), precision=highest)
    im = jnp.matmul(frames, jnp.asarray(sin_m, waveform.dtype), precision=highest)
    return re * re + im * im


def log_mel_spectrogram(
    waveform: jnp.ndarray,
    sample_rate: int = 16000,
    n_fft: int = 512,
    win_length: int = 400,
    hop_length: int = 160,
    n_mels: int = MELSPEC_DIM,
    log_offset: float = LOG_OFFSET,
    use_fft: bool = False,
) -> jnp.ndarray:
    """``[..., T] -> [..., F, n_mels]`` log-mel features.

    Matches the reference transform output layout [time, mel]
    (voice100/data_modules.py:287-292).
    """
    spec = power_spectrum(waveform, n_fft, hop_length, win_length, use_fft)
    fb = jnp.asarray(
        mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate), dtype=spec.dtype
    )
    mel = jnp.matmul(spec, fb, precision=jax.lax.Precision.HIGHEST)
    return jnp.log(mel + log_offset)


@functools.lru_cache(maxsize=8)
def _np_mel_constants(n_fft: int, win_length: int, n_mels: int,
                      sample_rate: int):
    return (
        hann_window(win_length, n_fft).astype(np.float32),
        mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate),
    )


def log_mel_spectrogram_np(
    waveform: np.ndarray,
    sample_rate: int = 16000,
    n_fft: int = 512,
    win_length: int = 400,
    hop_length: int = 160,
    n_mels: int = MELSPEC_DIM,
    log_offset: float = LOG_OFFSET,
) -> np.ndarray:
    """Host NumPy twin of :func:`log_mel_spectrogram` (same torch.stft
    semantics), for framework-free serving paths (onnx.serve)."""
    window, fb = _np_mel_constants(n_fft, win_length, n_mels, sample_rate)
    x = np.asarray(waveform, np.float32)
    pad = n_fft // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    frames = x.shape[-1] // hop_length + 1
    idx = (
        np.arange(frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    )
    windowed = xp[idx] * window
    spec = np.fft.rfft(windowed, axis=-1)
    power = (spec.real**2 + spec.imag**2).astype(np.float32)
    return np.log(power @ fb + log_offset)


class MelSpectrogram:
    """Configured log-mel transform (jit-friendly callable)."""

    def __init__(
        self,
        sample_rate: int = 16000,
        n_fft: int = 512,
        win_length: int = 400,
        hop_length: int = 160,
        n_mels: int = MELSPEC_DIM,
        log_offset: float = LOG_OFFSET,
    ) -> None:
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.win_length = win_length
        self.hop_length = hop_length
        self.n_mels = n_mels
        self.log_offset = log_offset

    @property
    def audio_size(self) -> int:
        return self.n_mels

    def __call__(self, waveform: jnp.ndarray) -> jnp.ndarray:
        return log_mel_spectrogram(
            waveform,
            sample_rate=self.sample_rate,
            n_fft=self.n_fft,
            win_length=self.win_length,
            hop_length=self.hop_length,
            n_mels=self.n_mels,
            log_offset=self.log_offset,
        )

    def output_length(self, n_samples):
        return num_frames(n_samples, self.hop_length)
