"""CheapTrick spectral-envelope estimation (vectorized).

Implements the published CheapTrick algorithm (Morise 2015) used by the
reference through pyworld (voice100/vocoder.py:70): pitch-synchronous
Hanning windowing (3 periods), DC correction below F0, rectangular
spectral smoothing of width 2F0/3, and cepstral liftering with the
q1 = -0.15 compensation lifter. All frames are processed as one batched
FFT workload (padded windows + masks instead of per-frame loops).

Dual backend: the same vectorized code runs on host NumPy (default,
used by the cached corpus preprocessing) or on-device via jax.numpy
(``backend="jax"``, jit-able — the frame axis is the TPU batch).
"""

from __future__ import annotations

import numpy as np

__all__ = ["cheaptrick", "DEFAULT_F0", "f0_floor_for_fft_size"]

DEFAULT_F0 = 500.0
_Q1 = -0.15
_EPS = 1e-9


def f0_floor_for_fft_size(fs: int, fft_size: int) -> float:
    """Lowest F0 whose 3-period window fits the FFT."""
    return 3.0 * fs / (fft_size - 3.0)


def _windowed_frames(x, fs, f0, positions, fft_size, xp=np):
    """Extract 3-period Hanning-windowed, bias-removed frames
    ``[T, fft_size]``."""
    half_max = fft_size // 2 - 1
    offsets = xp.arange(-half_max, half_max + 1)  # [W]
    half_len = xp.round(1.5 * fs / f0).astype(xp.int32)  # [T]
    centers = xp.round(positions * fs).astype(xp.int32)  # [T]
    idx = centers[:, None] + offsets[None, :]
    idx = xp.clip(idx, 0, x.shape[0] - 1)
    seg = x[idx]  # [T, W]
    in_window = xp.abs(offsets[None, :]) <= half_len[:, None]
    phase = offsets[None, :] / (1.5 * fs / f0[:, None])
    window = (0.5 + 0.5 * xp.cos(xp.pi * phase)) * in_window
    wave = seg * window
    # remove window-weighted mean so the DC bin carries no bias
    coeff = wave.sum(axis=1, keepdims=True) / xp.maximum(
        window.sum(axis=1, keepdims=True), 1e-12
    )
    wave = wave - window * coeff
    # normalize window energy: the power spectrum then estimates the
    # per-sample PSD, making analysis->synthesis energy-consistent
    wave = wave / xp.sqrt(
        xp.maximum((window**2).sum(axis=1, keepdims=True), 1e-12)
    )
    return xp.pad(wave, ((0, 0), (0, fft_size - wave.shape[1])))


def _dc_correction(power, fs, fft_size, f0, xp=np):
    """Mirror spectral content around F0 into the bins below F0."""
    n_bins = fft_size // 2 + 1
    freqs = xp.arange(n_bins) * fs / fft_size  # [F]
    mirror_freq = 2.0 * f0[:, None] - freqs[None, :]  # [T, F]
    pos = mirror_freq * fft_size / fs
    pos = xp.clip(pos, 0, n_bins - 1)
    lo = xp.floor(pos).astype(xp.int32)
    hi = xp.minimum(lo + 1, n_bins - 1)
    frac = pos - lo
    rows = xp.arange(power.shape[0])[:, None]
    replica = power[rows, lo] * (1 - frac) + power[rows, hi] * frac
    below = freqs[None, :] < f0[:, None]
    return power + xp.where(below, replica, 0.0)


def _linear_smoothing(power, fs, fft_size, width, max_width, xp=np):
    """Rectangular smoothing of width ``width`` Hz, with the spectrum
    mirrored at DC and Nyquist so edge windows integrate real energy
    (WORLD's mirroring trick). ``max_width`` must be a python float
    upper bound on width (static shift count for jit).

    Computed as a direct overlap-weighted sum over neighboring bins
    (piecewise-constant density), NOT as a difference of integrated
    spectra: power spans many orders of magnitude across frequency, and
    the cumsum formulation catastrophically cancels in float32 on the
    on-device backend (the quiet valleys between formants would carry
    ~20 dB of error).
    """
    n_bins = fft_size // 2 + 1
    bin_hz = fs / fft_size
    margin = int(np.ceil(max_width / 2.0 / bin_hz)) + 2
    margin = min(margin, n_bins - 1)
    ext = xp.concatenate(
        [power[:, margin:0:-1], power, power[:, -2:-2 - margin:-1]], axis=1
    )  # [T, F + 2*margin], sample m at freq (m - margin) * bin_hz
    half = width[:, None] / 2.0  # [T, 1]
    out = xp.zeros_like(power)
    for k in range(-margin, margin + 1):
        # overlap of bin at offset k (segment k*bin +- bin/2) with the
        # rect window [-w/2, w/2], in Hz
        seg_lo = (k - 0.5) * bin_hz
        seg_hi = (k + 0.5) * bin_hz
        overlap = xp.clip(
            xp.minimum(half, seg_hi) - xp.maximum(-half, seg_lo),
            0.0, bin_hz,
        )  # [T, 1]
        out = out + ext[:, margin + k: margin + k + n_bins] * overlap
    return out / width[:, None]


def _lifter(log_power, fs, fft_size, f0, xp=np):
    """Cepstral smoothing + q1 compensation liftering."""
    cep = xp.fft.irfft(log_power, n=fft_size, axis=1)  # even symmetric
    q = xp.arange(fft_size // 2 + 1) / fs  # quefrency of bins 0..N/2
    arg = xp.pi * f0[:, None] * q[None, :]
    smoothing = xp.where(
        arg == 0, 1.0,
        xp.sin(xp.maximum(arg, 1e-12)) / xp.maximum(arg, 1e-12),
    )
    compensation = (1.0 - 2.0 * _Q1) + 2.0 * _Q1 * xp.cos(2.0 * arg)
    lifter_half = smoothing * compensation
    # apply symmetrically to the full cepstrum
    full = xp.concatenate(
        [lifter_half, lifter_half[:, -2:0:-1]], axis=1
    )
    cep = cep * full
    return xp.exp(xp.fft.rfft(cep, n=fft_size, axis=1).real)


def _cheaptrick_impl(x, f0, positions, fs, fft_size, xp):
    floor = f0_floor_for_fft_size(fs, fft_size)
    eff_f0 = xp.where(f0 <= floor, DEFAULT_F0, f0)
    frames = _windowed_frames(x, fs, eff_f0, positions, fft_size, xp=xp)
    spec = xp.fft.rfft(frames, n=fft_size, axis=1)
    power = spec.real**2 + spec.imag**2
    power = _dc_correction(power, fs, fft_size, eff_f0, xp=xp)
    power = _linear_smoothing(
        power, fs, fft_size, eff_f0 * 2.0 / 3.0,
        max_width=DEFAULT_F0 * 2.0 / 3.0, xp=xp,
    )
    tiny = xp.finfo(power.dtype).tiny
    power = xp.maximum(
        power, _EPS * power.max(axis=1, keepdims=True) + tiny
    )
    return _lifter(xp.log(power), fs, fft_size, eff_f0, xp=xp)


def cheaptrick(
    x: np.ndarray,
    f0: np.ndarray,
    positions: np.ndarray,
    fs: int,
    fft_size: int = 512,
    backend: str = "numpy",
) -> np.ndarray:
    """Estimate the power spectral envelope ``[T, fft_size//2+1]``.

    Unvoiced frames (f0 at/below the window floor) use the 500 Hz
    default window, as WORLD does. ``backend="jax"`` runs the whole
    frame batch on-device (jit-compiled per padded frame count).
    """
    if backend == "jax":
        return np.asarray(
            _cheaptrick_jax(
                np.asarray(x, np.float32), np.asarray(f0, np.float32),
                np.asarray(positions, np.float32), fs, fft_size,
            )
        )
    x = np.asarray(x, dtype=np.float64)
    f0 = np.asarray(f0, dtype=np.float64)
    return _cheaptrick_impl(x, f0, positions, fs, fft_size, np)


def _cheaptrick_jax(x, f0, positions, fs, fft_size):
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("fs", "fft_size"))
    def impl(x, f0, positions, fs, fft_size):
        return _cheaptrick_impl(x, f0, positions, fs, fft_size, jnp)

    return impl(x, f0, positions, fs, fft_size)
