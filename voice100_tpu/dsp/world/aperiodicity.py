"""Band aperiodicity estimation (D4C-equivalent interface).

The reference obtains aperiodicity from pyworld's D4C
(voice100/vocoder.py:72). This module estimates the same quantity — the
amplitude ratio of the aperiodic component per coarse frequency band
(3 kHz spacing, WORLD's codec convention) — via normalized comb
correlation: for a voiced frame, the band-limited signal's normalized
autocorrelation r at lag 1/F0 measures periodicity, and the aperiodic
amplitude ratio is sqrt(max(0, 1 - r)). Unvoiced frames are fully
aperiodic (ratio 1 - 1e-12, i.e. ~0 dB), matching D4C's convention and
the downstream voicing masks (codeap < -0.2, voice100/calc_stat.py:45).

This is a principled equivalent, not a line-for-line D4C port; the
output contract (full [T, fft//2+1] aperiodicity spectrum decoded from
coarse bands, dB range [-60, 0]) matches what the reference pipeline
consumes.
"""

from __future__ import annotations

import numpy as np

from .codec import decode_aperiodicity, get_num_aperiodicities

__all__ = ["band_aperiodicity", "d4c"]

_FREQ_INTERVAL = 3000.0
_FLOOR_DB = -60.0
_SAFE_MIN = 1e-12


def band_aperiodicity(
    x: np.ndarray,
    f0: np.ndarray,
    positions: np.ndarray,
    fs: int,
    backend: str = "numpy",
) -> np.ndarray:
    """Coarse aperiodicity in dB, ``[T, n_bands]`` (bands at 3k, 6k..).

    ``backend="jax"`` runs the batched FFT/correlation workload
    on-device (jit-compiled per padded frame count)."""
    if backend == "jax":
        return np.asarray(
            _band_aperiodicity_jax(
                np.asarray(x, np.float32), np.asarray(f0, np.float32),
                np.asarray(positions, np.float32), fs,
            )
        )
    x = np.asarray(x, dtype=np.float64)
    return _band_ap_impl(x, f0, positions, fs, np)


def _band_aperiodicity_jax(x, f0, positions, fs):
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("fs",))
    def impl(x, f0, positions, fs):
        return _band_ap_impl(x, f0, positions, fs, jnp)

    return impl(x, f0, positions, fs)


def _band_ap_impl(x, f0, positions, fs, xp):
    n_bands = get_num_aperiodicities(fs)
    t_frames = f0.shape[0]

    # analysis segment: >= 6 periods of the lowest usable F0; a mild
    # edge taper limits FFT leakage without modulating the center
    eff_f0 = xp.where(f0 > 0, f0, 200.0)
    win_len = 1024
    while win_len < int(6 * fs / 80.0):
        win_len *= 2
    offsets = xp.arange(win_len) - win_len // 2
    centers = xp.round(positions * fs).astype(xp.int32)
    idx = xp.clip(centers[:, None] + offsets[None, :], 0, x.shape[0] - 1)
    seg = x[idx]
    edge = win_len // 8
    ramp = 0.5 - 0.5 * xp.cos(xp.pi * xp.arange(edge) / edge)
    taper = xp.concatenate(
        [ramp, xp.ones(win_len - 2 * edge), ramp[::-1]]
    )
    seg = seg * taper[None, :]

    spec = xp.fft.rfft(seg, axis=1)  # [T, win/2+1]
    freqs = xp.arange(spec.shape[1]) * fs / win_len

    # correlate only the untapered central region (+/- 2 periods)
    lag = fs / eff_f0  # [T] fractional samples
    central = xp.abs(offsets[None, :]) <= (2.0 * lag[:, None])

    cols = []
    for b in range(n_bands):
        center = _FREQ_INTERVAL * (b + 1)
        lo, hi = center - _FREQ_INTERVAL, center + _FREQ_INTERVAL
        mask = (freqs >= lo) & (freqs < hi)
        band = xp.fft.irfft(spec * mask[None, :], n=win_len, axis=1)
        r = _fractional_autocorr(band, lag, central, xp)
        ratio = xp.sqrt(xp.clip(1.0 - r, _SAFE_MIN**2, 1.0))
        db = 20.0 * xp.log10(ratio)
        cols.append(xp.clip(db, _FLOOR_DB, 0.0))

    coded = xp.stack(cols, axis=1)
    return xp.where(
        (f0 > 0)[:, None], coded, 20.0 * np.log10(1.0 - _SAFE_MIN)
    )


def _fractional_autocorr(band, lag, region, xp=np):
    """Normalized autocorrelation at a per-row fractional lag, over a
    per-row boolean ``region`` of positions."""
    t_frames, width = band.shape
    base = xp.arange(width)
    li = xp.floor(lag).astype(xp.int32)
    frac = (lag - li)[:, None]
    idx0 = xp.clip(base[None, :] + li[:, None], 0, width - 1)
    idx1 = xp.clip(idx0 + 1, 0, width - 1)
    rows = xp.arange(t_frames)[:, None]
    shifted = band[rows, idx0] * (1 - frac) + band[rows, idx1] * frac
    valid = region & (base[None, :] + lag[:, None] + 1 < width)
    a = band * valid
    b = shifted * valid
    num = (a * b).sum(axis=1)
    den = xp.sqrt(
        (a * a).sum(axis=1) * (b * b).sum(axis=1)
    ) + xp.finfo(band.dtype).tiny
    return xp.clip(num / den, 0.0, 1.0)


def d4c(
    x: np.ndarray,
    f0: np.ndarray,
    positions: np.ndarray,
    fs: int,
    fft_size: int = 512,
) -> np.ndarray:
    """Full aperiodicity spectrum ``[T, fft_size//2+1]`` (amplitude
    ratio in [0, 1]), decoded from the coarse bands — API parity with
    pyworld.d4c as used in voice100/vocoder.py:72."""
    coded = band_aperiodicity(x, f0, positions, fs)
    return decode_aperiodicity(coded, fs, fft_size)


def band_aperiodicity_gd(
    x: np.ndarray,
    f0: np.ndarray,
    positions: np.ndarray,
    fs: int,
) -> np.ndarray:
    """D4C-style static-group-delay band aperiodicity, ``[T, n_bands]``
    dB — an estimator independent of the comb-correlation path above.

    Principle (Morise 2016's D4C): in a periodic band every harmonic is
    phase-locked to the same glottal epoch, so the group delay
    ``tau(w) = Re(conj(X) . F{n x[n]}) / |X|^2`` is constant across the
    band; aperiodic energy randomizes it. The phase of one period,
    ``theta(w) = 2 pi tau(w) f0 / fs``, is mapped to the unit circle and
    its power-weighted circular resultant ``r = |sum P e^{j theta}| /
    sum P`` measures band periodicity (invariant to the common epoch, so
    no explicit trend removal is needed). The aperiodic amplitude ratio
    is ``sqrt(1 - r)``, the same convention as the comb-correlation
    estimator, whose agreement with this one is pinned by
    ``tests/test_world_aperiodicity.py``.
    """
    x = np.asarray(x, dtype=np.float64)
    f0 = np.asarray(f0, dtype=np.float64)
    n_bands = get_num_aperiodicities(fs)
    eff_f0 = np.where(f0 > 0, f0, 200.0)

    # 4-period Hanning window (harmonics resolved: main lobe f0/2)
    win_len = 1024
    while win_len < int(4 * fs / 80.0):
        win_len *= 2
    offsets = np.arange(win_len) - win_len // 2
    centers = np.round(positions * fs).astype(np.int32)
    idx = np.clip(centers[:, None] + offsets[None, :], 0, x.shape[0] - 1)
    seg = x[idx]  # [T, W]
    half = 2.0 * fs / eff_f0  # [T] samples: 2 periods each side
    phase = offsets[None, :] / half[:, None]
    window = np.where(
        np.abs(phase) <= 1.0, 0.5 + 0.5 * np.cos(np.pi * phase), 0.0
    )
    w_seg = seg * window

    spec = np.fft.rfft(w_seg, axis=1)  # X(w)
    spec_t = np.fft.rfft(w_seg * offsets[None, :], axis=1)  # F{n x[n]}
    power = spec.real**2 + spec.imag**2
    tau = (spec.real * spec_t.real + spec.imag * spec_t.imag) / (
        power + np.finfo(np.float64).tiny
    )  # group delay in samples, per bin
    theta = 2.0 * np.pi * tau * (eff_f0 / fs)[:, None]

    freqs = np.arange(spec.shape[1]) * fs / win_len
    out = np.empty((f0.shape[0], n_bands))
    for b in range(n_bands):
        center = _FREQ_INTERVAL * (b + 1)
        mask = (freqs >= center - _FREQ_INTERVAL) & (
            freqs < center + _FREQ_INTERVAL
        )
        p_band = power[:, mask]
        resultant = np.abs(
            (p_band * np.exp(1j * theta[:, mask])).sum(axis=1)
        )
        r = resultant / (p_band.sum(axis=1) + np.finfo(np.float64).tiny)
        ratio = np.sqrt(np.clip(1.0 - r, _SAFE_MIN**2, 1.0))
        out[:, b] = np.clip(20.0 * np.log10(ratio), _FLOOR_DB, 0.0)
    return np.where(
        (f0 > 0)[:, None], out, 20.0 * np.log10(1.0 - _SAFE_MIN)
    )
