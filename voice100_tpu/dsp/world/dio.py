"""DIO-style F0 estimation (vectorized host NumPy).

Implements the DIO algorithm family used by the reference through
pyworld (voice100/vocoder.py:67-69): a bank of Nuttall-windowed low-pass
filters at log-spaced boundary frequencies, four interval-based F0
candidates per band (rising/falling zero crossings, peaks, dips),
stability-scored candidate selection, and contour fixing (jump removal +
short-segment pruning + candidate re-selection).

Bit-parity with WORLD's dio.cpp is not claimed (and is unverifiable in
this environment); the algorithm structure, defaults (frame 10 ms,
floor 80 / ceil 400 via the caller), and output contract (f0 == 0 for
unvoiced frames, temporal positions at the frame period) match.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["dio"]


def _nuttall(n: int) -> np.ndarray:
    t = np.arange(n) * 2.0 * np.pi / (n - 1)
    return (
        0.355768
        - 0.487396 * np.cos(t)
        + 0.144232 * np.cos(2 * t)
        - 0.012604 * np.cos(3 * t)
    )


def _lowpass(spectrum: np.ndarray, fs: int, n: int, boundary_f0: float) -> np.ndarray:
    """Filter the signal (given its rfft) with a Nuttall-window LPF whose
    main lobe passes ~boundary_f0."""
    half_len = int(round(fs / boundary_f0 / 2.0 + 0.5))
    kernel = _nuttall(half_len * 4)
    kernel = kernel / kernel.sum()
    k = np.fft.rfft(kernel, n=n)
    filtered = np.fft.irfft(spectrum * k, n=n)
    # compensate the filter group delay (linear phase, center of kernel)
    delay = len(kernel) // 2
    return np.roll(filtered, -delay)


def _event_intervals(flags: np.ndarray, signal: np.ndarray, fs: int):
    """Interval-based F0 observations from sign-change events.

    Args:
        flags: boolean array; True where an event occurs between i, i+1.
        signal: the filtered signal (for sub-sample interpolation).
    Returns (locations_sec, f0_values) arrays (possibly empty).
    """
    idx = np.nonzero(flags)[0]
    if idx.size < 2:
        return np.empty(0), np.empty(0)
    denom = signal[idx + 1] - signal[idx]
    frac = np.where(np.abs(denom) > 1e-12, -signal[idx] / denom, 0.5)
    times = (idx + np.clip(frac, 0.0, 1.0)) / fs
    intervals = np.diff(times)
    good = intervals > 1e-6
    f0 = np.where(good, 1.0 / np.maximum(intervals, 1e-6), 0.0)
    locations = (times[:-1] + times[1:]) / 2.0
    return locations[good], f0[good]


def _four_candidates(filtered: np.ndarray, fs: int, positions: np.ndarray):
    """Interpolate the four interval-based estimates to frame times."""
    x = filtered
    d = np.diff(x)
    events = [
        (x[:-1] < 0) & (x[1:] >= 0),        # rising zero crossings
        (x[:-1] >= 0) & (x[1:] < 0),        # falling zero crossings
        (d[:-1] < 0) & (d[1:] >= 0),        # dips (on derivative)
        (d[:-1] >= 0) & (d[1:] < 0),        # peaks (on derivative)
    ]
    signals = [x, -x, d, -d]
    out = np.zeros((4, positions.shape[0]))
    for j, (flags, sig) in enumerate(zip(events, signals)):
        locs, f0s = _event_intervals(flags[: len(sig) - 1], sig, fs)
        if locs.size >= 2:
            est = np.interp(positions, locs, f0s)
            inside = (positions >= locs[0]) & (positions <= locs[-1])
            out[j] = np.where(inside, est, 0.0)
    return out


def _fix_contour(
    f0: np.ndarray,
    candidates: np.ndarray,
    scores: np.ndarray,
    allowed_range: float,
    min_segment: int,
) -> np.ndarray:
    """Contour fixing: kill octave jumps, prune too-short voiced runs,
    then re-pick band candidates consistent with their neighborhood."""
    out = f0.copy()
    # step 1: relative jumps beyond allowed_range break voicing
    prev = np.concatenate([[0.0], out[:-1]])
    jump = np.abs(out - prev) > allowed_range * np.maximum(out, 1e-9)
    out = np.where(jump & (prev > 0), 0.0, out)

    # step 2: prune voiced segments shorter than min_segment frames
    voiced = out > 0
    boundaries = np.flatnonzero(np.diff(voiced.astype(np.int8)))
    starts = np.concatenate([[0], boundaries + 1])
    ends = np.concatenate([boundaries + 1, [len(out)]])
    for s, e in zip(starts, ends):
        if voiced[s] and (e - s) < min_segment:
            out[s:e] = 0.0

    # step 3: where voiced, re-pick the band candidate closest to the
    # local median (reduces residual octave errors)
    if np.any(out > 0):
        med = _running_median(out, 5)
        dist = np.abs(candidates - med[None, :])
        dist = np.where(candidates > 0, dist, np.inf)
        best = np.argmin(dist, axis=0)
        cand = candidates[best, np.arange(len(out))]
        take = (out > 0) & (cand > 0) & (
            np.abs(cand - med) < np.abs(out - med)
        )
        out = np.where(take, cand, out)
    return out


def _running_median(x: np.ndarray, width: int) -> np.ndarray:
    pad = width // 2
    padded = np.pad(x, (pad, pad), mode="edge")
    windows = np.lib.stride_tricks.sliding_window_view(padded, width)
    # median over the voiced values only would be nicer; plain median of
    # the window is adequate for re-selection guidance
    return np.median(windows, axis=1)


def dio(
    x: np.ndarray,
    fs: int,
    f0_floor: float = 80.0,
    f0_ceil: float = 400.0,
    frame_period: float = 10.0,
    channels_in_octave: float = 2.0,
    allowed_range: float = 0.1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Estimate (f0, temporal_positions); f0 == 0 marks unvoiced frames.

    API parity with pyworld.dio as used by the reference
    (voice100/vocoder.py:67-69).
    """
    x = np.asarray(x, dtype=np.float64)
    n_frames = int(len(x) / fs * 1000.0 / frame_period) + 1
    positions = np.arange(n_frames) * frame_period / 1000.0

    n_bands = int(
        np.ceil(np.log2(f0_ceil / f0_floor) * channels_in_octave)
    ) + 1
    boundary_f0s = f0_floor * 2.0 ** (
        (np.arange(n_bands) + 1) / channels_in_octave
    )

    n_fft = int(2 ** np.ceil(np.log2(len(x) + fs)))  # room for kernels
    spectrum = np.fft.rfft(x, n=n_fft)
    # low-cut below ~f0_floor/2 (WORLD's low-cut filter): DC and drift
    # would otherwise bias the zero-crossing interval candidates
    freqs = np.arange(spectrum.shape[0]) * fs / n_fft
    cutoff = f0_floor * 0.5
    rolloff = np.clip((freqs - cutoff * 0.5) / (cutoff * 0.5), 0.0, 1.0)
    spectrum = spectrum * rolloff

    all_candidates = np.zeros((n_bands, n_frames))
    all_scores = np.full((n_bands, n_frames), np.inf)
    for b, boundary in enumerate(boundary_f0s):
        filtered = _lowpass(spectrum, fs, n_fft, boundary)[: len(x)]
        four = _four_candidates(filtered, fs, positions)
        valid = (four > 0).all(axis=0)
        mean = four.mean(axis=0)
        dev = np.sqrt(((four - mean[None, :]) ** 2).mean(axis=0))
        score = np.where(mean > 0, dev / np.maximum(mean, 1e-9), np.inf)
        ok = (
            valid
            & (mean >= max(boundary / 2.0, f0_floor))
            & (mean <= min(boundary * 1.1, f0_ceil) + 1e-9)
            & (mean >= f0_floor)
        )
        all_candidates[b] = np.where(ok, mean, 0.0)
        all_scores[b] = np.where(ok, score, np.inf)

    best = np.argmin(all_scores, axis=0)
    cols = np.arange(n_frames)
    f0 = all_candidates[best, cols]
    best_score = all_scores[best, cols]
    # reject unstable candidates (interval estimates disagree)
    f0 = np.where(best_score < 0.15, f0, 0.0)

    min_segment = max(3, int(np.round(1000.0 / frame_period / f0_floor * 4)))
    f0 = _fix_contour(
        f0, all_candidates, all_scores, allowed_range, min_segment
    )
    return f0, positions
