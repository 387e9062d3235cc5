"""On-device F0 estimation (batched JAX, YIN/CMNDF family).

The host DIO (dio.py) is event-interval based — accurate but built on
data-dependent loops that do not map to XLA. This module provides the
on-device alternative used by ``WORLDVocoder(analysis_backend="jax")``:
a fully vectorized cumulative-mean-normalized difference function
(YIN) over framed audio with parabolic sub-sample refinement and a
median-filtered voicing-consistent contour. All shapes are static; the
whole estimator is one jittable program, so corpus F0 warming can run
on TPU alongside the CheapTrick/aperiodicity backends.

Output contract matches ``dio.dio``: (f0 [T], positions [T]) with
f0 == 0 on unvoiced frames, frames every ``frame_period`` ms.
Accuracy is pinned by the same analysis->synthesis->re-analysis
invariants as the host path (tests/test_world_invariants.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dio_jax", "yin_f0"]


@functools.partial(
    jax.jit,
    static_argnames=(
        "fs", "f0_floor", "f0_ceil", "frame_period", "n_frames",
        "threshold",
    ),
)
def yin_f0(
    x: jnp.ndarray,
    fs: int,
    f0_floor: float = 80.0,
    f0_ceil: float = 400.0,
    frame_period: float = 10.0,
    n_frames: int = 0,
    threshold: float = 0.15,
) -> jnp.ndarray:
    """Framed CMNDF F0 track; 0 where unvoiced. ``n_frames`` static."""
    x = x.astype(jnp.float32)
    # fractional hop: truncating to an integer would drift the analyzed
    # frame centers away from the reported positions at rates where
    # fs * frame_period is not integral (e.g. 22050 Hz)
    hop_f = fs * frame_period / 1000.0
    tau_min = max(int(fs / f0_ceil) - 1, 2)
    tau_max = int(np.ceil(fs / f0_floor)) + 1
    window = 2 * tau_max

    # frame extraction (centered): pad both sides so every frame is
    # full (padding bounded by the window, not the signal length)
    pad = window
    xp = jnp.pad(x, (pad, 2 * window))
    starts = (
        jnp.round(jnp.arange(n_frames) * hop_f).astype(jnp.int32)
        + pad - tau_max
    )
    idx = starts[:, None] + jnp.arange(window)[None, :]
    frames = xp[idx]  # [T, W]
    # remove per-frame DC (low-cut): drift biases the difference fn
    frames = frames - jnp.mean(frames, axis=1, keepdims=True)

    # difference function d[tau] = sum_{j<N} (x_j - x_{j+tau})^2 with
    # N = tau_max, tau in [0, tau_max], via the O(W log W) identity
    # d = P0 + P_tau - 2*xcorr (the direct [T, K, N] tensor would be
    # ~1 GB for a minute of audio)
    taus = jnp.arange(tau_max + 1)
    a = frames[:, :tau_max]  # [T, N]
    p0 = jnp.sum(a * a, axis=1, keepdims=True)  # [T, 1]
    csq = jnp.concatenate(
        [jnp.zeros((n_frames, 1), frames.dtype),
         jnp.cumsum(frames * frames, axis=1)], axis=1,
    )  # [T, W+1]
    p_tau = csq[:, taus + tau_max] - csq[:, taus]  # [T, K]
    fft_len = 4 * tau_max  # >= N + tau_max: no circular wrap
    fa = jnp.fft.rfft(a, n=fft_len, axis=1)
    fb = jnp.fft.rfft(frames, n=fft_len, axis=1)
    xcorr = jnp.fft.irfft(jnp.conj(fa) * fb, n=fft_len, axis=1)
    diff = jnp.maximum(
        p0 + p_tau - 2.0 * xcorr[:, : tau_max + 1], 0.0
    )  # [T, K]

    # cumulative mean normalized difference
    cumsum = jnp.cumsum(diff[:, 1:], axis=1)
    cmndf = jnp.concatenate(
        [
            jnp.ones((n_frames, 1), diff.dtype),
            diff[:, 1:] * taus[1:][None, :] / jnp.maximum(cumsum, 1e-9),
        ],
        axis=1,
    )  # [T, K]

    # classic YIN selection, vectorized: the FIRST local minimum below
    # the threshold within the search band (a global argmin would pick
    # subharmonics — tau at 2x the period scores as low as the period)
    band = (taus >= tau_min) & (taus <= tau_max - 1)
    banded = jnp.where(band[None, :], cmndf, jnp.inf)
    prev = jnp.pad(banded, ((0, 0), (1, 0)),
                   constant_values=jnp.inf)[:, :-1]
    nxt = jnp.pad(banded, ((0, 0), (0, 1)),
                  constant_values=jnp.inf)[:, 1:]
    is_local_min = (banded <= prev) & (banded <= nxt)
    candidate = is_local_min & (banded < threshold)
    has_candidate = jnp.any(candidate, axis=1)
    first_candidate = jnp.argmax(candidate, axis=1)
    global_min = jnp.argmin(banded, axis=1)
    tau_star = jnp.where(has_candidate, first_candidate, global_min)
    d_min = jnp.take_along_axis(banded, tau_star[:, None], axis=1)[:, 0]

    # parabolic sub-sample interpolation around the minimum
    t0 = jnp.clip(tau_star - 1, 0, tau_max)
    t2 = jnp.clip(tau_star + 1, 0, tau_max)
    y0 = jnp.take_along_axis(cmndf, t0[:, None], axis=1)[:, 0]
    y1 = d_min
    y2 = jnp.take_along_axis(cmndf, t2[:, None], axis=1)[:, 0]
    denom = y0 - 2 * y1 + y2
    shift = jnp.where(
        jnp.abs(denom) > 1e-9, 0.5 * (y0 - y2) / denom, 0.0
    )
    tau_ref = tau_star + jnp.clip(shift, -1.0, 1.0)

    f0 = fs / jnp.maximum(tau_ref, 1.0)
    voiced = (d_min < threshold) & (f0 >= f0_floor) & (f0 <= f0_ceil)
    return jnp.where(voiced, f0, 0.0)


def _median3(f0: jnp.ndarray) -> jnp.ndarray:
    a = jnp.pad(f0, (1, 1), mode="edge")
    stack = jnp.stack([a[:-2], a[1:-1], a[2:]], axis=0)
    return jnp.median(stack, axis=0)


def dio_jax(
    x,
    fs: int,
    f0_floor: float = 80.0,
    f0_ceil: float = 400.0,
    frame_period: float = 10.0,
):
    """Drop-in on-device counterpart of ``dio.dio``.

    Median-filters the raw YIN track (kills isolated octave/voicing
    flips) and zeroes frames whose neighbors are both unvoiced.
    """
    x = jnp.asarray(x)
    n_frames = int(len(x) / fs * 1000.0 / frame_period) + 1
    f0 = yin_f0(
        x, fs, f0_floor=f0_floor, f0_ceil=f0_ceil,
        frame_period=frame_period, n_frames=n_frames,
    )
    f0 = _median3(f0)
    # a voiced frame surrounded by unvoiced frames is noise
    v = f0 > 0
    vp = jnp.pad(v, (1, 1))
    isolated = v & ~vp[:-2] & ~vp[2:]
    f0 = jnp.where(isolated, 0.0, f0)
    positions = np.arange(n_frames) * frame_period / 1000.0
    return np.asarray(f0, np.float64), positions
