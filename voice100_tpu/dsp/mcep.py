"""Mel-cepstrum transform matrices (SPTK-compatible freqt).

The reference builds PySPTK-compatible sp2mc/mc2sp linear maps with a
double-loop frequency-warping recursion (voice100/vocoder.py:105-141).
Since both directions are linear maps, they are materialized once as
matrices here too — built by the same all-pass warping recurrence —
and applied on-device as single matmuls (MXU) per batch.

sp2mc: log-spectrum [.., n_fft//2+1] @ sp2mc -> mel-cepstrum [.., order+1]
mc2sp: mel-cepstrum @ mc2sp -> log-spectrum
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

__all__ = ["freqt_matrix", "create_sp2mc_matrix", "create_mc2sp_matrix"]


def freqt_matrix(in_order: int, out_order: int, alpha: float) -> np.ndarray:
    """Matrix form of the SPTK ``freqt`` all-pass frequency warp.

    Returns ``A [in_order+1, out_order+1]`` such that
    ``warped = ceps @ A`` equals ``freqt(ceps, out_order, alpha)`` for
    row-vector cepstra. Built by running the recurrence on unit vectors
    (the recurrence is linear in the input cepstrum).
    """
    eye = np.eye(in_order + 1)
    return _freqt_apply(eye, out_order, alpha)


def _freqt_apply(ceps: np.ndarray, order: int, alpha: float) -> np.ndarray:
    """Run the freqt recurrence on a batch of row cepstra.

    Matches pysptk.freqt semantics (see voice100/vocoder.py:126-141):
    coefficients are consumed from the highest index down, and each step
    applies the all-pass lattice update.
    """
    rows, width = ceps.shape
    c = np.zeros((rows, order + 1))
    one_minus_a2 = 1.0 - alpha * alpha
    for i in range(width):
        d = alpha * c
        d[:, 0] += ceps[:, width - 1 - i]
        if order >= 1:
            d[:, 1] += one_minus_a2 * c[:, 0]
        for j in range(2, order + 1):
            d[:, j] += c[:, j - 1] - alpha * d[:, j - 1]
        c = d
    return c


@lru_cache(maxsize=8)
def _matrices(fftlen: int, order: int, alpha: float):
    n_freq = fftlen // 2 + 1
    # sp2mc: irfft of each unit log-spectrum row -> halve c0 -> warp
    c = np.fft.irfft(np.eye(n_freq))  # [n_freq, fftlen]
    c[:, 0] /= 2.0
    sp2mc = _freqt_apply(c, order, alpha)
    # mc2sp: unwarp unit mel-cepstra -> double c0 -> mirror -> rfft.real
    u = _freqt_apply(np.eye(order + 1), fftlen // 2, -alpha)
    u[:, 0] *= 2.0
    full = np.concatenate([u, u[:, :0:-1]], axis=1)
    mc2sp = np.fft.rfft(full).real
    return sp2mc, mc2sp


def create_sp2mc_matrix(fftlen: int, order: int, alpha: float) -> np.ndarray:
    """``[n_fft//2+1, order+1]`` log-spectrum -> mel-cepstrum map
    (parity with voice100/vocoder.py:105-112)."""
    return _matrices(fftlen, order, alpha)[0]


def create_mc2sp_matrix(fftlen: int, order: int, alpha: float) -> np.ndarray:
    """``[order+1, n_fft//2+1]`` mel-cepstrum -> log-spectrum map
    (parity with voice100/vocoder.py:115-123)."""
    return _matrices(fftlen, order, alpha)[1]
