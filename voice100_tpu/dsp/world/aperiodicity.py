"""Band aperiodicity estimation (D4C-equivalent interface).

The reference obtains aperiodicity from pyworld's D4C
(voice100/vocoder.py:72) — the band amplitude ratio of the aperiodic
component per coarse frequency band (3 kHz spacing, WORLD's codec
convention). The default estimator here
(``band_aperiodicity_harmonic``) measures that quantity directly:
a Hanning-weighted least-squares projection of each analysis frame
onto its harmonic comb ``k*f0`` splits the frame into periodic fit +
residual, and each band's aperiodicity is the residual-to-total band
power ratio. For a harmonic+noise frame this equals the true per-band
noise share in expectation, so the estimator is gated against exact
synthetic ground truth across SNRs, f0s, and band-colored noise
(tests/test_world_aperiodicity.py) rather than against heuristics.

Two physically independent estimators serve as cross-checks:
normalized comb correlation at lag 1/F0 (``method="comb"``) and the
power-weighted circular resultant of the per-bin group delay
(``band_aperiodicity_gd``).

Provenance note: this module deliberately does NOT claim to implement
the published D4C algorithm (Morise 2016). Round 5 rebuilt the
published static-group-delay statistic stage by stage against the
exact ground-truth harness (tools/d4c_analysis.py,
docs/d4c_analysis.md): it DOES discriminate (the round-3 "flat
response" was that reconstruction's bug, most plausibly the missing
dual ±T0/4 centroid or an over-wide trend removal), but it carries a
~3 dB aperiodic bias below ~25 dB SNR and compresses above ~30 dB,
while the harmonic least-squares estimator here stays within 0.25 dB
of truth everywhere — so it remains the default. The pyworld
agreement suite (tests/test_parity_optional.py) remains dependency-
gated for environments that have pyworld. The output contract (coarse
bands in dB, full [T, fft//2+1] spectrum decoded from them, dB range
[-60, 0]) matches what the reference pipeline consumes.
"""

from __future__ import annotations

import numpy as np

from .codec import decode_aperiodicity, get_num_aperiodicities

__all__ = [
    "band_aperiodicity",
    "band_aperiodicity_harmonic",
    "d4c",
]

_FREQ_INTERVAL = 3000.0
_FLOOR_DB = -60.0
_SAFE_MIN = 1e-12
_F0_FLOOR_D4C = 47.0

_TLS = None  # lazy threading.local holding the basis arena


def _basis_arena(count: int, dtype=np.float32) -> np.ndarray:
    """A reused scratch of at least ``count`` elements of ``dtype``.

    Thread-local (loader workers analyze concurrently) and grow-only:
    the first clip of a prep run pays the allocation page faults, every
    later clip fills already-mapped memory at memcpy speed."""
    global _TLS
    if _TLS is None:
        import threading

        _TLS = threading.local()
    nbytes = count * np.dtype(dtype).itemsize
    buf = getattr(_TLS, "buf", None)
    if buf is None or buf.nbytes < nbytes:
        buf = np.empty(nbytes, np.uint8)
        _TLS.buf = buf
    return buf[:nbytes].view(dtype)


def band_aperiodicity(
    x: np.ndarray,
    f0: np.ndarray,
    positions: np.ndarray,
    fs: int,
    backend: str = "numpy",
    method: str = "harmonic",
) -> np.ndarray:
    """Coarse aperiodicity in dB, ``[T, n_bands]`` (bands at 3k, 6k..).

    ``method="harmonic"`` (default) is the harmonic least-squares
    noise-share estimator; ``method="comb"`` is the comb-correlation
    cross-check. ``backend="jax"`` runs the batched matmul/FFT
    workload on-device (jit-compiled per padded frame count)."""
    if method == "harmonic":
        return band_aperiodicity_harmonic(x, f0, positions, fs,
                                          backend=backend)
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


# ----------------------------------------------------------------------
# Harmonic-projection estimator: exact band noise share by construction.
# ----------------------------------------------------------------------

def band_aperiodicity_harmonic(
    x: np.ndarray,
    f0: np.ndarray,
    positions: np.ndarray,
    fs: int,
    backend: str = "numpy",
    n_periods: float = 4.0,
) -> np.ndarray:
    """Coarse aperiodicity in dB via harmonic least squares, ``[T, B]``.

    Per frame, a Hanning-weighted least-squares fit projects the
    windowed waveform onto the harmonic comb ``k*f0`` (all harmonics at
    once, DC included); the residual IS the aperiodic component, and
    each 3 kHz band's aperiodicity is the residual-to-total band power
    ratio of the windowed spectra. Unlike heuristic detectors this is
    exact in expectation for harmonic+noise frames — on synthetic
    ground truth the estimate tracks the true per-band noise share
    across SNRs (gated in tests/test_world_aperiodicity.py).

    Batched over frames: projection and reconstruction are
    ``[T, W, P]``-shaped contractions (MXU-shaped under
    ``backend="jax"``, BLAS on the host path) with per-frame
    harmonic-count masking, so utterances with any f0 contour share
    one static program; the normal equations reduce to their diagonal
    because the windowed harmonics are near-orthogonal (see inline
    note), with a closed-form degrees-of-freedom correction making the
    noise-share estimate unbiased.
    """
    f0 = np.asarray(f0, np.float64)
    positions = np.asarray(positions, np.float64)
    if backend == "jax":
        return np.asarray(
            _harmonic_jax(
                np.asarray(x, np.float32), f0.astype(np.float32),
                positions.astype(np.float32), fs, float(n_periods),
            )
        )
    return _harmonic_fft_impl(
        np.asarray(x, np.float64), f0, positions, fs,
        float(n_periods),
    )


def _cubic_sample(Z, pos_bins, nmax, dtype=np.float32):
    """Sample a half-spectrum at fractional bins: 4-point Lagrange."""
    i0 = np.clip(pos_bins.astype(np.int64), 1, nmax - 3)
    t = (pos_bins - i0).astype(dtype)
    zm1 = np.take_along_axis(Z, i0 - 1, axis=1)
    z0 = np.take_along_axis(Z, i0, axis=1)
    z1 = np.take_along_axis(Z, i0 + 1, axis=1)
    z2 = np.take_along_axis(Z, i0 + 2, axis=1)
    wm1 = -t * (t - 1.0) * (t - 2.0) / 6.0
    w0 = (t + 1.0) * (t - 1.0) * (t - 2.0) / 2.0
    w1 = -(t + 1.0) * t * (t - 2.0) / 2.0
    w2 = (t + 1.0) * t * (t - 1.0) / 6.0
    return zm1 * wm1 + z0 * w0 + z1 * w1 + z2 * w2


def _cubic_scatter(vals, pos_bins, T, nbins, dtype=np.float32):
    """Adjoint of :func:`_cubic_sample`: spread complex ``vals`` at
    fractional bins (4 Lagrange taps) into a ``[T, nbins]`` spectrum.
    Harmonic bins are >= f0*nfft/fs apart (dozens of bins at 8x
    oversampling), far beyond the 4-tap stencil, so no two writes
    collide and plain fancy-index assignment replaces the (slow,
    unbuffered) ``np.add.at``."""
    spec = np.zeros((T, nbins), np.complex64)
    i0 = np.clip(pos_bins.astype(np.int64), 1, nbins - 3)
    t = (pos_bins - i0).astype(dtype)
    taps = (
        (-1, -t * (t - 1.0) * (t - 2.0) / 6.0),
        (0, (t + 1.0) * (t - 1.0) * (t - 2.0) / 2.0),
        (1, -(t + 1.0) * t * (t - 2.0) / 2.0),
        (2, (t + 1.0) * t * (t - 1.0) / 6.0),
    )
    rows = np.broadcast_to(np.arange(T)[:, None], pos_bins.shape)
    for off, wj in taps:
        spec[rows, i0 + off] = vals * wj
    return spec


def _harmonic_fft_impl(x, f0, positions, fs, n_periods,
                       oversample=8):
    """Host-path harmonic solve in O(T * W log W) — round-5 verdict
    item 7 (the basis-materializing solve bound corpus prep at
    ~10 audio-s/s/core; this path measures 2-4x that with identical
    ground-truth accuracy).

    Mathematically the same diagonal least squares as
    :func:`_harmonic_impl`, restated so no ``[P, T, W]`` basis is ever
    built:

    * the projection rhs ``sum_w h_k w^2 seg`` for ALL harmonics of a
      frame is the w^2-weighted segment's DFT sampled at ``k*f0`` —
      one zero-padded rFFT per frame plus a cubic interpolation at the
      harmonic frequencies;
    * the Gram diagonal is analytic AND exact: the Hanning^2 weight's
      transform vanishes at ``2 k f0`` (its cosine components sit at
      ``m/(4 T0)`` for ``m <= 2`` while ``2 k f0 = 8k/(4 T0)``), so
      both column norms are ``sum(w^2)/2`` up to O(1/W^2)
      discretization;
    * the fitted waveform is reconstructed by the adjoint: coefficient
      spikes cubic-spread onto the oversampled grid, ONE irFFT, then a
      window multiply — and the residual is EXPLICIT, so every
      interpolation error perturbs the band energies only
      quadratically (through ``|fit_err|^2`` and a noise cross-term),
      unlike an energy-subtraction scheme where it would enter
      linearly (measured: subtraction floored at -27 dB; this path
      matches the basis solve's 0.37 dB worst-case exactly).

    The ground-truth gates (tests/test_world_aperiodicity.py) are the
    equality contract with the previous implementation; the jax
    backend keeps the basis formulation (MXU matmuls are the right
    shape on device).
    """
    dtype = np.float32
    tiny = 1e-18
    n_bands = get_num_aperiodicities(fs)
    T = positions.shape[0]

    eff = np.where(f0 > 0, np.maximum(f0, _F0_FLOOR_D4C), 200.0)
    eff = eff.astype(dtype)
    floor = float(np.min(eff))
    half = int(n_periods / 2.0 * fs / floor) + 1
    offsets = np.arange(-half, half + 1)
    W = offsets.shape[0]
    centers = np.round(positions * fs).astype(np.int32)
    idx = np.clip(centers[:, None] + offsets[None, :], 0, x.shape[0] - 1)
    seg = x[idx].astype(dtype)
    tloc = (offsets / fs).astype(dtype)
    u = tloc[None, :] * eff[:, None] / (n_periods / 2.0)
    w = np.where(
        np.abs(u) <= 1.0, 0.5 + 0.5 * np.cos(np.pi * u), 0.0
    ).astype(dtype)

    y = seg * w
    w2 = w * w
    z = seg * w2
    sw2 = w2.sum(axis=1)

    K = int((fs / 2.0) / floor)
    k = np.arange(1, K + 1)
    fk = eff[:, None] * k[None, :]
    valid = fk < (fs / 2.0 - 50.0)

    nfft_os = 1
    while nfft_os < oversample * W:
        nfft_os *= 2
    Zz = np.fft.rfft(z, n=nfft_os, axis=1)
    scale = nfft_os / fs
    Fk = _cubic_sample(Zz, fk * scale, nfft_os // 2)
    Fk = Fk * np.exp(
        (2j * np.pi * half / fs) * fk.astype(np.float64)
    ).astype(np.complex64)

    norm = 0.5 * sw2[:, None]
    cc = np.where(valid, Fk.real / (norm + tiny), 0.0)
    cs = np.where(valid, -Fk.imag / (norm + tiny), 0.0)

    a = (cc - 1j * cs).astype(np.complex64)
    a = a * np.exp(
        (-2j * np.pi * half / fs) * fk.astype(np.float64)
    ).astype(np.complex64)
    spec = _cubic_scatter(
        0.5 * nfft_os * a, fk * scale, T, nfft_os // 2 + 1
    )
    fit_unw = np.fft.irfft(spec, n=nfft_os, axis=1)[:, :W]
    resid = y - fit_unw * w

    nfft = 1
    while nfft < W:
        nfft *= 2
    spec_r = np.fft.rfft(resid, n=nfft, axis=1)
    spec_y = np.fft.rfft(y, n=nfft, axis=1)
    p_r = spec_r.real ** 2 + spec_r.imag ** 2
    p_y = spec_y.real ** 2 + spec_y.imag ** 2
    df = fs / float(nfft)
    dof_keep = 1.0 - 35.0 / (18.0 * n_periods)
    cols = []
    for band in range(n_bands):
        center = _FREQ_INTERVAL * (band + 1)
        lo = int((center - _FREQ_INTERVAL / 2) / df)
        hi = int((center + _FREQ_INTERVAL / 2) / df)
        e_r = p_r[:, lo:hi].sum(axis=1)
        e_y = p_y[:, lo:hi].sum(axis=1)
        ratio = np.clip(
            e_r / (e_y + tiny) / dof_keep, _SAFE_MIN, 1.0
        )
        cols.append(10.0 * np.log10(ratio))
    coded = np.stack(cols, axis=1)
    aperiodic_db = 20.0 * np.log10(1.0 - _SAFE_MIN)
    voiced = f0 > 0
    return np.where(
        voiced[:, None],
        np.clip(coded, _FLOOR_DB, 0.0),
        np.asarray(aperiodic_db, dtype),
    )


def _harmonic_jax(x, f0, positions, fs, n_periods):
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(
        jax.jit, static_argnames=("fs", "n_periods")
    )
    def impl(x, f0, positions, fs, n_periods):
        return _harmonic_impl(x, f0, positions, fs, jnp, n_periods)

    return impl(x, f0, positions, fs, n_periods)


def _harmonic_impl(x, f0, positions, fs, xp, n_periods):
    n_bands = get_num_aperiodicities(fs)
    T = positions.shape[0]
    host = xp is np
    # f32 on both paths: the solve is bandwidth-bound on the host (the
    # basis is hundreds of MB for a 10 s clip) and every accumulated
    # quantity is a length-W windowed sum of O(1) values, so f32 noise
    # is ~1e-6 relative -> ~1e-5 dB on the band ratios, far inside the
    # ground-truth gates. f64 host solves measured 2x slower, same
    # test margins.
    dtype = np.float32
    tiny = 1e-18

    eff = xp.where(f0 > 0, xp.maximum(f0, _F0_FLOOR_D4C), 200.0)
    eff = eff.astype(dtype)
    if host:
        # trim the static window/harmonic extents to this utterance's
        # actual f0 range (the jax path keeps the f0-floor extents so
        # the compiled program is utterance-independent)
        floor = float(np.min(eff))
    else:
        floor = _F0_FLOOR_D4C
    half = int(n_periods / 2.0 * fs / floor) + 1
    offsets = np.arange(-half, half + 1)
    W = offsets.shape[0]
    centers = xp.round(positions * fs).astype(xp.int32)
    idx = xp.clip(centers[:, None] + offsets[None, :], 0, x.shape[0] - 1)
    seg = x[idx].astype(dtype)                       # [T, W]
    tloc = (offsets / fs).astype(dtype)              # [W] seconds
    u = tloc[None, :] * eff[:, None] / (n_periods / 2.0)
    w = xp.where(
        xp.abs(u) <= 1.0, 0.5 + 0.5 * xp.cos(np.pi * u), 0.0
    ).astype(dtype)

    K = int((fs / 2.0) / floor)                      # max harmonics
    P = 2 * K + 1
    k = np.arange(1, K + 1)
    fk = eff[:, None] * k[None, :]                   # [T, K]
    valid = (fk < fs / 2.0 - 50.0).astype(dtype)
    # Harmonic basis cos/sin(2 pi k f0 t) by the angle-addition
    # recurrence from the fundamental alone, filled into ONE
    # preallocated contiguous [T, P, W] array. Both choices matter on
    # the host: the recurrence replaces ~36M transcendental calls per
    # 4 s clip with 4 multiply-adds per element (drift ~K*eps), and
    # the [T, P, W] layout keeps every slice write a contiguous run —
    # the previous stack/concatenate along a trailing harmonics axis
    # interleaved 53-stride writes and cost 4.8 s of a 5.0 s call.
    ang1 = ((2.0 * np.pi) * eff[:, None] * tloc[None, :]).astype(dtype)
    c1, s1 = xp.cos(ang1), xp.sin(ang1)              # [T, W]
    if xp is np:
        # [P, T, W] so every harmonic's write is one contiguous run,
        # filled into a reused thread-local arena: a fresh np.empty
        # pays ~0.5 s of first-touch page faults per 4 s clip, while
        # the arena faults once per prep process. The super-Nyquist
        # mask and the window fold INTO the fill writes (out=), so the
        # basis is traversed exactly once on build — two extra full
        # passes at these sizes are ~50% of the whole solve.
        basis = _basis_arena(P * T * W, dtype).reshape(P, T, W)
        tmp = np.empty((T, W), dtype)
        basis[0] = w  # DC column, window folded
        ck, sk = c1, s1
        np.multiply(ck, w, out=tmp)
        np.multiply(tmp, valid[:, 0][:, None], out=basis[1])
        np.multiply(sk, w, out=tmp)
        np.multiply(tmp, valid[:, 0][:, None], out=basis[1 + K])
        for i in range(1, K):
            ck, sk = ck * c1 - sk * s1, sk * c1 + ck * s1
            vi = valid[:, i][:, None]
            np.multiply(ck, w, out=tmp)
            np.multiply(tmp, vi, out=basis[1 + i])
            np.multiply(sk, w, out=tmp)
            np.multiply(tmp, vi, out=basis[1 + K + i])
    else:
        cos_ks, sin_ks = [c1], [s1]
        for _ in range(K - 1):
            ck, sk = cos_ks[-1], sin_ks[-1]
            cos_ks.append(ck * c1 - sk * s1)
            sin_ks.append(sk * c1 + ck * s1)
        valid_pk = xp.concatenate(
            [xp.ones((T, 1), dtype), valid, valid], axis=1
        )                                            # [T, P]
        basis = xp.concatenate(
            [
                xp.ones((1, T, W), dtype),
                xp.stack(cos_ks, axis=0),
                xp.stack(sin_ks, axis=0),
            ],
            axis=0,
        ) * valid_pk.T[:, :, None] * w[None, :, :]   # [P, T, W]
    y = seg * w
    # Diagonal normal equations: the harmonic columns are mutually
    # near-orthogonal under the window (a 4-period Hanning's mainlobe
    # width equals the f0 spacing), so the Gram matrix is essentially
    # diag(column norms). Solving with the diagonal alone matches the
    # full solve within ~0.2 dB on the ground-truth gates while
    # cutting the cost from O(T*W*P^2) to O(T*W*P); masked-out
    # harmonic columns have zero norm and zero rhs -> coefficient 0.
    rhs = xp.einsum("ptw,tw->tp", basis, y)
    colnorm = xp.einsum("ptw,ptw->tp", basis, basis)
    coef = rhs / (colnorm + tiny)
    resid = y - xp.einsum("tp,ptw->tw", coef, basis)

    nfft = 1
    while nfft < W:
        nfft *= 2
    spec_r = xp.fft.rfft(resid, n=nfft, axis=1)
    spec_y = xp.fft.rfft(y, n=nfft, axis=1)
    p_r = (spec_r.real ** 2 + spec_r.imag ** 2)
    p_y = (spec_y.real ** 2 + spec_y.imag ** 2)
    df = fs / float(nfft)
    # degrees-of-freedom correction: the projection absorbs part of the
    # band NOISE into the harmonic fit. For white noise under a Hanning
    # window spanning n_periods periods, each harmonic's (cos, sin)
    # pair removes sigma^2 * sum(w^4)/sum(w^2) of energy, and the band
    # holds one harmonic per f0 of width — the removed band-noise
    # fraction works out to 35/(18*n_periods), independent of f0
    # (Hanning moments: sum w^2 = 3L/8, sum w^4 = 35L/128). Dividing
    # the residual share by (1 - that) makes the estimator unbiased;
    # the synthetic-SNR gates in tests/test_world_aperiodicity.py hold
    # to ~0.3 dB with this correction and sit ~3 dB low without it.
    dof_keep = 1.0 - 35.0 / (18.0 * n_periods)
    cols = []
    for band in range(n_bands):
        center = _FREQ_INTERVAL * (band + 1)
        lo = int((center - _FREQ_INTERVAL / 2) / df)
        hi = int((center + _FREQ_INTERVAL / 2) / df)
        e_r = p_r[:, lo:hi].sum(axis=1)
        e_y = p_y[:, lo:hi].sum(axis=1)
        ratio = xp.clip(
            e_r / (e_y + tiny) / dof_keep, _SAFE_MIN, 1.0
        )
        cols.append(10.0 * xp.log10(ratio))
    coded = xp.stack(cols, axis=1)
    aperiodic_db = 20.0 * np.log10(1.0 - _SAFE_MIN)
    voiced = f0 > 0
    return xp.where(
        voiced[:, None],
        xp.clip(coded, _FLOOR_DB, 0.0),
        xp.asarray(aperiodic_db, dtype),
    )



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
