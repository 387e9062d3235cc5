"""Band-aperiodicity estimators: ground-truth gates + cross-checks.

The quantity being modeled is pyworld.d4c's coarse band aperiodicity as
driven by voice100/vocoder.py:72 — the per-band amplitude share of the
aperiodic component. The production estimator
(``band_aperiodicity_harmonic``, the ``band_aperiodicity`` default) is
a harmonic least-squares projection whose residual IS the aperiodic
component, so unlike the heuristic detectors it can be gated against
EXACT synthetic ground truth: harmonic combs plus noise of known
per-band power, where the true band noise share is computable in
closed form. Those gates (white noise across 0-40 dB SNR and the f0
range, band-colored noise, jax/f32 backend parity) are the primary
evidence here.

Two physically independent estimators serve as cross-checks — comb
correlation at lag 1/F0 (``method="comb"``) and static group delay
(``band_aperiodicity_gd``, Morise 2016's D4C principle) — with their
mutual-agreement gates pinned from measurement on the glottal-source
family (docs/world_metrics.md).
"""

import numpy as np
import pytest

from voice100_tpu.dsp.world.aperiodicity import (
    band_aperiodicity,
    band_aperiodicity_gd,
    band_aperiodicity_harmonic,
)
from voice100_tpu.dsp.world.codec import get_num_aperiodicities

from test_world_invariants import (  # noqa: E402
    FRAME_PERIOD,
    FS,
    _glottal_speech,
    _ground_truth,
)


def _positions(n):
    return np.arange(n) * FRAME_PERIOD / 1000.0


# ----------------------------------------------------------------------
# Ground truth: harmonic comb + noise with a known band noise share.
# ----------------------------------------------------------------------

def _harmonic_plus_noise(f0_hz, snr_db, fs, seconds=1.0, seed=0,
                         band_gains=None):
    """Stationary harmonic comb + (optionally band-colored) noise.

    Returns (wav, f0_frames, positions, true_band_db) where
    ``true_band_db[b]`` is the EXACT noise-to-total power ratio of
    WORLD band b (3 kHz bands), i.e. the quantity D4C estimates.
    """
    n = int(seconds * fs)
    t = np.arange(n) / fs
    rng = np.random.RandomState(seed)
    n_harm = int((fs / 2 - 100) // f0_hz)
    sig = np.zeros(n)
    for k in range(1, n_harm + 1):
        sig += 1.0 / (1 + (k - 1) * 0.3) * np.sin(
            2 * np.pi * k * f0_hz * t + rng.rand() * 2 * np.pi
        )
    noise = rng.randn(n)
    n_bands = get_num_aperiodicities(fs)
    if band_gains is not None:
        spec = np.fft.rfft(noise)
        freqs = np.fft.rfftfreq(n, 1 / fs)
        gain = np.ones_like(freqs)
        for b in range(n_bands):
            m = (freqs >= 3000.0 * (b + 1) - 1500.0) & (
                freqs < 3000.0 * (b + 1) + 1500.0
            )
            gain[m] = band_gains[b]
        noise = np.fft.irfft(spec * gain, n)
    noise *= np.sqrt(np.mean(sig ** 2) / np.mean(noise ** 2)) * (
        10.0 ** (-snr_db / 20.0)
    )
    wav = sig + noise
    nfft = 8192
    p_sig = np.abs(np.fft.rfft(sig, nfft)) ** 2
    p_noise = np.abs(np.fft.rfft(noise, nfft)) ** 2
    df = fs / nfft
    true_db = []
    for b in range(n_bands):
        center = 3000.0 * (b + 1)
        lo, hi = int((center - 1500.0) / df), int((center + 1500.0) / df)
        e_s, e_n = p_sig[lo:hi].sum(), p_noise[lo:hi].sum()
        true_db.append(10.0 * np.log10(e_n / (e_s + e_n)))
    n_frames = int(seconds * 1000 / FRAME_PERIOD) + 1
    f0 = np.full(n_frames, f0_hz)
    return wav, f0, _positions(n_frames), np.asarray(true_db)


@pytest.mark.parametrize("f0_hz", [100.0, 220.0, 320.0])
@pytest.mark.parametrize("snr_db", [0.0, 20.0, 40.0])
def test_harmonic_estimator_matches_exact_noise_share(f0_hz, snr_db):
    """The default estimator must recover the TRUE band noise share
    within 0.5 dB across the f0 range and 0-40 dB SNR (measured worst
    case 0.25 dB; the dof correction in aperiodicity.py is what holds
    the high-SNR end — without it the estimate sits ~3 dB high)."""
    wav, f0, pos, true_db = _harmonic_plus_noise(f0_hz, snr_db, FS)
    est = band_aperiodicity(wav, f0, pos, FS)
    med = np.median(est[8:-8], axis=0)
    assert np.max(np.abs(med - true_db)) < 0.5, (
        f0_hz, snr_db, med, true_db)


def test_harmonic_estimator_band_discrimination():
    """Band-colored noise at 22.05 kHz (two WORLD bands): the
    estimator must recover each band's own noise share — moderate
    bands within 2.5 dB, and deeply-suppressed bands (true below the
    ~-38 dB harmonic-fit residual floor) may read high but NEVER more
    periodic than truth minus 0.5 dB (the conservative direction for
    the downstream voicing masks, voice100/calc_stat.py:45)."""
    fs = 22050
    gains = [0.1, 3.0]
    wav, f0, pos, true_db = _harmonic_plus_noise(
        120.0, 15.0, fs, seed=3, band_gains=gains)
    est = np.median(
        band_aperiodicity(wav, f0, pos, fs)[8:-8], axis=0)
    for b in range(len(true_db)):
        assert est[b] >= true_db[b] - 0.5, (b, est, true_db)
        if true_db[b] >= -36.0:
            assert abs(est[b] - true_db[b]) < 2.5, (b, est, true_db)
        else:
            assert est[b] <= true_db[b] + 6.0, (b, est, true_db)
    # the two bands must be separated in the right order
    assert est[0] < est[1] - 10.0, est


def test_harmonic_estimator_jax_backend_parity():
    """The on-device (f32) path must match the host (f64) path within
    0.3 dB at moderate aperiodicity levels (measured max 0.11 dB); in
    deeply-suppressed bands f32 FFT noise dominates, so both are
    clipped at -35 dB before comparing."""
    for snr_db in (10.0, 30.0):
        wav, f0, pos, _ = _harmonic_plus_noise(180.0, snr_db, FS, seed=5)
        a = band_aperiodicity_harmonic(wav, f0, pos, FS, backend="numpy")
        b = band_aperiodicity_harmonic(wav, f0, pos, FS, backend="jax")
        a, b = np.maximum(a, -35.0), np.maximum(b, -35.0)
        assert np.max(np.abs(a - b)) < 0.3, snr_db


def test_harmonic_tracks_snr_on_glottal_family():
    """On the independent glottal-source family (formant-filtered
    pulses + noise, never shaped by any estimator under test) the
    default estimator's median band aperiodicity must increase
    monotonically as SNR drops."""
    meds = []
    for snr in (30.0, 20.0, 10.0, 0.0):
        wav, f0 = _glottal_speech(snr_db=snr)
        pos = _positions(len(f0))
        meds.append(float(np.median(
            band_aperiodicity(wav, f0, pos, FS)[8:-8, 0])))
    assert meds == sorted(meds), meds


# ----------------------------------------------------------------------
# Cross-checks: two physically independent estimators agree.
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def glottal_family():
    out = {}
    for snr in (30.0, 20.0, 10.0, 0.0):
        wav, f0 = _glottal_speech(snr_db=snr)
        pos = _positions(len(f0))
        out[snr] = (
            band_aperiodicity(wav, f0, pos, FS, method="comb")[8:-8, 0],
            band_aperiodicity_gd(wav, f0, pos, FS)[8:-8, 0],
        )
    return out


def test_estimators_order_snr_identically(glottal_family):
    """Both cross-check estimators must rank the family by noisiness:
    median band aperiodicity strictly increases as SNR drops."""
    snrs = sorted(glottal_family, reverse=True)  # 30 -> 0
    comb_med = [float(np.median(glottal_family[s][0])) for s in snrs]
    gd_med = [float(np.median(glottal_family[s][1])) for s in snrs]
    assert comb_med == sorted(comb_med), comb_med
    assert gd_med == sorted(gd_med), gd_med


def test_comb_matches_group_delay_on_glottal_family(glottal_family):
    """Per-SNR median |comb - gd| gates, pinned from measurement
    (6.1 / 5.2 / 2.9 / 0.7 dB at 30/20/10/0 dB SNR): waveform
    autocorrelation and band phase coherence converge exactly where
    precision matters for the downstream codeap masks (noisy frames
    near the -0.2 dB voicing threshold) and stay within single-digit
    dB even at the fully-periodic extreme, where both are deep below
    every mask threshold anyway."""
    gates = {30.0: 8.5, 20.0: 8.0, 10.0: 4.5, 0.0: 2.0}
    for snr, (comb, gd) in glottal_family.items():
        med = float(np.median(np.abs(comb - gd)))
        assert med <= gates[snr], (snr, med)


# ----------------------------------------------------------------------
# Behavioral contracts all three estimators share.
# ----------------------------------------------------------------------

def test_all_call_synthesized_voice_strongly_periodic():
    """A re-synthesized voice with coded aperiodicity -8 dB must read
    as strongly periodic (<= -8 dB) under all estimators on voiced
    frames (the band integrates the decoded spectrum's more-periodic
    low end, so the band statistic sits below the 3 kHz anchor)."""
    from voice100_tpu.dsp.world.synthesis import synthesize

    f0, spc, ap = _ground_truth(220.0)
    wav = np.asarray(
        synthesize(f0, spc, ap, fs=FS, frame_period=FRAME_PERIOD)
    )
    pos = _positions(len(f0))
    voiced = f0 > 0
    voiced[:8] = voiced[-8:] = False
    harm = band_aperiodicity(wav, f0, pos, FS)[voiced, 0]
    comb = band_aperiodicity(wav, f0, pos, FS, method="comb")[voiced, 0]
    gd = band_aperiodicity_gd(wav, f0, pos, FS)[voiced, 0]
    for name, est in (("harmonic", harm), ("comb", comb), ("gd", gd)):
        assert float(np.median(est)) <= -8.0, (name, float(np.median(est)))


def test_all_call_noise_aperiodic():
    """White noise with forced voiced labels reads near 0 dB for all
    three — nobody hallucinates periodicity."""
    rng = np.random.RandomState(0)
    noise = rng.randn(FS).astype(np.float64)
    f0 = np.full(90, 150.0)
    pos = _positions(90)
    harm = band_aperiodicity(noise, f0, pos, FS)[5:-5, 0]
    comb = band_aperiodicity(noise, f0, pos, FS, method="comb")[5:-5, 0]
    gd = band_aperiodicity_gd(noise, f0, pos, FS)[5:-5, 0]
    assert float(np.median(harm)) >= -1.0, float(np.median(harm))
    assert float(np.median(comb)) >= -2.0, float(np.median(comb))
    assert float(np.median(gd)) >= -3.0, float(np.median(gd))


def test_unvoiced_frames_forced_fully_aperiodic():
    rng = np.random.RandomState(1)
    x = rng.randn(FS)
    f0 = np.zeros(50)
    pos = _positions(50)
    for fn in (
        band_aperiodicity,
        band_aperiodicity_gd,
        band_aperiodicity_harmonic,
    ):
        out = fn(x, f0, pos, FS)
        assert np.all(out > -1e-6), fn.__name__
