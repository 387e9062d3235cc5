"""WORLD analysis->synthesis->re-analysis invariant metrics.

No pyworld exists in this environment, so numerical parity against it
is unverifiable; these tests replace that claim with measurable
invariants on synthetic multi-pitch stimuli (the honest version of
BASELINE.md's WORLD target). Ground-truth (f0, envelope, aperiodicity)
features are synthesized to a waveform with this framework's WORLD
synthesizer, then re-analyzed with DIO/CheapTrick/D4C-band; the
recovered features must stay within the thresholds pinned here and
documented in docs/world_metrics.md.

Reference behavior being modeled: pyworld dio/cheaptrick/d4c as driven
by voice100/vocoder.py:61-102.
"""

import numpy as np
import pytest

from voice100_tpu.dsp.world import WORLDVocoder
from voice100_tpu.dsp.world.synthesis import synthesize
from voice100_tpu.dsp.world.aperiodicity import decode_aperiodicity

FS = 16000
FRAME_PERIOD = 10.0
N_FFT = 512


def _formant_envelope(n_frames: int, formants=(500.0, 1500.0, 2500.0)):
    """A static vowel-like spectral envelope [T, n_fft/2+1] (linear)."""
    freqs = np.arange(N_FFT // 2 + 1) * FS / N_FFT
    env = np.full_like(freqs, 1e-7)
    for k, fc in enumerate(formants):
        env = env + (0.5 ** k) * np.exp(-0.5 * ((freqs - fc) / 180.0) ** 2)
    env = env / env.max()
    return np.tile(env[None, :], (n_frames, 1))


def _ground_truth(pitch: float, seconds: float = 1.2, vibrato: float = 0.02):
    """(f0, spc, ap) with a voiced-unvoiced-voiced structure."""
    n_frames = int(seconds * 1000 / FRAME_PERIOD) + 1
    t = np.arange(n_frames) * FRAME_PERIOD / 1000.0
    f0 = pitch * (1.0 + vibrato * np.sin(2 * np.pi * 4.0 * t))
    third = n_frames // 3
    f0[third:third + third // 2] = 0.0  # unvoiced gap
    spc = _formant_envelope(n_frames)
    codeap = np.where(f0 > 0, -8.0, -0.01)[:, None]
    ap = decode_aperiodicity(codeap, FS, N_FFT)
    return f0, spc, ap


def _analyze(wav, backend="numpy"):
    vocoder = WORLDVocoder(sample_rate=FS, frame_period=FRAME_PERIOD,
                           analysis_backend=backend)
    f0, logspc, codeap = vocoder.encode(wav)
    return f0.astype(np.float64), logspc, codeap


def _metrics(pitch: float, backend: str = "numpy"):
    f0_true, spc_true, ap_true = _ground_truth(pitch)
    wav = synthesize(f0_true, spc_true, ap_true, fs=FS,
                     frame_period=FRAME_PERIOD)
    f0_est, logspc_est, _ = _analyze(np.asarray(wav), backend)

    n = min(len(f0_true), len(f0_est))
    f0_true, f0_est = f0_true[:n], f0_est[:n]
    # exclude +-3 frames around voicing boundaries and the edges (all
    # trackers smear there; WORLD itself does too)
    voiced_true = f0_true > 0
    guard = np.ones(n, bool)
    edges = np.flatnonzero(np.diff(voiced_true.astype(np.int8)))
    for e in edges:
        guard[max(0, e - 3):e + 4] = False
    guard[:5] = guard[-5:] = False

    both = voiced_true & (f0_est > 0) & guard
    rel_err = np.abs(f0_est[both] - f0_true[both]) / f0_true[both]
    f0_rmse_rel = float(np.sqrt(np.mean(rel_err ** 2)))
    voicing_acc = float(
        np.mean((f0_est > 0)[guard] == voiced_true[guard])
    )
    # octave errors: fraction of voiced frames off by >20%
    octave_rate = float(np.mean(rel_err > 0.2)) if both.any() else 1.0

    # spectral convergence on commonly-voiced frames (dB RMSE of the
    # log envelope over 100 Hz..5 kHz, mean-level normalized)
    lo, hi = int(100 * N_FFT / FS), int(5000 * N_FFT / FS)
    log_true = np.log(spc_true[:n, lo:hi] + 1e-15)
    log_est = logspc_est[:n, lo:hi].astype(np.float64)
    log_true = log_true - log_true.mean(axis=1, keepdims=True)
    log_est = log_est - log_est.mean(axis=1, keepdims=True)
    sc_db = float(
        np.sqrt(np.mean((log_true[both] - log_est[both]) ** 2))
        * 20.0 / np.log(10.0)
    )
    # floored log-spectral distortion: both envelopes clamped at
    # 45 dB below the per-frame peak before comparing — standard LSD
    # practice, and the honest dynamic range here: deeper detail is
    # below the stimulus' own aperiodic noise floor and is dominated by
    # analysis-window sidelobe leakage that the published CheapTrick
    # shares (docs/world_metrics.md has the decomposition; a
    # lower-leakage Blackman window measured WORSE end-to-end)
    floor = log_true.max(axis=1, keepdims=True) - 45.0 * np.log(10) / 20
    err_f = (np.maximum(log_est, floor) - np.maximum(log_true, floor))
    lsd45_db = float(
        np.sqrt(np.mean(err_f[both] ** 2)) * 20.0 / np.log(10.0)
    )
    return {
        "pitch": pitch,
        "f0_rmse_rel": f0_rmse_rel,
        "voicing_acc": voicing_acc,
        "octave_rate": octave_rate,
        "envelope_rmse_db": sc_db,
        "envelope_lsd45_db": lsd45_db,
        "n_voiced": int(both.sum()),
    }


@pytest.mark.parametrize("backend", ["numpy", "jax"])
@pytest.mark.parametrize("pitch", [110.0, 160.0, 220.0, 320.0])
def test_world_reanalysis_invariants(pitch, backend):
    """Thresholds documented in docs/world_metrics.md; the on-device
    (JAX) analysis backend — YIN F0 + batched CheapTrick/aperiodicity —
    must meet the same bars as the host path."""
    m = _metrics(pitch, backend)
    assert m["n_voiced"] > 30
    assert m["f0_rmse_rel"] < 0.01, m
    assert m["octave_rate"] < 0.01, m
    assert m["voicing_acc"] > 0.97, m
    # full-range gate leaves 0.1 dB headroom over the measured worst
    # case (5.90 dB at 320 Hz) so regressions can't hide under it
    assert m["envelope_rmse_db"] < 6.0, m
    # and the perceptually-meaningful gate: 45 dB-floored LSD under
    # 5 dB at every pitch (measured 1.1-3.4 dB)
    assert m["envelope_lsd45_db"] < 5.0, m


def test_dio_no_octave_jumps_within_vibrato():
    """A clean vibrato tone must produce a continuous contour: the
    frame-to-frame relative step stays under 5% (FixStep1 semantics)."""
    from voice100_tpu.dsp.world.dio import dio

    t = np.arange(int(1.0 * FS)) / FS
    f_inst = 200.0 * (1.0 + 0.03 * np.sin(2 * np.pi * 5.0 * t))
    phase = 2 * np.pi * np.cumsum(f_inst) / FS
    wav = np.sin(phase) + 0.3 * np.sin(2 * phase) + 0.1 * np.sin(3 * phase)
    f0, _ = dio(wav, FS)
    voiced = f0[10:-10]
    voiced = voiced[voiced > 0]
    assert len(voiced) > 50
    steps = np.abs(np.diff(voiced)) / voiced[:-1]
    assert float(steps.max()) < 0.05
    assert abs(np.median(voiced) - 200.0) / 200.0 < 0.02


def test_dio_jax_noise_is_unvoiced():
    from voice100_tpu.dsp.world.dio_jax import dio_jax

    rng = np.random.RandomState(0)
    noise = rng.randn(FS).astype(np.float64) * 0.3
    f0, _ = dio_jax(noise, FS)
    assert np.mean(f0 > 0) < 0.2


@pytest.mark.parametrize("use_mcep", [False, True])
def test_22khz_round_trip_preserves_frame_count(use_mcep):
    """At 22.05 kHz the hop is fractional (220.5 samples): synthesis
    must round the TOTAL length, not truncate per frame, or re-analysis
    loses a frame and durations drift 0.23% (the reference's second
    WORLD configuration, voice100/vocoder.py:34-39)."""
    fs = 22050
    t = np.arange(int(0.6 * fs)) / fs
    f_inst = 180.0 * (1.0 + 0.02 * np.sin(2 * np.pi * 4.0 * t))
    wav = np.sin(2 * np.pi * np.cumsum(f_inst) / fs)
    wav += 0.3 * np.sin(4 * np.pi * np.cumsum(f_inst) / fs)

    v = WORLDVocoder(sample_rate=fs, use_mcep=use_mcep)
    f0, feat, codeap = v.encode(wav)
    out = np.asarray(v.decode(f0, feat, codeap))
    assert out.shape[0] == int(round((len(f0) - 1) * fs * 0.01)) + 1
    f0b, _, _ = v.encode(out.astype(np.float64))
    assert len(f0b) == len(f0)
    both = (f0 > 0) & (f0b > 0)
    rel = np.abs(f0b[both] - f0[both]) / f0[both]
    assert float(np.sqrt(np.mean(rel ** 2))) < 0.03
    assert float(np.mean((f0 > 0) == (f0b > 0))) > 0.95


def _glottal_speech(f0_start=120.0, f0_end=300.0, seconds=1.2,
                    formants=(600.0, 1200.0, 2600.0), snr_db=20.0):
    """Speech-like stimulus: glottal impulse train with an F0 glide,
    filtered by a cascade of formant resonators, plus noise. Unlike the
    resynthesized-WORLD stimuli above, this signal was never shaped by
    the synthesizer under test, so F0 tracking is exercised on an
    independent speech-like source. Returns (wav, f0_per_frame)."""
    n = int(seconds * FS)
    t = np.arange(n) / FS
    f_inst = f0_start + (f0_end - f0_start) * t / seconds
    phase = np.cumsum(f_inst) / FS
    # impulse at every phase wrap (glottal closure instants)
    pulses = np.zeros(n)
    pulses[np.flatnonzero(np.diff(np.floor(phase)) > 0) + 1] = 1.0
    # cascade of 2nd-order resonators (biquad recurrences)
    wav = pulses
    for fc, bw in zip(formants, (90.0, 110.0, 170.0)):
        r = np.exp(-np.pi * bw / FS)
        a1 = 2 * r * np.cos(2 * np.pi * fc / FS)
        a2 = -r * r
        out = np.zeros(n)
        y1 = y2 = 0.0
        for i in range(n):
            y = wav[i] + a1 * y1 + a2 * y2
            out[i] = y
            y2, y1 = y1, y
        wav = out
    wav = wav / np.abs(wav).max()
    rng = np.random.RandomState(7)
    noise = rng.randn(n)
    noise *= np.sqrt(np.mean(wav ** 2) / np.mean(noise ** 2)) * (
        10.0 ** (-snr_db / 20.0)
    )
    wav = wav + noise
    n_frames = int(seconds * 1000 / FRAME_PERIOD) + 1
    f0_frames = np.interp(
        np.arange(n_frames) * FRAME_PERIOD / 1000.0, t, f_inst
    )
    return wav, f0_frames


@pytest.mark.parametrize("backend", ["numpy", "jax"])
def test_f0_tracking_on_glottal_source(backend):
    """F0 glide 120->300 Hz on a glottal-pulse source the synthesizer
    never touched: the tracker must follow without octave errors. This
    models the real-speech risk (octave flips silently poisoning TTS
    training data) that pure re-synthesis invariants can't see."""
    wav, f0_true = _glottal_speech()
    f0_est, _, _ = _analyze(wav, backend)
    n = min(len(f0_true), len(f0_est))
    f0_true, f0_est = f0_true[:n], f0_est[:n]
    interior = np.zeros(n, bool)
    interior[8:-8] = True
    voiced = interior & (f0_est > 0)
    # the whole stimulus is voiced: the tracker must not drop much
    assert float(voiced.sum()) / interior.sum() > 0.9, (
        backend, float(voiced.sum()) / interior.sum())
    rel = np.abs(f0_est[voiced] - f0_true[voiced]) / f0_true[voiced]
    assert float(np.sqrt(np.mean(rel ** 2))) < 0.03, (
        backend, float(np.sqrt(np.mean(rel ** 2))))
    assert float(np.mean(rel > 0.2)) < 0.02, (
        backend, float(np.mean(rel > 0.2)))  # octave errors
