"""WORLD vocoder tests on synthetic signals.

No pyworld exists in this environment, so correctness is established by
construction: known-F0 synthetic voices, known spectral envelopes, codec
round trips, and full analysis->synthesis->re-analysis consistency.
"""

import numpy as np
import pytest

FS = 16000


def synth_voice(f0_hz: float, seconds: float = 0.6, fs: int = FS,
                formants=((700, 0.1), (1200, 0.07), (2600, 0.05))):
    """Impulse train through a toy formant filter: a known-F0 'voice'."""
    n = int(seconds * fs)
    t = np.arange(n)
    phase = np.cumsum(np.full(n, f0_hz / fs))
    pulses = np.zeros(n)
    pulses[np.searchsorted(phase, np.arange(1, int(phase[-1])))] = 1.0
    out = np.zeros(n)
    for freq, bw in formants:
        r = np.exp(-np.pi * bw * freq / fs * 2)
        theta = 2 * np.pi * freq / fs
        b, a1, a2 = 1.0, -2 * r * np.cos(theta), r * r
        y = np.zeros(n + 2)
        for i in range(n):
            y[i + 2] = pulses[i] - a1 * y[i + 1] - a2 * y[i]
        out += y[2:]
    return (out / np.abs(out).max() * 0.5).astype(np.float64)


def test_dio_recovers_f0_voiced():
    from voice100_tpu.dsp.world import dio

    for true_f0 in (120.0, 180.0, 250.0):
        x = synth_voice(true_f0)
        f0, pos = dio(x, FS)
        assert f0.shape == pos.shape
        mid = f0[10:-10]
        voiced = mid[mid > 0]
        assert voiced.size > 0.5 * mid.size, f"{true_f0}: mostly unvoiced"
        rel_err = np.abs(np.median(voiced) - true_f0) / true_f0
        assert rel_err < 0.05, (true_f0, np.median(voiced))


def test_dio_noise_is_unvoiced():
    from voice100_tpu.dsp.world import dio

    rng = np.random.RandomState(0)
    x = rng.randn(FS // 2) * 0.3
    f0, _ = dio(x, FS)
    assert (f0 > 0).mean() < 0.35


def test_cheaptrick_envelope_tracks_formants():
    from voice100_tpu.dsp.world import dio, cheaptrick

    x = synth_voice(150.0)
    f0, pos = dio(x, FS)
    env = cheaptrick(x, f0, pos, FS, 512)
    assert env.shape == (f0.shape[0], 257)
    assert np.isfinite(env).all()
    assert (env > 0).all()
    freqs = np.arange(257) * FS / 512
    mean_env = env[10:-10].mean(axis=0)
    # energy near the 700 Hz formant well above energy near 6 kHz
    near = mean_env[(freqs > 500) & (freqs < 900)].mean()
    far = mean_env[(freqs > 5500) & (freqs < 7000)].mean()
    assert near > 20 * far


def test_aperiodicity_tone_vs_noise():
    from voice100_tpu.dsp.world import dio, band_aperiodicity

    x = synth_voice(150.0)
    f0, pos = dio(x, FS)
    ap_voice = band_aperiodicity(x, f0, pos, FS)
    assert ap_voice.shape[1] == 1  # one band at 16 kHz

    rng = np.random.RandomState(0)
    noise = rng.randn(len(x)) * 0.3
    f0n, posn = dio(noise, FS)
    ap_noise = band_aperiodicity(noise, f0n, posn, FS)
    # unvoiced frames are ~0 dB aperiodic
    assert np.median(ap_noise) > -1.0
    # voiced frames of the harmonic voice are much more periodic
    voiced = f0[10:-10] > 0
    assert np.median(ap_voice[10:-10][voiced]) < -6.0


def test_codec_roundtrip():
    from voice100_tpu.dsp.world import (
        code_aperiodicity, decode_aperiodicity, get_num_aperiodicities,
    )

    assert get_num_aperiodicities(16000) == 1
    assert get_num_aperiodicities(22050) == 2

    coded = np.asarray([[-30.0], [-5.0], [-59.0]])
    ap = decode_aperiodicity(coded, 16000, 512)
    assert ap.shape == (3, 257)
    assert np.all(ap > 0) and np.all(ap <= 1.0)
    recoded = code_aperiodicity(ap, 16000)
    np.testing.assert_allclose(recoded, coded, atol=0.5)


def test_synthesis_roundtrip():
    """analyze -> synthesize -> re-analyze: F0 and envelope survive."""
    from voice100_tpu.dsp.world import WORLDVocoder, dio

    x = synth_voice(160.0, seconds=0.8)
    voc = WORLDVocoder(sample_rate=FS)
    f0, logspc, codeap = voc.encode(x)
    assert logspc.shape[1] == 257
    assert codeap.shape[1] == 1

    y = voc.decode(f0, logspc, codeap)
    expected_len = (len(f0) - 1) * 160 + 1
    assert y.shape[0] == expected_len
    assert np.isfinite(y).all()

    # energy in the same ballpark (no silent or exploding output)
    rms_in = np.sqrt((x[: len(y)] ** 2).mean())
    rms_out = np.sqrt((y ** 2).mean())
    assert 0.2 * rms_in < rms_out < 5.0 * rms_in, (rms_in, rms_out)

    # pitch of the synthesized audio matches
    f0_out, _ = dio(np.asarray(y, np.float64), FS)
    voiced_in = f0[8:-8][f0[8:-8] > 0]
    voiced_out = f0_out[8:-8][f0_out[8:-8] > 0]
    assert voiced_out.size > 0.5 * voiced_in.size
    assert abs(np.median(voiced_out) - np.median(voiced_in)) < 8.0


def test_vocoder_mcep_mode():
    from voice100_tpu.dsp.world import WORLDVocoder

    x = synth_voice(140.0, seconds=0.4)
    voc = WORLDVocoder(sample_rate=FS, use_mcep=True)
    assert voc.output_dims == (1, 25, 1)
    f0, mcep, codeap = voc.encode(x)
    assert mcep.shape[1] == 25
    y = voc.decode(f0, mcep, codeap)
    assert np.isfinite(y).all()
    assert np.sqrt((y ** 2).mean()) > 1e-4


def test_decode_batch_matches_single():
    """Batched on-device decode ~ per-utterance decode (same features,
    noise realization differs => compare framewise energy envelopes)."""
    from voice100_tpu.dsp.world import WORLDVocoder

    x = synth_voice(150.0, seconds=0.5)
    voc = WORLDVocoder(sample_rate=FS)
    f0, logspc, codeap = voc.encode(x)
    single = voc.decode(f0, logspc, codeap)
    batch = voc.decode_batch(
        f0[None], logspc[None], codeap[None],
        np.asarray([len(f0)]),
    )
    assert batch.shape[0] == 1
    n = min(len(single), batch.shape[1])

    def env(w):
        m = w[: n - n % 160].reshape(-1, 160)
        return np.sqrt((m**2).mean(axis=1))

    e1, e2 = env(single), env(batch[0])
    # voiced-region envelopes agree within a few percent
    mask = e1 > 0.1 * e1.max()
    ratio = e2[mask] / e1[mask]
    assert np.median(np.abs(ratio - 1.0)) < 0.25


def test_cheaptrick_jax_backend_matches_numpy():
    from voice100_tpu.dsp.world import dio, cheaptrick

    x = synth_voice(150.0, seconds=0.4)
    f0, pos = dio(x, FS)
    ref = cheaptrick(x, f0, pos, FS, 512)
    dev = cheaptrick(x, f0, pos, FS, 512, backend="jax")
    assert dev.shape == ref.shape
    # f32 device vs f64 host: compare in log domain over bins that
    # carry real energy (near-silent edge frames sit at the eps floor)
    err = np.abs(np.log(dev + 1e-12) - np.log(ref + 1e-12))
    significant = ref > 1e-6 * ref.max()
    assert np.median(err) < 0.01, float(np.median(err))
    assert err[significant].max() < 0.5, float(err[significant].max())


def test_aperiodicity_jax_backend_matches_numpy():
    from voice100_tpu.dsp.world import dio, band_aperiodicity

    x = synth_voice(150.0, seconds=0.4)
    f0, pos = dio(x, FS)
    ref = band_aperiodicity(x, f0, pos, FS)
    dev = band_aperiodicity(x, f0, pos, FS, backend="jax")
    assert dev.shape == ref.shape
    # dB-domain agreement on voiced frames (f32 vs f64)
    voiced = f0 > 0
    assert np.median(np.abs(dev[voiced] - ref[voiced])) < 0.5


def test_vocoder_jax_analysis_backend():
    from voice100_tpu.dsp.world import WORLDVocoder

    x = synth_voice(140.0, seconds=0.4)
    ref = WORLDVocoder(sample_rate=FS).encode(x)
    dev = WORLDVocoder(sample_rate=FS, analysis_backend="jax").encode(x)
    # the jax backend tracks F0 with the on-device YIN estimator
    # (dio_jax), not host DIO: require agreement, not equality
    ref_v, dev_v = ref[0] > 0, dev[0] > 0
    assert np.mean(ref_v == dev_v) > 0.9
    both = ref_v & dev_v
    assert np.all(np.abs(dev[0][both] - ref[0][both]) / ref[0][both] < 0.03)
    # envelopes agree in log domain over energetic bins (the small F0
    # differences perturb the adaptive window slightly)
    mask = ref[1] > ref[1].max() - 20  # within 20 nats of peak
    assert np.median(np.abs(dev[1][mask] - ref[1][mask])) < 0.2
