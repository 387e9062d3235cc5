"""WORLD waveform synthesis as a batched JAX program (TPU hot path).

The reference synthesizes through pyworld's C++ synthesizer one
utterance at a time on CPU (voice100/vocoder.py:100-101). Here the same
pitch-synchronous overlap-add model runs on-device with static shapes:

* per-sample F0 is interpolated from frames; pulse positions come from
  the wrapped cumulative phase (``jnp.nonzero`` with a static capacity),
* every pulse's periodic response is the minimum-phase impulse response
  of the envelope's periodic power sqrt(sp * (1 - ap^2)), scaled by
  sqrt(period) for unit excitation power; the aperiodic component is
  white noise shaped by sqrt(sp * ap^2) over the pulse interval,
* all pulses are one batched FFT workload, overlap-added with a single
  scatter-add.

Unvoiced regions use a 200 Hz default pulse rate with a fully aperiodic
mix, matching WORLD's noise-segment placement behavior.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["synthesize", "synthesize_fn"]

_DEFAULT_F0 = 200.0  # pulse rate used to tile noise in unvoiced spans


def _min_phase_ir(log_power_half: jnp.ndarray, fft_size: int, out_fft: int):
    """Minimum-phase impulse responses from half log-power spectra.

    Args:
        log_power_half: ``[P, fft_size//2+1]`` log power.
    Returns:
        ``[P, out_fft//2+1]`` complex frequency responses of the
        min-phase IRs, zero-padded to ``out_fft`` for linear convolution.
    """
    cep = jnp.fft.irfft(0.5 * log_power_half, n=fft_size, axis=-1)
    n = fft_size
    lifter = jnp.concatenate(
        [
            jnp.ones((1,)),
            2.0 * jnp.ones((n // 2 - 1,)),
            jnp.ones((1,)),
            jnp.zeros((n // 2 - 1,)),
        ]
    )
    min_phase_spec = jnp.exp(jnp.fft.rfft(cep * lifter[None, :], axis=-1))
    ir = jnp.fft.irfft(min_phase_spec, n=fft_size, axis=-1)
    return jnp.fft.rfft(ir, n=out_fft, axis=-1)


@partial(
    jax.jit,
    static_argnames=("fs", "frame_period_ms", "fft_size", "max_pulses",
                     "out_len"),
)
def _synth_impl(
    f0: jnp.ndarray,          # [T]
    spectrogram: jnp.ndarray,  # [T, F] power envelope
    aperiodicity: jnp.ndarray,  # [T, F] amplitude ratio
    noise_key: jax.Array,
    fs: int,
    frame_period_ms: float,
    fft_size: int,
    max_pulses: int,
    out_len: int,
) -> jnp.ndarray:
    n_frames = f0.shape[0]
    hop = fs * frame_period_ms / 1000.0

    # --- per-sample F0 (linear interp between frames; default rate in
    # unvoiced spans so noise segments tile the gap)
    sample_pos = jnp.arange(out_len) / hop  # fractional frame index
    fr0 = jnp.clip(jnp.floor(sample_pos).astype(jnp.int32), 0, n_frames - 1)
    fr1 = jnp.minimum(fr0 + 1, n_frames - 1)
    w = sample_pos - fr0
    f0_a, f0_b = f0[fr0], f0[fr1]
    voiced_a, voiced_b = f0_a > 0, f0_b > 0
    f0_interp = jnp.where(
        voiced_a & voiced_b,
        f0_a * (1 - w) + f0_b * w,
        jnp.where(voiced_a, f0_a, jnp.where(voiced_b, f0_b, 0.0)),
    )
    rate = jnp.where(f0_interp > 0, f0_interp, _DEFAULT_F0)
    # clamp to the pulse-capacity assumption (see synthesize_fn)
    rate = jnp.clip(rate, 40.0, 420.0)

    # --- pulse positions from wrapped cumulative phase
    phase = jnp.cumsum(rate / fs)
    wraps = jnp.floor(phase)
    is_pulse = jnp.concatenate(
        [jnp.ones((1,), bool), (wraps[1:] - wraps[:-1]) >= 1.0]
    )
    pulse_pos = jnp.nonzero(is_pulse, size=max_pulses, fill_value=-1)[0]
    valid = pulse_pos >= 0
    safe_pos = jnp.maximum(pulse_pos, 0)

    # --- per-pulse envelope and voicing (frame interpolation)
    p_frame = safe_pos / hop
    pf0 = jnp.clip(jnp.floor(p_frame).astype(jnp.int32), 0, n_frames - 1)
    pf1 = jnp.minimum(pf0 + 1, n_frames - 1)
    pw = (p_frame - pf0)[:, None]
    sp = spectrogram[pf0] * (1 - pw) + spectrogram[pf1] * pw  # [P, F]
    ap = aperiodicity[pf0] * (1 - pw) + aperiodicity[pf1] * pw
    pulse_voiced = (rate[safe_pos] > 0) & (f0_interp[safe_pos] > 0)
    ap = jnp.where(pulse_voiced[:, None], ap, 1.0)
    ap = jnp.clip(ap, 1e-6, 1.0 - 1e-12)

    period = fs / rate[safe_pos]  # samples per period at each pulse

    out_fft = fft_size * 2
    eps = 1e-30
    # periodic part: impulse (amplitude sqrt(period)) through min-phase
    # IR of the periodic power
    periodic_power = jnp.log(sp * (1.0 - ap**2) + eps)
    h_per = _min_phase_ir(periodic_power, fft_size, out_fft)  # [P, F2]
    amp = jnp.where(pulse_voiced, jnp.sqrt(period), 0.0)
    resp_per = jnp.fft.irfft(h_per, n=out_fft, axis=-1) * amp[:, None]

    # aperiodic part: white noise over one period through min-phase IR
    # of the aperiodic power
    aperiodic_power = jnp.log(sp * ap**2 + eps)
    h_ap = _min_phase_ir(aperiodic_power, fft_size, out_fft)
    noise_len = fft_size  # capacity; mask to the actual interval
    noise = jax.random.normal(noise_key, (max_pulses, noise_len))
    seg_mask = (
        jnp.arange(noise_len)[None, :] < jnp.ceil(period)[:, None]
    )
    noise = noise * seg_mask
    noise_spec = jnp.fft.rfft(noise, n=out_fft, axis=-1)
    resp_ap = jnp.fft.irfft(noise_spec * h_ap, n=out_fft, axis=-1)

    response = (resp_per + resp_ap) * valid[:, None]

    # --- overlap-add: single scatter-add over all pulses
    idx = safe_pos[:, None] + jnp.arange(out_fft)[None, :]
    idx = jnp.where(valid[:, None], idx, out_len + out_fft)  # parked
    flat = jnp.zeros(out_len + 2 * out_fft + 1, spectrogram.dtype)
    flat = flat.at[idx.reshape(-1)].add(response.reshape(-1))
    return flat[:out_len]


def synthesize_fn(
    f0,
    spectrogram,
    aperiodicity,
    fs: int = 16000,
    frame_period: float = 10.0,
    noise_key=None,
):
    """Synthesize a waveform from WORLD features (jit-compiled).

    API parity with pyworld.synthesize as used by the reference decode
    path (voice100/vocoder.py:100-101). Returns float32 ``[samples]``
    with samples = (T-1) * hop + 1.
    """
    f0 = jnp.asarray(f0, jnp.float32)
    spectrogram = jnp.asarray(spectrogram, jnp.float32)
    aperiodicity = jnp.asarray(aperiodicity, jnp.float32)
    n_frames = f0.shape[0]
    # fractional hop (e.g. 220.5 samples at 22.05 kHz): rounding the
    # TOTAL keeps duration exact and matches the NumPy/C++ twins —
    # truncating per-frame would shorten output 0.23% at 22.05 kHz
    out_len = int(round((n_frames - 1) * fs * frame_period / 1000.0)) + 1
    fft_size = (spectrogram.shape[1] - 1) * 2
    # static pulse capacity: the densest possible pulse train
    max_rate = 420.0  # a touch above the 400 Hz f0 ceiling
    max_pulses = int(out_len / fs * max(max_rate, _DEFAULT_F0)) + 8
    if noise_key is None:
        noise_key = jax.random.PRNGKey(0)
    return _synth_impl(
        f0, spectrogram, aperiodicity, noise_key,
        fs, frame_period, fft_size, max_pulses, out_len,
    )


def synthesize(f0, spectrogram, aperiodicity, fs=16000, frame_period=10.0):
    """NumPy-friendly wrapper returning a host array."""
    return np.asarray(
        synthesize_fn(f0, spectrogram, aperiodicity, fs, frame_period)
    )
