"""On-device batch spectrogram augmentation.

Re-implements the reference BatchSpectrogramAugumentation
(voice100/audio.py:17-108) as a single jit-friendly JAX program:

* every transform is applied with probability 0.2 via a ``where``-select
  (both branches are cheap elementwise/gather work that XLA fuses), so
  the compiled graph is static,
* time stretching keeps the padded length fixed (the sequence shrinks or
  grows within the existing padding capacity instead of reallocating,
  so shapes never change under jit); content beyond the stretched
  length is re-masked by the final mix/mask stage exactly like the
  reference,
* randomness comes from an explicit PRNG key; like the reference
  (python ``random`` per batch), draw parameters are shared across the
  batch.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["batch_spectrogram_augment", "AUGMENT_RATE", "BLANK_AUDIO"]

AUGMENT_RATE = 0.2  # reference voice100/audio.py:13
LOG_OFFSET = 1e-6
BLANK_AUDIO = math.log(LOG_OFFSET)


def _uniform(key, lo, hi, shape=()):
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


def batch_spectrogram_augment(
    key: jax.Array,
    audio: jnp.ndarray,
    audio_len: jnp.ndarray,
    do_timestretch: bool = True,
    log_offset: float = LOG_OFFSET,
):
    """Augment ``[B, T, D]`` log-mel batches; returns (audio, audio_len)."""
    assert audio.ndim == 3
    batch, time, dim = audio.shape
    keys = jax.random.split(key, 16)
    blank = math.log(log_offset)

    def coin(k):
        return jax.random.uniform(k) < AUGMENT_RATE

    # --- timestretch (audio.py:52-58): resample the time axis in place.
    if do_timestretch:
        rate = jax.random.randint(keys[1], (), 50, 150)
        src = jnp.arange(time) * 100 // rate
        stretched = jnp.take(audio, jnp.clip(src, 0, time - 1), axis=1)
        new_len = jnp.minimum(audio_len * rate // 100, time).astype(audio_len.dtype)
        apply = coin(keys[0])
        audio = jnp.where(apply, stretched, audio)
        audio_len = jnp.where(apply, new_len, audio_len)

    # --- pitchshift (audio.py:60-64): squeeze the mel axis.
    rate = 1.0 + _uniform(keys[3], 0.0, 0.2)
    src = jnp.clip((jnp.arange(dim) * rate).astype(jnp.int32), 0, dim - 1)
    audio = jnp.where(coin(keys[2]), jnp.take(audio, src, axis=2), audio)

    # --- ampshift (audio.py:66-68)
    amp = 1.0 + _uniform(keys[5], 0.0, 3.0)
    audio = jnp.where(coin(keys[4]), audio - amp, audio)

    # --- timemask (audio.py:70-80): up to 3 short bands of the time axis.
    n_masks = jax.random.randint(keys[7], (), 1, 4)
    t_idx = jnp.arange(time)
    tm = audio
    for m in range(3):
        k_pos, k_hw, k_val = jax.random.split(jax.random.fold_in(keys[8], m), 3)
        center = jax.random.randint(k_pos, (), 0, time)
        hw = jax.random.randint(k_hw, (), 1, 4)
        val = _uniform(k_val, -blank, -5.0)
        band = (t_idx >= center - hw) & (t_idx < center + hw) & (m < n_masks)
        tm = jnp.where(band[None, :, None], val, tm)
    audio = jnp.where(coin(keys[6]), tm, audio)

    # --- freqmask (audio.py:82-90)
    f_idx = jnp.arange(dim)
    center = jax.random.randint(keys[10], (), 0, dim)
    hw = jax.random.randint(keys[11], (), 1, 11)
    val = _uniform(keys[12], -blank, -5.0)
    band = (f_idx >= center - hw) & (f_idx < center + hw)
    audio = jnp.where(
        coin(keys[9]), jnp.where(band[None, None, :], val, audio), audio
    )

    # --- mixnoise (audio.py:92-98)
    k_lo, k_hi, k_std, k_noise = jax.random.split(keys[13], 4)
    low = -5.0 + 5.0 * jax.random.uniform(k_lo)
    high = -5.0 + 5.0 * jax.random.uniform(k_hi)
    std = 5.0 * jax.random.uniform(k_std)
    scale = jnp.linspace(low, high, dim)[None, None, :]
    noise = jax.random.uniform(k_noise, audio.shape) * std + scale
    mixed = jnp.log(
        jnp.clip(jnp.exp(audio) + jnp.exp(noise), min=log_offset)
    )
    audio = jnp.where(coin(keys[14]), mixed, audio)

    # --- mixaudio / maskaudio (audio.py:100-108): exactly one of the two
    # always runs, re-masking padding to the blank level.
    mask = (
        jnp.arange(time)[None, :, None] < audio_len[:, None, None]
    ).astype(audio.dtype)
    x = jnp.exp(audio) * mask
    rolled = jnp.roll(x, shift=-1, axis=0)
    mixed = jnp.log(jnp.clip((0.9 * x + 0.1 * rolled) * mask, min=log_offset))
    masked = jnp.log(jnp.clip(x, min=log_offset))
    audio = jnp.where(coin(keys[15]), mixed, masked)

    return audio, audio_len
