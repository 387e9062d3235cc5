"""Length-mask utilities.

The reference relies on cuDNN packed sequences
(pack_padded_sequence, voice100/models/_asr_v2.py:46). On TPU everything
is static-shape + masks: these helpers produce the masks that replace
packing throughout the framework.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["sequence_mask", "masked_mean"]


def sequence_mask(lengths: jnp.ndarray, max_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """``[B, T]`` mask with 1 where ``t < lengths[b]``.

    Equivalent to the reference generate_padding_mask
    (voice100/models/_layers_v2.py:16-26).
    """
    t = jnp.arange(max_length, dtype=lengths.dtype)
    return (t[None, :] < lengths[:, None]).astype(dtype)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of ``x`` over positions where ``mask`` is 1.

    ``mask`` must broadcast against ``x``; the denominator is the mask sum
    (matching the reference's masked loss reductions,
    voice100/models/_layers_v2.py:155-160).
    """
    mask = jnp.broadcast_to(mask, x.shape)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)
