"""Masked losses for the WORLD-feature TTS models and duration model.

Parity targets: WORLDLoss v2 (voice100/models/_layers_v2.py:116-161),
WORLDLoss v1 with optional mel weighting
(voice100/models/_layers_v1.py:37-93), and the masked log-duration L1
loss (voice100/models/_align_v2.py:86-95).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..ops.mask import sequence_mask

__all__ = [
    "WORLDLossValues",
    "world_loss_v2",
    "world_loss_v1",
    "duration_loss",
    "mel_logspc_weights",
    "adjust_size",
]


def adjust_size(x: jnp.ndarray, y: jnp.ndarray):
    """Crop both tensors to the common time length
    (voice100/models/_layers_v2.py:106-113)."""
    n = min(x.shape[1], y.shape[1])
    return x[:, :n], y[:, :n]


def _bce_with_logits(logits, labels):
    # stable BCE-with-logits, elementwise (torch BCEWithLogitsLoss)
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


class WORLDLossValues(NamedTuple):
    hasf0: jnp.ndarray
    f0: jnp.ndarray
    logspc: jnp.ndarray
    hascodeap: jnp.ndarray
    codeap: jnp.ndarray


def world_loss_v2(
    length: jnp.ndarray,
    hasf0_logits: jnp.ndarray,
    f0_hat: jnp.ndarray,
    logspc_hat: jnp.ndarray,
    hascodeap_logits: jnp.ndarray,
    codeap_hat: jnp.ndarray,
    hasf0: jnp.ndarray,
    f0: jnp.ndarray,
    logspc: jnp.ndarray,
    hascodeap: jnp.ndarray,
    codeap: jnp.ndarray,
    loss: str = "mse",
) -> WORLDLossValues:
    """Per-stream masked losses (voice100/models/_layers_v2.py:135-161)."""
    err = (lambda a, b: jnp.abs(a - b)) if loss == "l1" else (
        lambda a, b: (a - b) ** 2
    )
    hasf0_logits, hasf0 = adjust_size(hasf0_logits, hasf0)
    f0_hat, f0 = adjust_size(f0_hat, f0)
    logspc_hat, logspc = adjust_size(logspc_hat, logspc)
    hascodeap_logits, hascodeap = adjust_size(hascodeap_logits, hascodeap)
    codeap_hat, codeap = adjust_size(codeap_hat, codeap)

    mask = sequence_mask(length, f0.shape[1], dtype=f0.dtype)
    mask_sum = jnp.maximum(jnp.sum(mask), 1.0)

    hasf0_loss = jnp.sum(_bce_with_logits(hasf0_logits, hasf0) * mask) / mask_sum
    f0_loss = jnp.sum(err(f0_hat, f0) * hasf0 * mask) / mask_sum
    logspc_loss = jnp.sum(
        jnp.mean(err(logspc_hat, logspc), axis=2) * mask
    ) / mask_sum
    hascodeap_loss = jnp.sum(
        jnp.mean(_bce_with_logits(hascodeap_logits, hascodeap), axis=2) * mask
    ) / mask_sum
    codeap_loss = jnp.sum(
        jnp.mean(err(codeap_hat, codeap) * hascodeap, axis=2) * mask
    ) / mask_sum
    return WORLDLossValues(
        hasf0_loss, f0_loss, logspc_loss, hascodeap_loss, codeap_loss
    )


def mel_logspc_weights(sample_rate: int, n_fft: int) -> np.ndarray:
    """Mel-scale spectral weights (voice100/models/_layers_v1.py:60-65)."""
    f = (sample_rate / n_fft) * np.arange(n_fft // 2 + 1)
    dm = 1127.0 / (700.0 + f)
    return (dm / dm.sum()).astype(np.float32)


def world_loss_v1(
    length: jnp.ndarray,
    hasf0_logits: jnp.ndarray,
    f0_hat: jnp.ndarray,
    logspc_hat: jnp.ndarray,
    codeap_hat: jnp.ndarray,
    hasf0: jnp.ndarray,
    f0: jnp.ndarray,
    logspc: jnp.ndarray,
    codeap: jnp.ndarray,
    logspc_weights: Optional[jnp.ndarray] = None,
    loss: str = "mse",
):
    """v1 loss without hascodeap, optional mel-weighted logspc
    (voice100/models/_layers_v1.py:69-93)."""
    err = (lambda a, b: jnp.abs(a - b)) if loss == "l1" else (
        lambda a, b: (a - b) ** 2
    )
    hasf0_logits, hasf0 = adjust_size(hasf0_logits, hasf0)
    f0_hat, f0 = adjust_size(f0_hat, f0)
    logspc_hat, logspc = adjust_size(logspc_hat, logspc)
    codeap_hat, codeap = adjust_size(codeap_hat, codeap)

    mask = sequence_mask(length, f0.shape[1], dtype=f0.dtype)
    mask_sum = jnp.maximum(jnp.sum(mask), 1.0)

    hasf0_loss = jnp.sum(_bce_with_logits(hasf0_logits, hasf0) * mask) / mask_sum
    f0_loss = jnp.sum(err(f0_hat, f0) * hasf0 * mask) / mask_sum
    e = err(logspc_hat, logspc)
    if logspc_weights is not None:
        logspc_loss = jnp.sum(
            jnp.sum(e * logspc_weights[None, None, :], axis=2) * mask
        ) / mask_sum
    else:
        logspc_loss = jnp.sum(jnp.mean(e, axis=2) * mask) / mask_sum
    codeap_loss = jnp.sum(
        jnp.mean(err(codeap_hat, codeap), axis=2) * mask
    ) / mask_sum
    return hasf0_loss, f0_loss, logspc_loss, codeap_loss


def duration_loss(
    pred: jnp.ndarray,
    align: jnp.ndarray,
    text: jnp.ndarray,
    text_len: jnp.ndarray,
) -> jnp.ndarray:
    """Masked L1 on log(1 + durations)
    (voice100/models/_align_v2.py:86-95).

    Args:
        pred: ``[B, L, 2]`` model outputs (log domain).
        align: ``[B, L, 2]`` target frame counts.
    """
    logalign = jnp.log1p(align.astype(pred.dtype))
    per_tok = jnp.mean(jnp.abs(logalign - pred), axis=2)  # [B, L]
    mask = sequence_mask(text_len, text.shape[1], dtype=pred.dtype)
    return jnp.sum(per_tok * mask) / jnp.maximum(jnp.sum(mask), 1.0)
