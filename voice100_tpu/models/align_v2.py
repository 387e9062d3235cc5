"""v2 TTS duration model: TextToAlignText.

Parity with voice100/models/_align_v2.py:13-116: embedding -> stacked
biLSTM -> dense(2) predicting per-token log(1 + frames) pairs; masked L1
loss; ``predict`` returns exp(y) - 1; duration expansion is the
vectorized on-device ``ops.duration`` instead of a Python loop.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.duration import expand_alignment_batch
from .layers import BiLSTM
from .losses import duration_loss

__all__ = ["TextToAlignText"]


class TextToAlignText(nn.Module):
    vocab_size: int
    num_layers: int = 2
    hidden_size: int = 256
    num_outputs: int = 2
    learning_rate: float = 1e-3

    @nn.compact
    def __call__(
        self,
        text: jnp.ndarray,
        text_len: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """``[B, L] -> [B, L, 2]`` log-duration predictions."""
        x = nn.Embed(self.vocab_size, self.hidden_size)(text)
        x = BiLSTM(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            dropout=0.2,
        )(x, text_len, deterministic=deterministic)
        return nn.Dense(self.num_outputs)(x)

    def predict(
        self, text: jnp.ndarray, text_len: jnp.ndarray
    ) -> jnp.ndarray:
        """Durations in frames (reference _align_v2.py:39-46)."""
        y = self(text, text_len, deterministic=True)
        return jnp.exp(y) - 1.0

    def align(
        self,
        text: jnp.ndarray,
        align: jnp.ndarray,
        text_len: jnp.ndarray,
        out_len: int,
        head: int = 5,
        tail: int = 5,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Expand a batch of texts by predicted durations
        (reference _align_v2.py:48-75, vectorized)."""
        return expand_alignment_batch(
            text, align, text_len, out_len, head=head, tail=tail
        )

    def compute_loss(
        self,
        text: jnp.ndarray,
        text_len: jnp.ndarray,
        align: jnp.ndarray,
        align_len: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Masked L1 on log(1+durations) (reference _align_v2.py:86-95).

        ``align`` arrives flat ``[B, 2L(+1)]`` from the align-text files;
        the trailing odd slot is dropped and pairs are reshaped, exactly
        like the reference.
        """
        batch = align.shape[0]
        usable = (align.shape[1] - 1) // 2 * 2
        pairs = align[:, :usable].reshape(batch, -1, 2)
        pred = self(text, text_len, deterministic=deterministic)
        pairs_len = align_len // 2
        del pairs_len  # masking is by text_len, as in the reference
        n = min(pred.shape[1], pairs.shape[1])
        return duration_loss(
            pred[:, :n], pairs[:, :n], text[:, :n], text_len
        )
