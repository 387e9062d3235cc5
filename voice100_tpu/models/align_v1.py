"""v1 forced aligner: AudioAlignCTC (deprecated family).

Parity with voice100/models/align.py:69-180: Conv1d(k=3, s=2) + ReLU ->
stacked biLSTM(128) -> dense -> CTC; batched Viterbi alignment on-device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.augment import batch_spectrogram_augment
from ..ops.ctc import ctc_loss, ctc_viterbi_align, ViterbiResult
from .layers import BiLSTM

__all__ = ["AudioAlignCTC"]


class AudioAlignCTC(nn.Module):
    audio_size: int
    vocab_size: int
    hidden_size: int = 128
    num_layers: int = 2
    learning_rate: float = 1e-3

    @nn.compact
    def __call__(
        self,
        audio: jnp.ndarray,
        audio_len: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = nn.Conv(
            features=self.hidden_size,
            kernel_size=(3,),
            strides=(2,),
            padding=[(1, 1)],
        )(audio)
        x = jax.nn.relu(x)
        x_len = (audio_len + 1) // 2
        x = BiLSTM(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            dropout=0.2,
        )(x, x_len, deterministic=deterministic)
        return nn.Dense(self.vocab_size)(x), x_len

    def compute_loss(
        self, audio, audio_len, text, text_len, deterministic: bool = True
    ) -> jnp.ndarray:
        if not deterministic:
            audio, audio_len = batch_spectrogram_augment(
                self.make_rng("augment"), audio, audio_len
            )
        logits, logits_len = self(audio, audio_len, deterministic=deterministic)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return ctc_loss(log_probs, text, logits_len, text_len)

    def ctc_best_path(
        self, audio, audio_len, text, text_len
    ) -> Tuple[ViterbiResult, jnp.ndarray]:
        logits, logits_len = self(audio, audio_len, deterministic=True)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        text_len = jnp.minimum(logits_len, text_len)
        return ctc_viterbi_align(log_probs, text, logits_len, text_len), logits_len
