"""v2 ASR / forced-alignment model: AudioToAlignText.

Architecture parity with voice100/models/_asr_v2.py:18-49 — conv encoder
from settings (x2 time downsample), stacked biLSTM, dense projection to
the vocabulary — rebuilt as a pure flax module with masked scans instead
of packed sequences. Logits are batch-major ``[B, T, V]`` (the reference
returns time-major because of pad_packed_sequence).

Forced alignment (the reference's per-utterance NumPy loop,
_asr_v2.py:88-119) runs fully batched on-device via
``ops.ctc.ctc_viterbi_align``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.augment import batch_spectrogram_augment
from ..ops.ctc import ctc_loss, ctc_viterbi_align, ViterbiResult
from .layers import ConvStack, ConvSetting, conv_stack_output_length, BiLSTM

__all__ = ["AudioToAlignText"]


class AudioToAlignText(nn.Module):
    audio_size: int
    vocab_size: int
    encoder_settings: Sequence[ConvSetting]
    decoder_num_layers: int = 2
    decoder_hidden_size: int = 512
    learning_rate: float = 1e-3

    @nn.compact
    def __call__(
        self,
        audio: jnp.ndarray,
        audio_len: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """``[B, T, audio_size] -> ([B, T', vocab_size], [B])``."""
        x = ConvStack(settings=tuple(self.encoder_settings))(audio)
        x_len = conv_stack_output_length(self.encoder_settings, audio_len)
        x = BiLSTM(
            hidden_size=self.decoder_hidden_size,
            num_layers=self.decoder_num_layers,
            dropout=0.2,
        )(x, x_len, deterministic=deterministic)
        logits = nn.Dense(self.vocab_size)(x)
        return logits, x_len

    def compute_loss(
        self,
        audio: jnp.ndarray,
        audio_len: jnp.ndarray,
        text: jnp.ndarray,
        text_len: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """CTC training loss (reference _calc_batch_loss,
        _asr_v2.py:51-62); spectrogram augmentation in train mode."""
        if not deterministic:
            audio, audio_len = batch_spectrogram_augment(
                self.make_rng("augment"), audio, audio_len
            )
        logits, logits_len = self(audio, audio_len, deterministic=deterministic)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return ctc_loss(log_probs, text, logits_len, text_len)

    def ctc_best_path(
        self,
        audio: jnp.ndarray,
        audio_len: jnp.ndarray,
        text: jnp.ndarray,
        text_len: jnp.ndarray,
    ) -> Tuple[ViterbiResult, jnp.ndarray]:
        """Batched forced alignment; returns the Viterbi result and the
        logit lengths. Guards very short audio by capping text_len
        (reference _asr_v2.py:102)."""
        logits, logits_len = self(audio, audio_len, deterministic=True)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        text_len = jnp.minimum(logits_len, text_len)
        res = ctc_viterbi_align(log_probs, text, logits_len, text_len)
        return res, logits_len

    def greedy_decode(
        self, audio: jnp.ndarray, audio_len: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Frame-wise argmax ids (decode + merge_repeated happen in the
        tokenizer on host, as in the reference runtime flow)."""
        logits, logits_len = self(audio, audio_len, deterministic=True)
        return jnp.argmax(logits, axis=-1), logits_len
