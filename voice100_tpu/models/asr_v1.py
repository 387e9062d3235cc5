"""v1 ASR model: AudioToTextCTC (deprecated family).

Parity with voice100/models/asr.py:27-196: a MobileNetV2-style stack of
nine 1-D inverted residual blocks (expand x4, depthwise kernels 11..83,
stride 2 on the first block) followed by a 1x1 conv decoder; CTC loss;
optional per-utterance masked mean/std normalization.

BatchNorm uses flax's ``batch_stats`` collection; like the reference's
BatchNorm1d, statistics include padding positions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.augment import batch_spectrogram_augment
from ..ops.ctc import ctc_loss
from ..ops.mask import sequence_mask

__all__ = ["AudioToTextCTC", "InvertedResidual", "ConvBNActivate"]


class ConvBNActivate(nn.Module):
    """Conv1d + BatchNorm + ReLU6 (voice100/models/asr.py:27-37)."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True):
        padding = ((self.kernel_size - 1) // 2) * self.dilation
        x = nn.Conv(
            features=self.out_channels,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(padding, padding)],
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            use_bias=False,
        )(x)
        x = nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=0.9,
            epsilon=1e-5,
        )(x)
        return jnp.clip(x, 0.0, 6.0)


class InvertedResidual(nn.Module):
    """Pointwise expand -> depthwise -> pointwise-linear with optional
    residual (voice100/models/asr.py:40-59)."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    expand_ratio: int = 4
    use_residual: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True):
        in_channels = x.shape[-1]
        hidden = in_channels * self.expand_ratio
        y = ConvBNActivate(hidden, kernel_size=1)(x, use_running_average)
        y = ConvBNActivate(
            hidden,
            kernel_size=self.kernel_size,
            stride=self.stride,
            groups=hidden,
        )(y, use_running_average)
        y = nn.Conv(
            features=self.out_channels, kernel_size=(1,), use_bias=False
        )(y)
        y = nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=0.9,
            epsilon=1e-5,
        )(y)
        if self.use_residual:
            return x + y
        return y


class ConvVoiceEncoder(nn.Module):
    """Nine inverted-residual blocks (voice100/models/asr.py:62-82)."""

    out_channels: int
    hidden_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True):
        half = self.hidden_size // 2
        specs = [
            (half, 11, 2, False),
            (half, 19, 1, True),
            (half, 27, 1, True),
            (half, 35, 1, True),
            (self.hidden_size, 51, 1, False),
            (self.hidden_size, 59, 1, True),
            (self.hidden_size, 67, 1, True),
            (self.hidden_size, 75, 1, True),
            (self.out_channels, 83, 1, False),
        ]
        for out_ch, k, s, res in specs:
            x = InvertedResidual(
                out_channels=out_ch,
                kernel_size=k,
                stride=s,
                use_residual=res,
            )(x, use_running_average)
        return x

    @staticmethod
    def output_length(length):
        return (length + 1) // 2


class AudioToTextCTC(nn.Module):
    audio_size: int
    vocab_size: int
    embed_size: int = 512
    hidden_size: int = 512
    learning_rate: float = 1e-3
    weight_decay: float = 4e-5
    do_normalize: bool = False

    @nn.compact
    def __call__(
        self,
        audio: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """``[B, T, audio_size] -> [B, (T+1)//2, vocab_size]``."""
        x = ConvVoiceEncoder(
            out_channels=self.embed_size, hidden_size=self.hidden_size
        )(audio, use_running_average=deterministic)
        x = nn.Dropout(0.2, deterministic=deterministic)(x)
        return nn.Conv(features=self.vocab_size, kernel_size=(1,))(x)

    def output_length(self, audio_len):
        return ConvVoiceEncoder.output_length(audio_len)

    def normalize(self, audio, audio_len):
        """Masked per-utterance mean/std (voice100/models/asr.py:124-131)."""
        mask = sequence_mask(audio_len, audio.shape[1], audio.dtype)[:, :, None]
        denom = jnp.sum(mask, axis=1, keepdims=True)
        mean = jnp.sum(audio * mask, axis=1, keepdims=True) / denom
        audio = (audio - mean) * mask
        std = jnp.sqrt(jnp.sum(audio**2, axis=1, keepdims=True) / denom)
        return audio / (std + 1e-15) * mask

    def compute_loss(
        self,
        audio: jnp.ndarray,
        audio_len: jnp.ndarray,
        text: jnp.ndarray,
        text_len: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if not deterministic:
            audio, audio_len = batch_spectrogram_augment(
                self.make_rng("augment"), audio, audio_len
            )
        if self.do_normalize:
            audio = self.normalize(audio, audio_len)
        logits = self(audio, deterministic=deterministic)
        logits_len = self.output_length(audio_len)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return ctc_loss(log_probs, text, logits_len, text_len)
