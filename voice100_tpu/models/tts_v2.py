"""v2 TTS acoustic model: AlignTextToAudio.

Parity with voice100/models/_tts_v2.py:13-166: embedding -> stacked
biLSTM -> conv decoder (x2 time upsample via a strided transpose conv) ->
dense projection split into [hasf0, f0, logspc/mcep, hascodeap, codeap];
``predict`` unnormalizes and gates f0/codeap on the has* logits; the
loss is the 5-stream masked WORLD loss with normalized targets.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    BiLSTM,
    ConvStack,
    ConvSetting,
    conv_stack_output_length,
    WORLDNorm,
)
from .losses import world_loss_v2, WORLDLossValues

__all__ = ["AlignTextToAudio"]


class AlignTextToAudio(nn.Module):
    vocab_size: int
    logspc_size: int = 25
    codeap_size: int = 1
    encoder_num_layers: int = 2
    encoder_hidden_size: int = 512
    decoder_settings: Sequence[ConvSetting] = (
        # out_channels, transpose, kernel, stride, padding, bias
        (512, False, 5, 1, 2, False),
        (512, True, 5, 2, 2, False),
        (512, False, 5, 1, 2, False),
    )
    logspc_weight: float = 5.0
    learning_rate: float = 1e-3
    f0_size: int = 1

    @property
    def audio_size(self) -> int:
        return 2 * self.f0_size + self.logspc_size + 2 * self.codeap_size

    def setup(self) -> None:
        self.embedding = nn.Embed(self.vocab_size, self.encoder_hidden_size)
        self.lstm = BiLSTM(
            hidden_size=self.encoder_hidden_size,
            num_layers=self.encoder_num_layers,
            dropout=0.2,
        )
        self.decoder = ConvStack(settings=tuple(self.decoder_settings))
        self.projection = nn.Dense(self.audio_size)
        self.norm = WORLDNorm(self.logspc_size, self.codeap_size)

    def __call__(
        self,
        aligntext: jnp.ndarray,
        aligntext_len: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, ...]:
        """``[B, L] -> (hasf0 [B,T], f0 [B,T], logspc [B,T,S],
        hascodeap [B,T,C], codeap [B,T,C])`` with T ~= 2L."""
        self.norm.touch()  # ensure norm stats exist in init variables
        x = self.embedding(aligntext)
        x = self.lstm(x, aligntext_len, deterministic=deterministic)
        x = self.decoder(x)
        x = self.projection(x)
        f, s, c = self.f0_size, self.logspc_size, self.codeap_size
        hasf0 = x[:, :, 0]
        f0 = x[:, :, f]
        logspc = x[:, :, 2 * f:2 * f + s]
        hascodeap = x[:, :, 2 * f + s:2 * f + s + c]
        codeap = x[:, :, 2 * f + s + c:]
        return hasf0, f0, logspc, hascodeap, codeap

    def output_length(self, aligntext_len):
        return conv_stack_output_length(self.decoder_settings, aligntext_len)

    def predict(
        self, aligntext: jnp.ndarray, aligntext_len: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Unnormalized WORLD features with voicing gates
        (reference _tts_v2.py:76-88)."""
        hasf0, f0, logspc, hascodeap, codeap = self(
            aligntext, aligntext_len, deterministic=True
        )
        f0, logspc, codeap = self.norm.unnormalize(f0, logspc, codeap)
        f0 = jnp.where(hasf0 < 0, 0.0, f0)
        codeap = jnp.where(hascodeap < 0, 0.0, codeap)
        return f0, logspc, codeap

    def compute_loss(
        self,
        f0: jnp.ndarray,
        f0_len: jnp.ndarray,
        logspc: jnp.ndarray,
        codeap: jnp.ndarray,
        aligntext: jnp.ndarray,
        aligntext_len: jnp.ndarray,
        deterministic: bool = True,
    ) -> WORLDLossValues:
        """Per-stream losses (reference _tts_v2.py:90-101): voicing
        targets from raw features, regression targets normalized."""
        hasf0 = (f0 >= 30.0).astype(jnp.float32)
        hascodeap = (codeap < -0.2).astype(jnp.float32)
        f0, logspc, codeap = self.norm.normalize(f0, logspc, codeap)
        hasf0_logits, f0_hat, logspc_hat, hascodeap_logits, codeap_hat = self(
            aligntext, aligntext_len, deterministic=deterministic
        )
        return world_loss_v2(
            f0_len,
            hasf0_logits, f0_hat, logspc_hat, hascodeap_logits, codeap_hat,
            hasf0, f0, logspc, hascodeap, codeap,
        )

    @staticmethod
    def total_loss(values: WORLDLossValues, logspc_weight: float = 5.0):
        """Weighted sum (reference _tts_v2.py:103-107)."""
        return (
            values.hasf0
            + values.f0
            + values.logspc * logspc_weight
            + values.hascodeap
            + values.codeap
        )
