"""v1 TTS models (deprecated family).

Parity with voice100/models/tts.py: TextToAlignTextModel (embedding +
4 inverted residuals + 1x1 conv, voice100/models/tts.py:67-149),
AlignTextToAudioModel (embedding + VoiceDecoder, tts.py:152-262), and
AlignTextToAudioMultiTaskModel (shared trunk + WORLD and phone heads,
tts.py:265-383). The multi-task model is constructible here — the
reference's current tree has a ctor bug (tts.py:284 passes a kwarg its
WORLDLoss doesn't accept); this rebuild fixes it and documents the
divergence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.mask import sequence_mask
from .asr_v1 import InvertedResidual
from .layers import WORLDNorm
from .losses import world_loss_v1, mel_logspc_weights, duration_loss

__all__ = [
    "TextToAlignTextModel",
    "AlignTextToAudioModel",
    "AlignTextToAudioMultiTaskModel",
    "VoiceDecoder",
]


class VoiceDecoder(nn.Module):
    """Inverted-residual decoder with x2 transpose-conv upsample
    (voice100/models/tts.py:13-29)."""

    hidden_size: int
    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True):
        half = self.hidden_size // 2
        for k in (65, 33, 17, 11):
            x = InvertedResidual(self.hidden_size, kernel_size=k)(
                x, use_running_average
            )
        in_ch = x.shape[-1]
        kernel = self.param(
            "up_kernel", nn.initializers.lecun_normal(), (5, in_ch, half)
        )
        bias = self.param("up_bias", nn.initializers.zeros, (half,))
        # torch ConvTranspose1d(k=5, p=2, s=2): out = 2T - 1
        x = jax.lax.conv_general_dilated(
            x, kernel, (1,), [(2, 2)], lhs_dilation=(2,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + bias
        for k in (33, 11, 7):
            x = InvertedResidual(half, kernel_size=k)(x, use_running_average)
        return nn.Conv(features=self.out_channels, kernel_size=(1,))(x)


class TextToAlignTextModel(nn.Module):
    """v1 duration model (voice100/models/tts.py:67-149)."""

    vocab_size: int
    hidden_size: int = 512
    learning_rate: float = 1e-3

    @nn.compact
    def __call__(self, text: jnp.ndarray, deterministic: bool = True):
        x = nn.Embed(self.vocab_size, self.hidden_size)(text)
        for k in (5, 11, 17, 29):
            x = InvertedResidual(self.hidden_size, kernel_size=k)(
                x, use_running_average=deterministic
            )
        return nn.Conv(features=2, kernel_size=(1,))(x)

    def compute_loss(
        self, text, text_len, align, align_len, deterministic: bool = True
    ) -> jnp.ndarray:
        batch = align.shape[0]
        usable = (align.shape[1] - 1) // 2 * 2
        pairs = align[:, :usable].reshape(batch, -1, 2)
        pred = self(text, deterministic=deterministic)
        n = min(pred.shape[1], pairs.shape[1])
        return duration_loss(pred[:, :n], pairs[:, :n], text[:, :n], text_len)


def expand_alignment_v1(
    text: jnp.ndarray,
    align: jnp.ndarray,
    text_len: jnp.ndarray,
    out_len: int,
    head: int = 5,
) -> jnp.ndarray:
    """v1 duration expansion (voice100/models/tts.py:89-110): rounded
    spans without the monotone cursor; later tokens overwrite earlier
    frames. Implemented as a masked-overwrite scan over tokens."""

    pos = jnp.arange(out_len)

    def step(carry, inp):
        t, out = carry
        tok, a, valid = inp
        t = t + a[0]
        s = jnp.round(t).astype(jnp.int32)
        t = t + a[1]
        e = jnp.round(t).astype(jnp.int32)
        e = jnp.where(s == e, jnp.maximum(0, e + 1), e)
        cover = (pos >= s) & (pos < e) & valid
        out = jnp.where(cover, tok, out)
        # don't advance the cursor for padded tokens
        t = jnp.where(valid, t, carry[0])
        return (t, out), None

    valid = jnp.arange(text.shape[0]) < text_len
    init = (jnp.asarray(float(head)), jnp.zeros(out_len, text.dtype))
    (_, out), _ = jax.lax.scan(step, init, (text, align, valid))
    return out


class AlignTextToAudioModel(nn.Module):
    """v1 acoustic model (voice100/models/tts.py:152-262)."""

    vocab_size: int
    hidden_size: int = 512
    use_mcep: bool = False
    learning_rate: float = 1e-3
    sample_rate: int = 16000
    n_fft: int = 512

    @property
    def logspc_size(self) -> int:
        return 25 if self.use_mcep else self.n_fft // 2 + 1

    @property
    def codeap_size(self) -> int:
        return 1

    @property
    def audio_size(self) -> int:
        # hasf0 + f0 + logspc + codeap
        return 1 + 1 + self.logspc_size + self.codeap_size

    def setup(self) -> None:
        self.embedding = nn.Embed(self.vocab_size, self.hidden_size)
        self.decoder = VoiceDecoder(self.hidden_size, self.audio_size)
        self.norm = WORLDNorm(self.logspc_size, self.codeap_size)

    def __call__(self, aligntext: jnp.ndarray, deterministic: bool = True):
        self.norm.touch()  # ensure norm stats exist in init variables
        x = self.embedding(aligntext)
        x = self.decoder(x, use_running_average=deterministic)
        s, c = self.logspc_size, self.codeap_size
        hasf0 = x[:, :, 0]
        f0 = x[:, :, 1]
        logspc = x[:, :, 2:2 + s]
        codeap = x[:, :, 2 + s:2 + s + c]
        return hasf0, f0, logspc, codeap

    def predict(self, aligntext: jnp.ndarray):
        hasf0, f0, logspc, codeap = self(aligntext, deterministic=True)
        f0, logspc, codeap = self.norm.unnormalize(f0, logspc, codeap)
        f0 = jnp.where(hasf0 < 0, 0.0, f0)
        return f0, logspc, codeap

    def compute_loss(
        self, f0, f0_len, logspc, codeap, aligntext, aligntext_len,
        deterministic: bool = True,
    ):
        hasf0 = (f0 >= 30.0).astype(jnp.float32)
        f0, logspc, codeap = self.norm.normalize(f0, logspc, codeap)
        hasf0_logits, f0_hat, logspc_hat, codeap_hat = self(
            aligntext, deterministic=deterministic
        )
        weights = (
            None
            if self.use_mcep
            else jnp.asarray(mel_logspc_weights(self.sample_rate, self.n_fft))
        )
        return world_loss_v1(
            f0_len, hasf0_logits, f0_hat, logspc_hat, codeap_hat,
            hasf0, f0, logspc, codeap, logspc_weights=weights,
        )


class VoiceMultiTaskDecoder(nn.Module):
    """Shared trunk with WORLD and phone heads
    (voice100/models/tts.py:32-54)."""

    hidden_size: int
    out_channels: int
    secondary_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True):
        half = self.hidden_size // 2
        for k in (65, 47, 33, 17, 11, 7):
            x = InvertedResidual(self.hidden_size, kernel_size=k)(
                x, use_running_average
            )
        y = nn.Conv(features=self.secondary_channels, kernel_size=(1,))(x)
        in_ch = x.shape[-1]
        kernel = self.param(
            "up_kernel", nn.initializers.lecun_normal(), (5, in_ch, half)
        )
        bias = self.param("up_bias", nn.initializers.zeros, (half,))
        x = jax.lax.conv_general_dilated(
            x, kernel, (1,), [(2, 2)], lhs_dilation=(2,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + bias
        for k in (11, 7):
            x = InvertedResidual(half, kernel_size=k)(x, use_running_average)
        x = nn.Conv(features=self.out_channels, kernel_size=(1,))(x)
        return x, y


class AlignTextToAudioMultiTaskModel(nn.Module):
    """v1 multi-task acoustic model (voice100/models/tts.py:265-383):
    WORLD features (x2 upsampled head) + per-position phone logits."""

    vocab_size: int
    target_vocab_size: int
    hidden_size: int = 512
    use_mcep: bool = False
    learning_rate: float = 1e-3
    sample_rate: int = 16000
    n_fft: int = 512

    @property
    def logspc_size(self) -> int:
        return 25 if self.use_mcep else self.n_fft // 2 + 1

    @property
    def codeap_size(self) -> int:
        return 1

    @property
    def audio_size(self) -> int:
        return 1 + 1 + self.logspc_size + self.codeap_size

    def setup(self) -> None:
        self.embedding = nn.Embed(self.vocab_size, self.hidden_size)
        self.decoder = VoiceMultiTaskDecoder(
            self.hidden_size, self.audio_size, self.target_vocab_size
        )
        self.norm = WORLDNorm(self.logspc_size, self.codeap_size)

    def __call__(self, aligntext: jnp.ndarray, deterministic: bool = True):
        self.norm.touch()  # ensure norm stats exist in init variables
        x = self.embedding(aligntext)
        x, y = self.decoder(x, use_running_average=deterministic)
        s, c = self.logspc_size, self.codeap_size
        hasf0 = x[:, :, 0]
        f0 = x[:, :, 1]
        logspc = x[:, :, 2:2 + s]
        codeap = x[:, :, 2 + s:2 + s + c]
        return hasf0, f0, logspc, codeap, y

    def predict(self, aligntext: jnp.ndarray):
        hasf0, f0, logspc, codeap, logits = self(aligntext, deterministic=True)
        f0, logspc, codeap = self.norm.unnormalize(f0, logspc, codeap)
        f0 = jnp.where(hasf0 < 0, 0.0, f0)
        return f0, logspc, codeap, logits

    def compute_loss(
        self, f0, f0_len, logspc, codeap, aligntext, aligntext_len,
        phonetext, phonetext_len, deterministic: bool = True,
    ):
        hasf0 = (f0 >= 30.0).astype(jnp.float32)
        f0n, logspcn, codeapn = self.norm.normalize(f0, logspc, codeap)
        hasf0_logits, f0_hat, logspc_hat, codeap_hat, target_logits = self(
            aligntext, deterministic=deterministic
        )
        weights = (
            None
            if self.use_mcep
            else jnp.asarray(mel_logspc_weights(self.sample_rate, self.n_fft))
        )
        losses = world_loss_v1(
            f0_len, hasf0_logits, f0_hat, logspc_hat, codeap_hat,
            hasf0, f0n, logspcn, codeapn, logspc_weights=weights,
        )
        n = min(target_logits.shape[1], phonetext.shape[1])
        logp = jax.nn.log_softmax(target_logits[:, :n], axis=-1)
        nll = -jnp.take_along_axis(
            logp, phonetext[:, :n, None].astype(jnp.int32), axis=2
        )[:, :, 0]
        mask = sequence_mask(phonetext_len, n, dtype=nll.dtype)
        phone_loss = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return losses + (phone_loss,)
