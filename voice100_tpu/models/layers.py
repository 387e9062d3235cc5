"""Shared flax.linen building blocks.

v2 conv blocks (Conv/ConvTranspose + LayerNorm + GELU) mirror
voice100/models/_layers_v2.py:29-103; the BiLSTM wraps the masked scan
core from ``ops.lstm``; WORLDNorm mirrors the frozen feature statistics
of voice100/models/_layers_v2.py:164-206. Length arithmetic matches
torch Conv1d/ConvTranspose1d so reference configs produce identical
time axes.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.lstm import multilayer_bilstm

__all__ = [
    "ConvLayerBlock",
    "ConvTransposeLayerBlock",
    "ConvStack",
    "conv_stack_output_length",
    "BiLSTM",
    "WORLDNorm",
]

# (out_channels, transpose, kernel_size, stride, padding, bias) — the
# reference's encoder/decoder settings tuples (config/asr_en_base.yaml:17-21).
ConvSetting = Tuple[int, bool, int, int, int, bool]


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _matmul_dtype():
    """bf16 compute dtype for the conv/matmul-heavy blocks when the
    trainer's precision knob (ops.lstm.set_default_compute_dtype) or
    VOICE100_TPU_MATMUL_DTYPE requests it; None = input dtype."""
    from ..ops.lstm import default_compute_dtype

    return (jnp.bfloat16
            if default_compute_dtype() == jnp.bfloat16 else None)


class ConvLayerBlock(nn.Module):
    """Conv1d + channel LayerNorm + exact GELU
    (voice100/models/_layers_v2.py:29-56). Under the bf16 precision
    knob the conv runs in bf16 (f32 params); LayerNorm/GELU stay
    f32."""

    out_channels: int
    kernel_size: int
    stride: int
    padding: int
    use_bias: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, T, C]
        dtype = _matmul_dtype()
        x = nn.Conv(
            features=self.out_channels,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            use_bias=self.use_bias,
            dtype=dtype,
        )(x)
        if dtype is not None:
            x = x.astype(jnp.float32)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        return jax.nn.gelu(x, approximate=False)


class ConvTransposeLayerBlock(nn.Module):
    """ConvTranspose1d + LayerNorm + GELU
    (voice100/models/_layers_v2.py:59-86). Length: (T-1)*s - 2p + k."""

    out_channels: int
    kernel_size: int
    stride: int
    padding: int
    use_bias: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, in_ch, self.out_channels),
        )
        pad = self.kernel_size - 1 - self.padding
        # stays f32 regardless of the precision knob: bf16 transposed
        # (lhs-dilated) convs measured SLOWER on v5e (tts train 13,494
        # -> 11,512 audio-s/s), unlike the regular conv blocks
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.out_channels,)
            )
            y = y + bias
        y = nn.LayerNorm(epsilon=1e-5)(y)
        return jax.nn.gelu(y, approximate=False)


class ConvStack(nn.Module):
    """Sequence of (transpose?) conv blocks from settings tuples
    (voice100/models/_layers_v2.py:89-103)."""

    settings: Sequence[ConvSetting]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for out_ch, transpose, kernel, stride, padding, bias in self.settings:
            cls = ConvTransposeLayerBlock if transpose else ConvLayerBlock
            x = cls(
                out_channels=out_ch,
                kernel_size=kernel,
                stride=stride,
                padding=padding,
                use_bias=bias,
            )(x)
        return x


def conv_stack_output_length(settings: Sequence[ConvSetting], length):
    """Time-axis length through a ConvStack (torch length semantics)."""
    for _, transpose, kernel, stride, padding, _ in settings:
        if transpose:
            length = (length - 1) * stride - 2 * padding + kernel
        else:
            length = (length + 2 * padding - kernel) // stride + 1
    return length


class BiLSTM(nn.Module):
    """Stacked bidirectional LSTM over padded sequences.

    Replaces the packed-sequence cuDNN LSTMs of the reference
    (voice100/models/_asr_v2.py:32-48) with the masked scan of
    ``ops.lstm`` (torch weight layout, inter-layer dropout 0.2).
    """

    hidden_size: int
    num_layers: int
    dropout: float = 0.2

    @staticmethod
    def compute_dtype():
        """Optional reduced-precision matmuls (f32 state/accumulation).

        Resolution order: the process default set by
        ``ops.lstm.set_default_compute_dtype`` (used by the trainer's
        ``precision`` config), then the VOICE100_TPU_MATMUL_DTYPE env
        var (serving-side knob). Defaults to the input dtype.
        """
        from ..ops.lstm import default_compute_dtype

        return default_compute_dtype()

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        bound = 1.0 / np.sqrt(self.hidden_size)
        init = _uniform_init(bound)
        params = []
        for layer in range(self.num_layers):
            d_in = x.shape[-1] if layer == 0 else 2 * self.hidden_size
            layer_params = {}
            for direction in ("fwd", "bwd"):
                prefix = f"l{layer}_{direction}"
                layer_params[direction] = {
                    "w_ih": self.param(
                        f"{prefix}_w_ih", init, (4 * self.hidden_size, d_in)
                    ),
                    "w_hh": self.param(
                        f"{prefix}_w_hh",
                        init,
                        (4 * self.hidden_size, self.hidden_size),
                    ),
                    "b_ih": self.param(
                        f"{prefix}_b_ih", init, (4 * self.hidden_size,)
                    ),
                    "b_hh": self.param(
                        f"{prefix}_b_hh", init, (4 * self.hidden_size,)
                    ),
                }
            params.append(layer_params)
        rng = None
        if not deterministic and self.dropout > 0.0:
            rng = self.make_rng("dropout")
        return multilayer_bilstm(
            params, x, lengths, dropout=self.dropout, dropout_rng=rng,
            compute_dtype=BiLSTM.compute_dtype(),
        )


class WORLDNorm(nn.Module):
    """Frozen per-feature mean/std for WORLD streams
    (voice100/models/_layers_v2.py:164-206). Stored in the non-trained
    ``world_norm`` collection; loaded from a stat file at setup."""

    logspc_size: int
    codeap_size: int

    def setup(self) -> None:
        z = nn.initializers.zeros
        o = nn.initializers.ones
        mk = functools.partial(self.variable, "world_norm")
        self._f0_mean = mk("f0_mean", lambda: z(None, (1,)))
        self._f0_std = mk("f0_std", lambda: o(None, (1,)))
        self._logspc_mean = mk(
            "logspc_mean", lambda: z(None, (self.logspc_size,))
        )
        self._logspc_std = mk(
            "logspc_std", lambda: o(None, (self.logspc_size,))
        )
        self._codeap_mean = mk(
            "codeap_mean", lambda: z(None, (self.codeap_size,))
        )
        self._codeap_std = mk(
            "codeap_std", lambda: o(None, (self.codeap_size,))
        )

    def touch(self) -> None:
        """No-op that forces variable creation at parent init time
        (flax initializes submodules lazily on first method call)."""
        return None

    def normalize(self, f0, logspc, codeap):
        f0 = (f0 - self._f0_mean.value) / self._f0_std.value
        logspc = (logspc - self._logspc_mean.value) / self._logspc_std.value
        codeap = (codeap - self._codeap_mean.value) / self._codeap_std.value
        return f0, logspc, codeap

    def unnormalize(self, f0, logspc, codeap):
        f0 = self._f0_std.value * f0 + self._f0_mean.value
        logspc = self._logspc_std.value * logspc + self._logspc_mean.value
        codeap = self._codeap_std.value * codeap + self._codeap_mean.value
        return f0, logspc, codeap

    def __call__(self, f0, logspc, codeap):
        return self.normalize(f0, logspc, codeap)
