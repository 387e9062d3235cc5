"""Torch checkpoint import: full-model forward parity.

Builds the reference v2 architectures directly in torch (same layer
specs as voice100/models/_asr_v2.py:20-49 / _align_v2.py:14-37 /
_tts_v2.py:26-74), converts the state dict with tools.import_torch, and
asserts the flax models produce the same outputs — an end-to-end
numerical check of every layer type (conv, transpose conv, layernorm,
gelu, embedding, biLSTM, dense) against torch.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402


class TorchConvBlock(nn.Module):
    """conv/convT + channel layernorm + gelu, torch side."""

    def __init__(self, c_in, c_out, k, s, p, bias, transpose):
        super().__init__()
        cls = nn.ConvTranspose1d if transpose else nn.Conv1d
        self.conv = cls(c_in, c_out, kernel_size=k, stride=s,
                        padding=p, bias=bias)
        self.layer_norm = nn.LayerNorm(c_out)

    def forward(self, x):  # x: [B, C, T]
        x = self.conv(x)
        x = self.layer_norm(x.transpose(-2, -1)).transpose(-2, -1)
        return nn.functional.gelu(x)


def _torch_stack(c_in, settings):
    layers = []
    c = c_in
    for c_out, transpose, k, s, p, bias in settings:
        layers.append(TorchConvBlock(c, c_out, k, s, p, bias, transpose))
        c = c_out
    return nn.Sequential(*layers)


def test_asr_v2_forward_matches_torch():
    from voice100_tpu.models import AudioToAlignText
    from voice100_tpu.tools.import_torch import convert_asr_v2

    settings = ((12, False, 5, 2, 2, False), (12, False, 5, 1, 2, False))
    hidden, vocab, audio_size = 12, 7, 6

    class TorchASR(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = _torch_stack(audio_size, settings)
            self.lstm = nn.LSTM(hidden, hidden, num_layers=2,
                                bidirectional=True, dropout=0.2)
            self.dense = nn.Linear(2 * hidden, vocab)

    torch.manual_seed(0)
    t_model = TorchASR().eval()

    rng = np.random.RandomState(0)
    batch, time = 3, 21
    audio = rng.randn(batch, time, audio_size).astype(np.float32)
    lengths = np.asarray([21, 13, 6], np.int32)

    # torch forward (packed, as the reference does)
    with torch.no_grad():
        x = t_model.encoder(torch.from_numpy(audio).transpose(1, 2))
        x = x.transpose(1, 2)
        x_len = torch.from_numpy((lengths + 1) // 2)
        packed = nn.utils.rnn.pack_padded_sequence(
            x, x_len, batch_first=True, enforce_sorted=False
        )
        out, _ = t_model.lstm(packed)
        out, _ = nn.utils.rnn.pad_packed_sequence(
            out, batch_first=True, total_length=x.shape[1]
        )
        t_logits = t_model.dense(out).numpy()

    state = {k: v.numpy() for k, v in t_model.state_dict().items()}
    model = AudioToAlignText(
        audio_size=audio_size, vocab_size=vocab,
        encoder_settings=settings,
        decoder_num_layers=2, decoder_hidden_size=hidden,
    )
    variables = convert_asr_v2(state, model)
    logits, logits_len = model.apply(
        variables, jnp.asarray(audio), jnp.asarray(lengths)
    )
    np.testing.assert_array_equal(np.asarray(logits_len), (lengths + 1) // 2)
    # compare on valid frames (padding is zeroed on our side)
    logits = np.asarray(logits)
    for b in range(batch):
        n = (lengths[b] + 1) // 2
        np.testing.assert_allclose(
            logits[b, :n], t_logits[b, :n], rtol=1e-4, atol=1e-4
        )


def test_tts_v2_forward_matches_torch():
    from voice100_tpu.models import AlignTextToAudio
    from voice100_tpu.tools.import_torch import convert_tts_v2

    vocab, hidden, logspc, codeap = 9, 8, 5, 1
    settings = (
        (8, False, 5, 1, 2, False),
        (8, True, 5, 2, 2, False),
        (8, False, 5, 1, 2, False),
    )
    audio_size = 2 * 1 + logspc + 2 * codeap

    class TorchTTS(nn.Module):
        def __init__(self):
            super().__init__()
            self.embedding = nn.Embedding(vocab, hidden)
            self.lstm = nn.LSTM(hidden, hidden, num_layers=2,
                                bidirectional=True, dropout=0.2)
            self.decoder = _torch_stack(2 * hidden, settings)
            self.projection = nn.Linear(8, audio_size)
            # WORLDNorm buffers
            self.register_buffer("norm_f0_mean", torch.zeros(1) + 120.0)
            self.register_buffer("norm_f0_std", torch.ones(1) * 30.0)

    torch.manual_seed(1)
    t_model = TorchTTS().eval()

    rng = np.random.RandomState(1)
    batch, tlen = 2, 11
    text = rng.randint(0, vocab, size=(batch, tlen)).astype(np.int32)
    lengths = np.asarray([11, 7], np.int32)

    with torch.no_grad():
        x = t_model.embedding(torch.from_numpy(text).long())
        packed = nn.utils.rnn.pack_padded_sequence(
            x, torch.from_numpy(lengths), batch_first=True,
            enforce_sorted=False,
        )
        out, _ = t_model.lstm(packed)
        out, _ = nn.utils.rnn.pad_packed_sequence(
            out, batch_first=True, total_length=tlen
        )
        y = t_model.decoder(out.transpose(1, 2)).transpose(1, 2)
        t_out = t_model.projection(y).numpy()

    state = {
        k: v.numpy()
        for k, v in t_model.state_dict().items()
        if not k.startswith("norm_")
    }
    state["norm.f0_mean"] = np.asarray([120.0], np.float32)
    state["norm.f0_std"] = np.asarray([30.0], np.float32)
    state["norm.logspc_mean"] = np.zeros(logspc, np.float32)
    state["norm.logspc_std"] = np.ones(logspc, np.float32)
    state["norm.codeap_mean"] = np.zeros(codeap, np.float32)
    state["norm.codeap_std"] = np.ones(codeap, np.float32)

    model = AlignTextToAudio(
        vocab_size=vocab, logspc_size=logspc, codeap_size=codeap,
        encoder_num_layers=2, encoder_hidden_size=hidden,
        decoder_settings=settings,
    )
    variables = convert_tts_v2(state, model)
    hasf0, f0, logspc_hat, hascodeap, codeap_hat = model.apply(
        variables, jnp.asarray(text), jnp.asarray(lengths)
    )
    ours = np.concatenate(
        [
            np.asarray(hasf0)[:, :, None],
            np.asarray(f0)[:, :, None],
            np.asarray(logspc_hat),
            np.asarray(hascodeap),
            np.asarray(codeap_hat),
        ],
        axis=2,
    )
    # valid output region: the first 2*len-1 frames derive from real
    # inputs (transpose conv doubles time)
    for b in range(batch):
        n = 2 * lengths[b] - 1 - 8  # trim the conv halo at the edge
        np.testing.assert_allclose(
            ours[b, :n], t_out[b, :n], rtol=1e-3, atol=2e-4
        )

    # world_norm carried through
    import jax

    leaves = variables["world_norm"]["norm"]
    assert float(leaves["f0_mean"][0]) == 120.0
