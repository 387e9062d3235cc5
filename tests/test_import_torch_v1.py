"""v1 checkpoint import: full-model forward parity vs torch.

Torch twins replicate the reference v1 architectures exactly
(voice100/models/asr.py:27-123, align.py:69-95, tts.py:13-110,152-200,
265-310) so their state_dicts carry the same keys as the published
deprecated checkpoints (README.md:311-324). BatchNorm running stats are
populated with training-mode passes first, so the stats mapping is
exercised, then eval-mode outputs must match the flax models.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402


class TorchConvBNActivate(nn.Sequential):
    def __init__(self, c_in, c_out, k, stride=1, groups=1):
        padding = (k - 1) // 2
        super().__init__(
            nn.Conv1d(c_in, c_out, kernel_size=k, stride=stride,
                      padding=padding, groups=groups, bias=False),
            nn.BatchNorm1d(c_out),
            nn.ReLU6(inplace=True),
        )


class TorchInvertedResidual(nn.Module):
    def __init__(self, c_in, c_out, k, stride=1, expand=4, residual=True):
        super().__init__()
        hidden = c_in * expand
        self.use_residual = residual
        self.conv = nn.Sequential(
            TorchConvBNActivate(c_in, hidden, 1),
            TorchConvBNActivate(hidden, hidden, k, stride=stride,
                                groups=hidden),
            nn.Conv1d(hidden, c_out, kernel_size=1, bias=False),
            nn.BatchNorm1d(c_out),
        )

    def forward(self, x):
        return x + self.conv(x) if self.use_residual else self.conv(x)


def _warm_bn(model, make_input, n=3):
    """Populate BatchNorm running stats with training-mode passes."""
    model.train()
    with torch.no_grad():
        for _ in range(n):
            model(make_input())
    model.eval()


HIDDEN, VOCAB, AUDIO = 16, 11, 8


def test_asr_v1_forward_matches_torch():
    from voice100_tpu.models import AudioToTextCTC
    from voice100_tpu.tools.import_torch import convert_state_dict

    embed = 12

    class TorchASR(nn.Module):
        def __init__(self):
            super().__init__()
            half = HIDDEN // 2
            self.encoder = nn.Module()
            self.encoder.layers = nn.Sequential(
                TorchInvertedResidual(AUDIO, half, 11, stride=2,
                                      residual=False),
                TorchInvertedResidual(half, half, 19),
                TorchInvertedResidual(half, half, 27),
                TorchInvertedResidual(half, half, 35),
                TorchInvertedResidual(half, HIDDEN, 51, residual=False),
                TorchInvertedResidual(HIDDEN, HIDDEN, 59),
                TorchInvertedResidual(HIDDEN, HIDDEN, 67),
                TorchInvertedResidual(HIDDEN, HIDDEN, 75),
                TorchInvertedResidual(HIDDEN, embed, 83, residual=False),
            )
            self.decoder = nn.Module()
            self.decoder.layers = nn.Sequential(
                nn.Dropout(0.2),
                nn.Conv1d(embed, VOCAB, kernel_size=1, bias=True),
            )

        def forward(self, audio):  # [B, T, A]
            x = audio.transpose(1, 2)
            x = self.encoder.layers(x)
            x = self.decoder.layers(x)
            return x.transpose(1, 2)

    torch.manual_seed(0)
    t_model = TorchASR()
    rng = np.random.RandomState(0)
    audio = rng.randn(2, 20, AUDIO).astype(np.float32)
    _warm_bn(t_model, lambda: torch.randn(2, 20, AUDIO))
    with torch.no_grad():
        want = t_model(torch.from_numpy(audio)).numpy()

    model = AudioToTextCTC(audio_size=AUDIO, vocab_size=VOCAB,
                           embed_size=embed, hidden_size=HIDDEN)
    state = {k: v.detach().numpy() for k, v in
             t_model.state_dict().items()}
    variables = convert_state_dict(state, model)
    got = np.asarray(model.apply(variables, audio, True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_align_v1_forward_matches_torch():
    from voice100_tpu.models import AudioAlignCTC
    from voice100_tpu.tools.import_torch import convert_state_dict

    class TorchAlign(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv1d(AUDIO, HIDDEN, kernel_size=3,
                                  stride=2, padding=1)
            self.lstm = nn.LSTM(HIDDEN, HIDDEN, num_layers=2,
                                dropout=0.2, bidirectional=True)
            self.dense = nn.Linear(2 * HIDDEN, VOCAB)

    torch.manual_seed(1)
    t_model = TorchAlign().eval()
    rng = np.random.RandomState(1)
    batch, time = 3, 19
    audio = rng.randn(batch, time, AUDIO).astype(np.float32)
    lengths = np.asarray([19, 12, 7], np.int32)

    with torch.no_grad():
        x = t_model.conv(torch.from_numpy(audio).transpose(1, 2))
        x = torch.relu(x).transpose(1, 2)
        x_len = torch.from_numpy((lengths + 1) // 2)
        packed = nn.utils.rnn.pack_padded_sequence(
            x, x_len, batch_first=True, enforce_sorted=False)
        out, _ = t_model.lstm(packed)
        out, _ = nn.utils.rnn.pad_packed_sequence(
            out, batch_first=True, total_length=x.shape[1])
        want = t_model.dense(out).numpy()

    model = AudioAlignCTC(audio_size=AUDIO, vocab_size=VOCAB,
                          hidden_size=HIDDEN, num_layers=2)
    state = {k: v.detach().numpy() for k, v in
             t_model.state_dict().items()}
    variables = convert_state_dict(state, model)
    got, got_len = model.apply(variables, audio, lengths)
    np.testing.assert_array_equal(np.asarray(got_len), (lengths + 1) // 2)
    got = np.asarray(got)
    for i, n in enumerate((lengths + 1) // 2):
        np.testing.assert_allclose(got[i, :n], want[i, :n],
                                   rtol=1e-4, atol=1e-4)


def test_ttsalign_v1_forward_matches_torch():
    from voice100_tpu.models import TextToAlignTextModel
    from voice100_tpu.tools.import_torch import convert_state_dict

    class TorchTTSAlign(nn.Module):
        def __init__(self):
            super().__init__()
            self.embedding = nn.Embedding(VOCAB, HIDDEN)
            self.layers = nn.Sequential(
                TorchInvertedResidual(HIDDEN, HIDDEN, 5),
                TorchInvertedResidual(HIDDEN, HIDDEN, 11),
                TorchInvertedResidual(HIDDEN, HIDDEN, 17),
                TorchInvertedResidual(HIDDEN, HIDDEN, 29),
                nn.Conv1d(HIDDEN, 2, kernel_size=1, bias=True),
            )

        def forward(self, text):
            x = self.embedding(text).transpose(1, 2)
            return self.layers(x).transpose(1, 2)

    torch.manual_seed(2)
    t_model = TorchTTSAlign()
    rng = np.random.RandomState(2)
    text = rng.randint(0, VOCAB, size=(2, 15)).astype(np.int64)
    _warm_bn(t_model, lambda: torch.randint(0, VOCAB, (2, 15)))
    with torch.no_grad():
        want = t_model(torch.from_numpy(text)).numpy()

    model = TextToAlignTextModel(vocab_size=VOCAB, hidden_size=HIDDEN)
    state = {k: v.detach().numpy() for k, v in
             t_model.state_dict().items()}
    variables = convert_state_dict(state, model)
    got = np.asarray(model.apply(variables, text.astype(np.int32), True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _torch_voice_decoder(out_channels):
    half = HIDDEN // 2
    return nn.Sequential(
        TorchInvertedResidual(HIDDEN, HIDDEN, 65),
        TorchInvertedResidual(HIDDEN, HIDDEN, 33),
        TorchInvertedResidual(HIDDEN, HIDDEN, 17),
        TorchInvertedResidual(HIDDEN, HIDDEN, 11),
        nn.ConvTranspose1d(HIDDEN, half, kernel_size=5, padding=2,
                           stride=2),
        TorchInvertedResidual(half, half, 33),
        TorchInvertedResidual(half, half, 11),
        TorchInvertedResidual(half, half, 7),
        nn.Conv1d(half, out_channels, kernel_size=1, bias=True),
    )


def test_ttsaudio_v1_predict_matches_torch():
    from voice100_tpu.models import AlignTextToAudioModel
    from voice100_tpu.tools.import_torch import convert_state_dict

    logspc_size, codeap_size = 25, 1
    audio_size = 2 + logspc_size + codeap_size

    class TorchTTSAudio(nn.Module):
        def __init__(self):
            super().__init__()
            self.embedding = nn.Embedding(VOCAB, HIDDEN)
            self.decoder = nn.Module()
            self.decoder.layers = _torch_voice_decoder(audio_size)
            self.norm = nn.Module()
            self.norm.register_buffer("f0_mean", torch.tensor([120.0]))

        def forward(self, text):
            x = self.embedding(text).transpose(1, 2)
            return self.decoder.layers(x).transpose(1, 2)

    torch.manual_seed(3)
    t_model = TorchTTSAudio()
    rng = np.random.RandomState(3)
    text = rng.randint(0, VOCAB, size=(2, 9)).astype(np.int64)
    _warm_bn(t_model, lambda: torch.randint(0, VOCAB, (2, 9)))
    with torch.no_grad():
        want = t_model(torch.from_numpy(text)).numpy()

    model = AlignTextToAudioModel(vocab_size=VOCAB, hidden_size=HIDDEN,
                                  use_mcep=True)
    assert model.audio_size == audio_size
    state = {k: v.detach().numpy() for k, v in
             t_model.state_dict().items()}
    variables = convert_state_dict(state, model)
    hasf0, f0, logspc, codeap = model.apply(variables, text.astype(np.int32),
                                            True)
    got = np.concatenate([
        np.asarray(hasf0)[:, :, None], np.asarray(f0)[:, :, None],
        np.asarray(logspc), np.asarray(codeap),
    ], axis=2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # norm buffers imported into the world_norm collection
    np.testing.assert_allclose(
        np.asarray(variables["world_norm"]["norm"]["f0_mean"]), [120.0])


def test_ttsaudio_mt_v1_forward_matches_torch():
    from voice100_tpu.models import AlignTextToAudioMultiTaskModel
    from voice100_tpu.tools.import_torch import convert_state_dict

    logspc_size, codeap_size, phones = 25, 1, 13
    audio_size = 2 + logspc_size + codeap_size
    half = HIDDEN // 2

    class TorchMT(nn.Module):
        def __init__(self):
            super().__init__()
            self.embedding = nn.Embedding(VOCAB, HIDDEN)
            self.decoder = nn.Module()
            self.decoder.layer1 = nn.Sequential(
                TorchInvertedResidual(HIDDEN, HIDDEN, 65),
                TorchInvertedResidual(HIDDEN, HIDDEN, 47),
                TorchInvertedResidual(HIDDEN, HIDDEN, 33),
                TorchInvertedResidual(HIDDEN, HIDDEN, 17),
                TorchInvertedResidual(HIDDEN, HIDDEN, 11),
                TorchInvertedResidual(HIDDEN, HIDDEN, 7),
            )
            self.decoder.layer2 = nn.Sequential(
                nn.ConvTranspose1d(HIDDEN, half, kernel_size=5,
                                   padding=2, stride=2),
                TorchInvertedResidual(half, half, 11),
                TorchInvertedResidual(half, half, 7),
                nn.Conv1d(half, audio_size, kernel_size=1, bias=True),
            )
            self.decoder.layer3 = nn.Conv1d(HIDDEN, phones,
                                            kernel_size=1, bias=True)

        def forward(self, text):
            x = self.embedding(text).transpose(1, 2)
            x = self.decoder.layer1(x)
            y = self.decoder.layer3(x)
            x = self.decoder.layer2(x)
            return x.transpose(1, 2), y.transpose(1, 2)

    torch.manual_seed(4)
    t_model = TorchMT()
    rng = np.random.RandomState(4)
    text = rng.randint(0, VOCAB, size=(2, 9)).astype(np.int64)
    _warm_bn(t_model, lambda: torch.randint(0, VOCAB, (2, 9)))
    with torch.no_grad():
        want_x, want_y = (t.numpy() for t in t_model(torch.from_numpy(text)))

    model = AlignTextToAudioMultiTaskModel(
        vocab_size=VOCAB, target_vocab_size=phones, hidden_size=HIDDEN,
        use_mcep=True,
    )
    state = {k: v.detach().numpy() for k, v in
             t_model.state_dict().items()}
    variables = convert_state_dict(state, model)
    hasf0, f0, logspc, codeap, logits = model.apply(
        variables, text.astype(np.int32), True)
    got_x = np.concatenate([
        np.asarray(hasf0)[:, :, None], np.asarray(f0)[:, :, None],
        np.asarray(logspc), np.asarray(codeap),
    ], axis=2)
    np.testing.assert_allclose(got_x, want_x, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits), want_y,
                               rtol=1e-4, atol=1e-4)
