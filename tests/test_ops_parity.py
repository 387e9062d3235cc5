"""Numerics parity of core ops vs torch CPU reference implementations.

These pin the framework's STFT/mel, LSTM, and CTC numerics to the same
semantics the reference gets from torch/torchaudio/cuDNN.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def test_power_spectrum_matches_torch_stft():
    from voice100_tpu.ops.melspec import power_spectrum

    rng = np.random.RandomState(0)
    wav = rng.randn(4000).astype(np.float32)

    spec = np.asarray(power_spectrum(jnp.asarray(wav), 512, 160, 400))

    t_spec = torch.stft(
        torch.from_numpy(wav),
        n_fft=512,
        hop_length=160,
        win_length=400,
        window=torch.hann_window(400, periodic=True),
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    t_pow = (t_spec.real**2 + t_spec.imag**2).numpy().T  # [frames, freq]

    assert spec.shape == t_pow.shape
    np.testing.assert_allclose(spec, t_pow, rtol=1e-4, atol=1e-3)


def test_power_spectrum_fft_matches_matmul():
    from voice100_tpu.ops.melspec import power_spectrum

    rng = np.random.RandomState(1)
    wav = jnp.asarray(rng.randn(2, 3200).astype(np.float32))
    a = np.asarray(power_spectrum(wav, 512, 160, 400, use_fft=False))
    b = np.asarray(power_spectrum(wav, 512, 160, 400, use_fft=True))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)


def test_log_mel_shapes():
    from voice100_tpu.ops.melspec import log_mel_spectrogram, num_frames

    wav = jnp.zeros((2, 16000), jnp.float32)
    mel = log_mel_spectrogram(wav)
    assert mel.shape == (2, num_frames(16000, 160), 64)
    assert np.isfinite(np.asarray(mel)).all()


def _copy_torch_lstm_params(t_lstm, num_layers, bidirectional):
    layers = []
    for layer in range(num_layers):
        layer_params = {}
        dirs = [("fwd", "")] + ([("bwd", "_reverse")] if bidirectional else [])
        for name, suffix in dirs:
            layer_params[name] = {
                "w_ih": jnp.asarray(
                    getattr(t_lstm, f"weight_ih_l{layer}{suffix}").detach().numpy()
                ),
                "w_hh": jnp.asarray(
                    getattr(t_lstm, f"weight_hh_l{layer}{suffix}").detach().numpy()
                ),
                "b_ih": jnp.asarray(
                    getattr(t_lstm, f"bias_ih_l{layer}{suffix}").detach().numpy()
                ),
                "b_hh": jnp.asarray(
                    getattr(t_lstm, f"bias_hh_l{layer}{suffix}").detach().numpy()
                ),
            }
        layers.append(layer_params)
    return layers


def test_bilstm_matches_torch_packed():
    from voice100_tpu.ops.lstm import multilayer_bilstm

    torch.manual_seed(0)
    batch, time, d_in, hidden, num_layers = 3, 12, 8, 16, 2
    t_lstm = torch.nn.LSTM(
        d_in, hidden, num_layers=num_layers, bidirectional=True,
        batch_first=True, dropout=0.0,
    )
    t_lstm.eval()

    rng = np.random.RandomState(0)
    x = rng.randn(batch, time, d_in).astype(np.float32)
    lengths = np.array([12, 7, 3], dtype=np.int32)

    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), torch.from_numpy(lengths), batch_first=True,
        enforce_sorted=False,
    )
    t_out, _ = t_lstm(packed)
    t_out, _ = torch.nn.utils.rnn.pad_packed_sequence(
        t_out, batch_first=True, total_length=time
    )
    t_out = t_out.detach().numpy()

    params = _copy_torch_lstm_params(t_lstm, num_layers, True)
    out = np.asarray(
        multilayer_bilstm(params, jnp.asarray(x), jnp.asarray(lengths))
    )
    np.testing.assert_allclose(out, t_out, rtol=1e-4, atol=1e-5)


def test_ctc_loss_matches_torch():
    from voice100_tpu.ops.ctc import ctc_loss

    rng = np.random.RandomState(0)
    batch, time, vocab, label_len = 4, 20, 7, 6
    logits = rng.randn(batch, time, vocab).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    targets = rng.randint(1, vocab, size=(batch, label_len)).astype(np.int32)
    input_lengths = np.array([20, 15, 9, 20], dtype=np.int32)
    target_lengths = np.array([6, 4, 3, 1], dtype=np.int32)

    loss = float(
        ctc_loss(
            log_probs,
            jnp.asarray(targets),
            jnp.asarray(input_lengths),
            jnp.asarray(target_lengths),
        )
    )

    t_log_probs = torch.from_numpy(np.asarray(log_probs)).transpose(0, 1)
    criterion = torch.nn.CTCLoss(zero_infinity=True)
    t_loss = criterion(
        t_log_probs,
        torch.from_numpy(targets).long(),
        torch.from_numpy(input_lengths).long(),
        torch.from_numpy(target_lengths).long(),
    ).item()
    assert abs(loss - t_loss) < 1e-4


def test_ctc_loss_gradient_finite():
    from voice100_tpu.ops.ctc import ctc_loss

    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(2, 10, 5).astype(np.float32))
    targets = jnp.asarray([[1, 2, 3], [2, 2, 0]], dtype=jnp.int32)

    def loss_fn(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return ctc_loss(
            lp, targets, jnp.asarray([10, 8]), jnp.asarray([3, 2])
        )

    g = jax.grad(loss_fn)(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_ctc_viterbi_matches_reference_algorithm():
    """Compare the batched lattice Viterbi against a direct NumPy port of
    the reference dynamic program (voice100/models/align.py:18-66)."""
    from voice100_tpu.ops.ctc import ctc_viterbi_align

    def ref_best_path(logits, labels, max_move=3):
        # independent reimplementation of the reference recurrence
        T = logits.shape[0]
        z = np.zeros(labels.shape[0] * 2 + 1, dtype=np.int64)
        z[1::2] = labels
        S = z.shape[0]
        alpha = np.full(S, -np.inf)
        alpha[0] = logits[0, z[0]]
        if S > 1:
            alpha[1] = logits[0, z[1]]
        bp = np.zeros((T, S), dtype=np.int64)
        for t in range(1, T):
            new = np.full(S, -np.inf)
            for s in range(S):
                best, best_m = -np.inf, 0
                for m in range(max_move):
                    if s - m < 0:
                        continue
                    if m > 0 and m % 2 == 0 and z[s] == 0:
                        continue
                    v = alpha[s - m]
                    if v > best:
                        best, best_m = v, m
                new[s] = best + logits[t, z[s]]
                bp[t, s] = best_m
            alpha = new
        j = S - 1 if alpha[S - 1] > alpha[S - 2] else S - 2
        score = alpha[j]
        path = np.zeros(T, dtype=np.int64)
        for t in range(T - 1, -1, -1):
            path[t] = j
            j -= bp[t, j]
        return score, path, z[path]

    rng = np.random.RandomState(0)
    batch, time, vocab = 3, 15, 6
    logits = rng.randn(batch, time, vocab).astype(np.float32)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    label_lens = np.array([5, 3, 4], dtype=np.int32)
    labels = np.zeros((batch, 5), dtype=np.int32)
    for b in range(batch):
        labels[b, : label_lens[b]] = rng.randint(1, vocab, label_lens[b])
    input_lens = np.array([15, 10, 12], dtype=np.int32)

    res = ctc_viterbi_align(
        jnp.asarray(log_probs),
        jnp.asarray(labels),
        jnp.asarray(input_lens),
        jnp.asarray(label_lens),
    )

    for b in range(batch):
        score, path, lab = ref_best_path(
            log_probs[b, : input_lens[b]],
            labels[b, : label_lens[b]],
        )
        np.testing.assert_allclose(
            float(res.score[b]), score, rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(res.path[b, : input_lens[b]]), path
        )
        np.testing.assert_array_equal(
            np.asarray(res.labels[b, : input_lens[b]]), lab
        )
        # padding frames are zeroed
        np.testing.assert_array_equal(
            np.asarray(res.labels[b, input_lens[b]:]), 0
        )


def test_pallas_logmel_matches_jnp():
    """Fused Pallas kernel (interpret mode on CPU) vs the jnp path."""
    from voice100_tpu.ops.melspec import log_mel_spectrogram
    from voice100_tpu.ops.melspec_pallas import log_mel_spectrogram_pallas

    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(2, 4800).astype(np.float32))
    ref = np.asarray(log_mel_spectrogram(wav))
    got = np.asarray(log_mel_spectrogram_pallas(wav, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_bilstm_matches_scan(monkeypatch):
    """Pallas grid-over-time LSTM kernel (interpret mode) vs the scan:
    exact in f32 streaming mode, close in the default bf16 mode."""
    from voice100_tpu.ops.lstm import init_lstm_params, bilstm
    from voice100_tpu.ops.lstm_pallas import bilstm_pallas

    params = init_lstm_params(jax.random.PRNGKey(0), 8, 16, 1)[0]
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 12, 8).astype(np.float32))
    lengths = jnp.asarray([12, 7, 3], jnp.int32)
    ref = np.asarray(bilstm(params, x, lengths))

    monkeypatch.setenv("VOICE100_TPU_LSTM_XG_DTYPE", "float32")
    got = np.asarray(bilstm_pallas(params, x, lengths, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    monkeypatch.setenv("VOICE100_TPU_LSTM_XG_DTYPE", "bfloat16")
    got16 = np.asarray(bilstm_pallas(params, x, lengths, interpret=True))
    np.testing.assert_allclose(got16, ref, atol=5e-3)


def test_pallas_bilstm_gradient_matches_scan(monkeypatch):
    """custom-VJP gradients of the Pallas path equal scan gradients
    (f32 streaming so the forward cotangents match exactly)."""
    monkeypatch.setenv("VOICE100_TPU_LSTM_XG_DTYPE", "float32")
    from voice100_tpu.ops.lstm import init_lstm_params, bilstm
    from voice100_tpu.ops.lstm_pallas import bilstm_pallas

    params = init_lstm_params(jax.random.PRNGKey(0), 4, 8, 1)[0]
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 4).astype(np.float32))
    lengths = jnp.asarray([10, 6], jnp.int32)

    g_scan = jax.grad(
        lambda p, xx: jnp.sum(bilstm(p, xx, lengths) ** 2)
    )(params, x)
    g_pal = jax.grad(
        lambda p, xx: jnp.sum(bilstm_pallas(p, xx, lengths) ** 2)
    )(params, x)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_scan),
        jax.tree_util.tree_leaves(g_pal),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_numpy_mel_matches_jax():
    """The framework-free serving mel (onnx.serve path) must match the
    on-device transform."""
    from voice100_tpu.ops.melspec import (
        log_mel_spectrogram, log_mel_spectrogram_np,
    )

    rng = np.random.RandomState(0)
    wav = (rng.randn(7000) * 0.2).astype(np.float32)
    a = np.asarray(log_mel_spectrogram(wav))
    b = log_mel_spectrogram_np(wav)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_numpy_synthesis_matches_jax_periodic():
    """Host synthesis (synthesize_np) parity vs the jitted synthesizer
    on the (deterministic) periodic path; the noise path differs only
    by RNG, so aperiodicity is held near zero."""
    from voice100_tpu.dsp.world.synthesis import synthesize
    from voice100_tpu.dsp.world.synthesis_np import synthesize_np

    n_frames, n_fft = 80, 512
    t = np.arange(n_frames) * 0.01
    f0 = 150.0 * (1.0 + 0.05 * np.sin(2 * np.pi * 2.0 * t))
    freqs = np.arange(n_fft // 2 + 1) * 16000 / n_fft
    env = np.exp(-0.5 * ((freqs - 700.0) / 300.0) ** 2) + 1e-7
    spc = np.tile(env[None, :], (n_frames, 1))
    ap = np.full((n_frames, n_fft // 2 + 1), 1e-6)

    a = np.asarray(synthesize(f0, spc, ap, fs=16000, frame_period=10.0))
    b = synthesize_np(f0, spc, ap, fs=16000, frame_period=10.0)
    n = min(len(a), len(b))
    assert n > 12000
    scale = np.abs(a[:n]).max()
    diff = np.abs(a[:n] - b[:n]) / scale
    # the f32 (device) vs f64 (host) phase cumsum may wrap one pulse a
    # sample apart, creating a short localized onset difference; demand
    # near-exact agreement everywhere else
    assert float(np.mean(diff > 2e-3)) < 0.01, float(np.mean(diff > 2e-3))
    assert float(np.median(diff)) < 1e-5


def test_numpy_synthesis_matches_jax_periodic_22k():
    """Same parity at the 22.05 kHz JA spec: fractional hop (220.5
    samples, the gather interpolation branch), fft_size=1024 Fourier
    matrices, and the int32 phase-twist range at the larger grid."""
    from voice100_tpu.dsp.world.synthesis import synthesize
    from voice100_tpu.dsp.world.synthesis_np import synthesize_np

    n_frames, n_fft, fs = 60, 1024, 22050
    t = np.arange(n_frames) * 0.01
    f0 = 180.0 * (1.0 + 0.05 * np.sin(2 * np.pi * 2.0 * t))
    freqs = np.arange(n_fft // 2 + 1) * fs / n_fft
    env = np.exp(-0.5 * ((freqs - 900.0) / 400.0) ** 2) + 1e-7
    spc = np.tile(env[None, :], (n_frames, 1))
    ap = np.full((n_frames, n_fft // 2 + 1), 1e-6)

    a = np.asarray(synthesize(f0, spc, ap, fs=fs, frame_period=10.0))
    b = synthesize_np(f0, spc, ap, fs=fs, frame_period=10.0)
    n = min(len(a), len(b))
    assert n > 12000
    scale = np.abs(a[:n]).max()
    diff = np.abs(a[:n] - b[:n]) / scale
    assert float(np.mean(diff > 2e-3)) < 0.01, float(np.mean(diff > 2e-3))
    assert float(np.median(diff)) < 1e-5


def test_pallas_bilstm_grads_match_scan():
    """The Pallas training path (state-saving forward + reverse-grid
    backward kernel) must produce the same gradients as differentiating
    the scan implementation, including ragged-length masking."""
    from voice100_tpu.ops.lstm import bilstm, init_lstm_params
    from voice100_tpu.ops.lstm_pallas import _bilstm_op

    batch, time, d_in, hidden = 3, 11, 6, 8
    params = init_lstm_params(
        jax.random.PRNGKey(0), d_in, hidden, num_layers=1
    )[0]
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, time, d_in))
    lengths = jnp.asarray([11, 7, 4], jnp.int32)
    cotangent = jax.random.normal(
        jax.random.PRNGKey(2), (batch, time, 2 * hidden)
    )

    def loss_scan(p, xx):
        return jnp.sum(bilstm(p, xx, lengths) * cotangent)

    def loss_pallas(p, xx):
        return jnp.sum(_bilstm_op(False, p, xx, lengths) * cotangent)

    want_p, want_x = jax.grad(loss_scan, argnums=(0, 1))(params, x)
    got_p, got_x = jax.grad(loss_pallas, argnums=(0, 1))(params, x)

    np.testing.assert_allclose(got_x, want_x, rtol=1e-4, atol=1e-5)
    for direction in ("fwd", "bwd"):
        for key in ("w_ih", "w_hh", "b_ih", "b_hh"):
            np.testing.assert_allclose(
                got_p[direction][key], want_p[direction][key],
                rtol=1e-4, atol=1e-5,
                err_msg=f"{direction}.{key}",
            )
    # primal values agree (inference kernel streams xg in bf16 by
    # default; exact parity is covered by test_pallas_bilstm_matches_scan
    # with f32 streaming)
    np.testing.assert_allclose(
        _bilstm_op(False, params, x, lengths),
        bilstm(params, x, lengths),
        rtol=2e-2, atol=2e-3,
    )


def test_pallas_bilstm_bf16_grads_close_to_f32():
    """The bf16 mixed-precision Pallas path (bf16 projections and
    gradient matmuls, f32 recurrence) stays close to the f32 gradients
    - loose tolerance, it is a reduced-precision mode."""
    from voice100_tpu.ops.lstm import init_lstm_params
    from voice100_tpu.ops.lstm_pallas import _bilstm_op

    batch, time, d_in, hidden = 3, 11, 6, 8
    params = init_lstm_params(
        jax.random.PRNGKey(0), d_in, hidden, num_layers=1
    )[0]
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, time, d_in))
    lengths = jnp.asarray([11, 7, 4], jnp.int32)
    cotangent = jax.random.normal(
        jax.random.PRNGKey(2), (batch, time, 2 * hidden)
    )

    def loss(bf16, p, xx):
        return jnp.sum(_bilstm_op(bf16, p, xx, lengths) * cotangent)

    want_p, want_x = jax.grad(loss, argnums=(1, 2))(False, params, x)
    got_p, got_x = jax.grad(loss, argnums=(1, 2))(True, params, x)
    np.testing.assert_allclose(got_x, want_x, rtol=0.1, atol=0.02)
    for direction in ("fwd", "bwd"):
        for name in ("w_ih", "w_hh", "b_ih", "b_hh"):
            np.testing.assert_allclose(
                got_p[direction][name], want_p[direction][name],
                rtol=0.1, atol=0.02, err_msg=f"{direction}/{name}",
            )
