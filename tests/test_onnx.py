"""ONNX export + runtime round-trip tests.

The emitted .onnx files (voice100_tpu/onnx/export.py, opset 13,
dynamic axes — the reference's serving artifact format,
voice100/export_onnx.py:12-161) are parsed back and executed with the
in-repo NumPy runtime; outputs must match the JAX predict surfaces.
When onnxruntime is importable the same files are also validated
against it.
"""

import numpy as np
import jax
import pytest

from voice100_tpu.models import (
    AudioToAlignText,
    TextToAlignText,
    AlignTextToAudio,
)
from voice100_tpu.onnx import export_onnx
from voice100_tpu.onnx.runtime import load_model


def _rand_audio(rng, batch=2, time=37, size=64):
    audio = rng.randn(batch, time, size).astype(np.float32)
    audio_len = np.asarray([time, time - 9], np.int32)
    return audio, audio_len


def _rand_text(rng, batch=2, length=13, vocab=29):
    text = rng.randint(1, vocab, size=(batch, length)).astype(np.int32)
    text_len = np.asarray([length, length - 4], np.int32)
    return text, text_len


def test_asr_onnx_roundtrip(tmp_path):
    model = AudioToAlignText(
        audio_size=64, vocab_size=29,
        encoder_settings=((24, False, 5, 2, 2, False),
                          (24, False, 5, 1, 2, False)),
        decoder_num_layers=2, decoder_hidden_size=16,
    )
    rng = np.random.RandomState(0)
    audio, audio_len = _rand_audio(rng)
    variables = model.init(jax.random.PRNGKey(0), audio, audio_len)
    want_logits, want_len = model.apply(variables, audio, audio_len)

    path = str(tmp_path / "asr.onnx")
    export_onnx(model, variables, path)
    run = load_model(path)
    assert run.input_names == ["audio", "audio_len"]
    got_logits, got_len = run(audio, audio_len)
    np.testing.assert_array_equal(np.asarray(want_len), got_len)
    # padded frames are zero on both sides; compare valid regions
    for i, n in enumerate(np.asarray(want_len)):
        np.testing.assert_allclose(
            got_logits[i, :n], np.asarray(want_logits)[i, :n],
            rtol=1e-4, atol=1e-4,
        )


def test_align_onnx_roundtrip(tmp_path):
    model = TextToAlignText(vocab_size=29, num_layers=2, hidden_size=16)
    rng = np.random.RandomState(1)
    text, text_len = _rand_text(rng)
    variables = model.init(jax.random.PRNGKey(0), text, text_len)
    want = np.asarray(model.apply(
        variables, text, text_len, method=TextToAlignText.predict))

    path = str(tmp_path / "align.onnx")
    export_onnx(model, variables, path)
    run = load_model(path)
    (got,) = run(text, text_len)
    for i, n in enumerate(text_len):
        np.testing.assert_allclose(got[i, :n], want[i, :n],
                                   rtol=1e-4, atol=1e-4)


def _tts_model_and_vars(logspc_size):
    model = AlignTextToAudio(
        vocab_size=29, logspc_size=logspc_size, codeap_size=1,
        encoder_num_layers=1, encoder_hidden_size=16,
        decoder_settings=((16, False, 5, 1, 2, False),
                          (16, True, 5, 2, 2, False),
                          (16, False, 5, 1, 2, False)),
    )
    rng = np.random.RandomState(2)
    text, text_len = _rand_text(rng)
    variables = model.init(jax.random.PRNGKey(0), text, text_len)
    # non-trivial norm stats so unnormalization is actually exercised
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    norm = dict(variables["world_norm"]["norm"])
    norm["f0_mean"] = np.asarray([120.0], np.float32)
    norm["f0_std"] = np.asarray([35.0], np.float32)
    norm["logspc_mean"] = rng.randn(logspc_size).astype(np.float32)
    norm["logspc_std"] = (1 + rng.rand(logspc_size)).astype(np.float32)
    norm["codeap_mean"] = np.asarray([-1.0], np.float32)
    norm["codeap_std"] = np.asarray([0.5], np.float32)
    variables = {"params": variables["params"],
                 "world_norm": {"norm": norm}}
    return model, variables, text, text_len


@pytest.mark.parametrize("logspc_size", [25, 17])
def test_tts_onnx_roundtrip(tmp_path, logspc_size):
    model, variables, text, text_len = _tts_model_and_vars(logspc_size)
    f0_w, logspc_w, codeap_w = (
        np.asarray(v) for v in model.apply(
            variables, text, text_len, method=AlignTextToAudio.predict)
    )
    if logspc_size == 25:  # graph folds mc2sp; fold on the JAX side too
        from voice100_tpu.dsp.mcep import create_mc2sp_matrix

        mc2sp = create_mc2sp_matrix(512, 24, 0.410).astype(np.float32)
        logspc_w = logspc_w @ mc2sp

    path = str(tmp_path / "tts.onnx")
    export_onnx(model, variables, path)
    run = load_model(path)
    f0_g, logspc_g, codeap_g = run(text, text_len)
    out_len = np.asarray(model.output_length(text_len))
    for i, n in enumerate(out_len):
        np.testing.assert_allclose(f0_g[i, :n], f0_w[i, :n],
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(logspc_g[i, :n], logspc_w[i, :n],
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(codeap_g[i, :n], codeap_w[i, :n],
                                   rtol=1e-3, atol=1e-3)
    # mcep form expands to n_fft/2+1 = 257 spectrum bins
    assert logspc_g.shape[-1] == (257 if logspc_size == 25 else logspc_size)


def test_onnx_file_is_wire_valid(tmp_path):
    """The emitted bytes parse as a well-formed ModelProto with the
    expected opset and graph topology (every node input resolvable)."""
    model = TextToAlignText(vocab_size=29, num_layers=1, hidden_size=8)
    text = np.zeros((1, 4), np.int32)
    text_len = np.asarray([4], np.int32)
    variables = model.init(jax.random.PRNGKey(0), text, text_len)
    path = str(tmp_path / "align.onnx")
    export_onnx(model, variables, path)

    from voice100_tpu.onnx.schema import get_pb

    proto = get_pb().ModelProto()
    proto.ParseFromString(open(path, "rb").read())
    assert proto.ir_version == 7
    assert proto.opset_import[0].version == 13
    g = proto.graph
    known = {t.name for t in g.initializer} | {vi.name for vi in g.input}
    for node in g.node:
        for name in node.input:
            assert not name or name in known, (node.op_type, name)
        known.update(node.output)
    for vi in g.output:
        assert vi.name in known
    # dynamic axes are declared as named dims
    dim0 = g.input[0].type.tensor_type.shape.dim[0]
    assert dim0.dim_param == "batch"


# ---------------------------------------------------------------------------
# Shared artifact case table: every exported model kind with its inputs,
# expected outputs, and valid-region masks. Consumed twice — by the
# hermetic NumPy-runtime test below (proves the case definitions) and
# by the onnxruntime-gated test in test_parity_optional.py (proves the
# wire format + op semantics against a real ONNX runtime, reference
# export_onnx.py:49-78 / export_onnx_v1.py:11-182 artifact surface).
# Each case returns (model, variables, feed, spec) where feed is an
# ordered (name, value) list and spec is [(want, valid_lens|None)] per
# output: None compares the whole array, lens compare rows [:n] along
# axis 1 (padded regions are runtime-dependent).
# ---------------------------------------------------------------------------

def _case_asr_v2():
    model = AudioToAlignText(
        audio_size=64, vocab_size=29,
        encoder_settings=((24, False, 5, 2, 2, False),
                          (24, False, 5, 1, 2, False)),
        decoder_num_layers=2, decoder_hidden_size=16,
    )
    rng = np.random.RandomState(20)
    audio, audio_len = _rand_audio(rng)
    variables = model.init(jax.random.PRNGKey(0), audio, audio_len)
    logits, out_len = model.apply(variables, audio, audio_len)
    out_len = np.asarray(out_len)
    feed = [("audio", audio), ("audio_len", audio_len)]
    return model, variables, feed, [
        (np.asarray(logits), out_len), (out_len, None)]


def _case_align_v2():
    model = TextToAlignText(vocab_size=29, num_layers=2, hidden_size=16)
    rng = np.random.RandomState(21)
    text, text_len = _rand_text(rng)
    variables = model.init(jax.random.PRNGKey(0), text, text_len)
    want = np.asarray(model.apply(
        variables, text, text_len, method=TextToAlignText.predict))
    feed = [("text", text), ("text_len", text_len)]
    return model, variables, feed, [(want, text_len)]


def _case_tts_v2():
    from voice100_tpu.dsp.mcep import create_mc2sp_matrix

    model, variables, text, text_len = _tts_model_and_vars(25)
    f0, logspc, codeap = (
        np.asarray(v) for v in model.apply(
            variables, text, text_len, method=AlignTextToAudio.predict)
    )
    mc2sp = create_mc2sp_matrix(512, 24, 0.410).astype(np.float32)
    logspc = logspc @ mc2sp
    out_len = np.asarray(model.output_length(text_len))
    feed = [("aligntext", text), ("aligntext_len", text_len)]
    return model, variables, feed, [
        (f0, out_len), (logspc, out_len), (codeap, out_len)]


def _case_asr_v1():
    from voice100_tpu.models import AudioToTextCTC

    model = AudioToTextCTC(audio_size=8, vocab_size=11,
                           embed_size=12, hidden_size=16)
    rng = np.random.RandomState(22)
    audio = rng.randn(2, 20, 8).astype(np.float32)
    variables = _init(model, audio)
    want = np.asarray(model.apply(variables, audio, True))
    return model, variables, [("audio", audio)], [(want, None)]


def _case_align_v1():
    from voice100_tpu.models import AudioAlignCTC

    model = AudioAlignCTC(audio_size=8, vocab_size=11,
                          hidden_size=16, num_layers=2)
    rng = np.random.RandomState(23)
    audio = rng.randn(2, 19, 8).astype(np.float32)
    audio_len = np.asarray([19, 11], np.int32)
    variables = _init(model, audio, audio_len)
    want, want_len = model.apply(variables, audio, audio_len)
    want_len = np.asarray(want_len)
    feed = [("audio", audio), ("audio_len", audio_len)]
    return model, variables, feed, [
        (np.asarray(want), want_len), (want_len, None)]


def _case_ttsalign_v1():
    from voice100_tpu.models import TextToAlignTextModel

    model = TextToAlignTextModel(vocab_size=11, hidden_size=16)
    rng = np.random.RandomState(24)
    text = rng.randint(0, 11, size=(2, 9)).astype(np.int32)
    variables = _init(model, text)
    want = np.asarray(model.apply(variables, text, True))
    return model, variables, [("text", text)], [(want, None)]


def _case_ttsaudio_v1():
    from voice100_tpu.dsp.mcep import create_mc2sp_matrix
    from voice100_tpu.models import AlignTextToAudioModel

    model = AlignTextToAudioModel(vocab_size=11, hidden_size=16,
                                  use_mcep=True)
    rng = np.random.RandomState(25)
    text = rng.randint(0, 11, size=(2, 9)).astype(np.int32)
    variables = _init(model, text)
    f0, logspc, codeap = (
        np.asarray(v) for v in model.apply(
            variables, text, method=AlignTextToAudioModel.predict)
    )
    logspc = logspc @ create_mc2sp_matrix(512, 24, 0.410).astype(
        np.float32)
    return model, variables, [("aligntext", text)], [
        (f0, None), (logspc, None), (codeap, None)]


def _case_mt_v1():
    from voice100_tpu.dsp.mcep import create_mc2sp_matrix
    from voice100_tpu.models import AlignTextToAudioMultiTaskModel

    model = AlignTextToAudioMultiTaskModel(
        vocab_size=11, target_vocab_size=13, hidden_size=16,
        use_mcep=True,
    )
    rng = np.random.RandomState(26)
    text = rng.randint(0, 11, size=(2, 9)).astype(np.int32)
    variables = _init(model, text)
    f0, logspc, codeap, phone = (
        np.asarray(v) for v in model.apply(
            variables, text,
            method=AlignTextToAudioMultiTaskModel.predict)
    )
    logspc = logspc @ create_mc2sp_matrix(512, 24, 0.410).astype(
        np.float32)
    return model, variables, [("aligntext", text)], [
        (f0, None), (logspc, None), (codeap, None), (phone, None)]


ONNX_ARTIFACT_CASES = {
    "asr_v2": _case_asr_v2,
    "align_v2": _case_align_v2,
    "tts_v2": _case_tts_v2,
    "asr_v1": _case_asr_v1,
    "align_v1": _case_align_v1,
    "ttsalign_v1": _case_ttsalign_v1,
    "ttsaudio_v1": _case_ttsaudio_v1,
    "mt_v1": _case_mt_v1,
}


def run_artifact_case(name, tmp_path, run_file, rtol=1e-3, atol=1e-3):
    """Export the named case and check ``run_file(path, feed)``'s
    outputs against the JAX predict surface. Returns the max abs error
    over compared cells so gated callers can report measured agreement."""
    model, variables, feed, spec = ONNX_ARTIFACT_CASES[name]()
    path = str(tmp_path / f"{name}.onnx")
    export_onnx(model, variables, path)
    got = run_file(path, feed)
    assert len(got) == len(spec), (name, len(got), len(spec))
    max_err = 0.0
    for g, (want, lens) in zip(got, spec):
        g = np.asarray(g)
        assert g.shape == want.shape, (name, g.shape, want.shape)
        if lens is None:
            np.testing.assert_allclose(g, want, rtol=rtol, atol=atol)
            max_err = max(max_err, float(
                np.max(np.abs(g.astype(np.float64) - want))))
        else:
            for i, n in enumerate(lens):
                np.testing.assert_allclose(
                    g[i, :n], want[i, :n], rtol=rtol, atol=atol)
                max_err = max(max_err, float(np.max(np.abs(
                    g[i, :n].astype(np.float64) - want[i, :n]))))
    return max_err


@pytest.mark.parametrize("name", sorted(ONNX_ARTIFACT_CASES))
def test_artifact_case_table_numpy_runtime(name, tmp_path):
    """Hermetic proof of the case table itself: every case round-trips
    through the in-repo NumPy runtime. The same cases run under real
    onnxruntime when it exists (test_parity_optional.py)."""
    run_artifact_case(
        name, tmp_path,
        lambda path, feed: load_model(path)(*[v for _, v in feed]),
    )


def test_onnxruntime_if_available(tmp_path):
    ort = pytest.importorskip("onnxruntime")
    model = TextToAlignText(vocab_size=29, num_layers=2, hidden_size=16)
    rng = np.random.RandomState(3)
    text, text_len = _rand_text(rng)
    variables = model.init(jax.random.PRNGKey(0), text, text_len)
    want = np.asarray(model.apply(
        variables, text, text_len, method=TextToAlignText.predict))
    path = str(tmp_path / "align.onnx")
    export_onnx(model, variables, path)
    sess = ort.InferenceSession(path)
    (got,) = sess.run(None, {"text": text, "text_len": text_len})
    for i, n in enumerate(text_len):
        np.testing.assert_allclose(got[i, :n], want[i, :n],
                                   rtol=1e-4, atol=1e-4)


def test_onnx_asr_serve_matches_pipeline(tmp_path):
    """OnnxASR (the voice100-runtime equivalent over the emitted .onnx)
    must transcribe identically to the JAX serving pipeline."""
    from voice100_tpu.inference import ASRPipeline
    from voice100_tpu.onnx.serve import OnnxASR

    model = AudioToAlignText(
        audio_size=64, vocab_size=29,
        encoder_settings=((16, False, 3, 2, 1, False),),
        decoder_num_layers=1, decoder_hidden_size=16,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 51, 64), np.float32),
        np.asarray([51], np.int32),
    )
    path = str(tmp_path / "asr.onnx")
    export_onnx(model, variables, path)

    rng = np.random.RandomState(5)
    wav = (rng.randn(9000) * 0.1).astype(np.float32)
    want = ASRPipeline(model, variables, batch_size=1,
                       buckets_sec=(9000 / 16000,)).transcribe([wav])[0]
    got = OnnxASR(path)(wav)
    assert got == want


def test_onnx_tts_serve_synthesizes(tmp_path):
    """OnnxTTS runs text -> durations -> aligned text -> WORLD features
    -> waveform entirely from the exported artifacts."""
    from voice100_tpu.onnx.serve import OnnxTTS

    align = TextToAlignText(vocab_size=29, num_layers=1, hidden_size=16)
    t0 = np.zeros((1, 8), np.int32)
    l0 = np.asarray([8], np.int32)
    align_vars = align.init(jax.random.PRNGKey(0), t0, l0)
    model, tts_vars, _, _ = _tts_model_and_vars(25)

    align_path = str(tmp_path / "align.onnx")
    tts_path = str(tmp_path / "tts.onnx")
    export_onnx(align, align_vars, align_path)
    export_onnx(model, tts_vars, tts_path)

    tts = OnnxTTS(align_path, tts_path, language="en", use_phone=False)
    wav = tts("hello world")
    assert wav.ndim == 1 and len(wav) > 160
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() <= 1.0


def test_expand_alignment_host_matches_reference_semantics():
    """Cursor semantics of the host expansion (head/tail pad 5,
    rounded spans, s==e bumps e) on a hand-checked case."""
    from voice100_tpu.onnx.serve import expand_alignment_host

    text = np.asarray([7, 8, 9], np.int32)
    align = np.asarray([[9.0, 2.0], [1.0, 0.0], [0.5, 2.5]], np.float32)
    # first token's pre-duration (9.0) is skipped, as in the reference
    out = expand_alignment_host(text, align)
    # spans: token7 [5,7); token8 pre 1 -> [8,9) (min one frame);
    # token9 pre 0.5 -> monotone start 9, end floor(11)=11 -> [9,11)
    assert len(out) == 11 + 5
    np.testing.assert_array_equal(out[5:7], [7, 7])
    assert out[7] == 0  # pre-duration gap stays blank
    np.testing.assert_array_equal(out[8:11], [8, 9, 9])
    assert not out[:5].any() and not out[11:].any()


def test_expand_alignment_host_matches_jax_path():
    """ONNX-served and JAX-served synthesis must see the same aligned
    text from the same durations."""
    import jax.numpy as jnp

    from voice100_tpu.onnx.serve import expand_alignment_host
    from voice100_tpu.ops.duration import expand_alignment

    rng = np.random.RandomState(11)
    text = rng.randint(1, 29, size=(17,)).astype(np.int32)
    align = (rng.rand(17, 2) * 4).astype(np.float32)
    host = expand_alignment_host(text, align)
    dev = np.asarray(expand_alignment(
        jnp.asarray(text), jnp.asarray(align),
        jnp.asarray(17, jnp.int32), out_len=len(host),
    ))
    np.testing.assert_array_equal(host, dev)


def _init(model, *args):
    return model.init(jax.random.PRNGKey(0), *args)


def test_asr_v1_onnx_roundtrip(tmp_path):
    from voice100_tpu.models import AudioToTextCTC

    model = AudioToTextCTC(audio_size=8, vocab_size=11,
                           embed_size=12, hidden_size=16)
    rng = np.random.RandomState(0)
    audio = rng.randn(2, 20, 8).astype(np.float32)
    variables = _init(model, audio)
    want = np.asarray(model.apply(variables, audio, True))

    path = str(tmp_path / "asr_v1.onnx")
    export_onnx(model, variables, path)
    (got,) = load_model(path)(audio)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_align_v1_onnx_roundtrip(tmp_path):
    from voice100_tpu.models import AudioAlignCTC

    model = AudioAlignCTC(audio_size=8, vocab_size=11,
                          hidden_size=16, num_layers=2)
    rng = np.random.RandomState(1)
    audio = rng.randn(2, 19, 8).astype(np.float32)
    audio_len = np.asarray([19, 11], np.int32)
    variables = _init(model, audio, audio_len)
    want, want_len = model.apply(variables, audio, audio_len)
    want, want_len = np.asarray(want), np.asarray(want_len)

    path = str(tmp_path / "align_v1.onnx")
    export_onnx(model, variables, path)
    got, got_len = load_model(path)(audio, audio_len)
    np.testing.assert_array_equal(got_len, want_len)
    for i, n in enumerate(want_len):
        np.testing.assert_allclose(got[i, :n], want[i, :n],
                                   rtol=1e-4, atol=1e-4)


def test_ttsalign_v1_onnx_roundtrip(tmp_path):
    from voice100_tpu.models import TextToAlignTextModel

    model = TextToAlignTextModel(vocab_size=11, hidden_size=16)
    rng = np.random.RandomState(2)
    text = rng.randint(0, 11, size=(2, 9)).astype(np.int32)
    variables = _init(model, text)
    want = np.asarray(model.apply(variables, text, True))

    path = str(tmp_path / "ttsalign_v1.onnx")
    export_onnx(model, variables, path)
    (got,) = load_model(path)(text)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_ttsaudio_v1_onnx_roundtrip(tmp_path):
    from voice100_tpu.models import AlignTextToAudioModel

    model = AlignTextToAudioModel(vocab_size=11, hidden_size=16,
                                  use_mcep=True)
    rng = np.random.RandomState(3)
    text = rng.randint(0, 11, size=(2, 9)).astype(np.int32)
    variables = _init(model, text)
    f0_w, logspc_w, codeap_w = (
        np.asarray(v) for v in model.apply(
            variables, text, method=AlignTextToAudioModel.predict)
    )
    from voice100_tpu.dsp.mcep import create_mc2sp_matrix

    logspc_w = logspc_w @ create_mc2sp_matrix(512, 24, 0.410).astype(
        np.float32)

    path = str(tmp_path / "ttsaudio_v1.onnx")
    export_onnx(model, variables, path)
    f0_g, logspc_g, codeap_g = load_model(path)(text)
    np.testing.assert_allclose(f0_g, f0_w, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(logspc_g, logspc_w, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(codeap_g, codeap_w, rtol=1e-3, atol=1e-3)


def test_ttsaudio_mt_v1_onnx_roundtrip(tmp_path):
    from voice100_tpu.models import AlignTextToAudioMultiTaskModel

    model = AlignTextToAudioMultiTaskModel(
        vocab_size=11, target_vocab_size=13, hidden_size=16,
        use_mcep=True,
    )
    rng = np.random.RandomState(4)
    text = rng.randint(0, 11, size=(2, 9)).astype(np.int32)
    variables = _init(model, text)
    f0_w, logspc_w, codeap_w, phone_w = (
        np.asarray(v) for v in model.apply(
            variables, text,
            method=AlignTextToAudioMultiTaskModel.predict)
    )
    from voice100_tpu.dsp.mcep import create_mc2sp_matrix

    logspc_w = logspc_w @ create_mc2sp_matrix(512, 24, 0.410).astype(
        np.float32)

    path = str(tmp_path / "mt_v1.onnx")
    export_onnx(model, variables, path)
    f0_g, logspc_g, codeap_g, phone_g = load_model(path)(text)
    np.testing.assert_allclose(f0_g, f0_w, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(logspc_g, logspc_w, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(codeap_g, codeap_w, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(phone_g, phone_w, rtol=1e-3, atol=1e-3)
