"""Native C++ audio library tests: FLAC decode + resample round trips."""

import ctypes
import os
import shutil

import numpy as np
import pytest

from flac_fixture import encode_flac

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)


def _write(tmp_path, name, data):
    p = tmp_path / name
    p.write_bytes(data)
    return str(p)


def test_flac_verbatim_roundtrip(tmp_path):
    from voice100_tpu.native.flac import read_flac

    rng = np.random.RandomState(0)
    left = (rng.randn(1000) * 8000).astype(np.int64)
    right = (rng.randn(1000) * 8000).astype(np.int64)
    path = _write(
        tmp_path, "v.flac", encode_flac([left, right], 16000)
    )
    samples, rate = read_flac(path)
    assert rate == 16000
    assert samples.shape == (2, 1000)
    np.testing.assert_allclose(samples[0], left / 32768.0, atol=1e-6)
    np.testing.assert_allclose(samples[1], right / 32768.0, atol=1e-6)


def test_flac_constant_and_fixed(tmp_path):
    from voice100_tpu.native.flac import read_flac

    const = np.full(600, -123, dtype=np.int64)
    path = _write(
        tmp_path, "c.flac",
        encode_flac([const], 22050, subframe_types="constant"),
    )
    samples, rate = read_flac(path)
    assert rate == 22050
    np.testing.assert_allclose(samples[0], const / 32768.0, atol=1e-6)

    t = np.arange(900)
    smooth = (3000 * np.sin(2 * np.pi * 220 * t / 16000)).astype(np.int64)
    for order in (1, 2):
        path = _write(
            tmp_path, f"f{order}.flac",
            encode_flac([smooth], 16000, subframe_types=f"fixed{order}"),
        )
        samples, rate = read_flac(path)
        np.testing.assert_allclose(
            samples[0], smooth / 32768.0, atol=1e-6
        )


def test_flac_through_load_audio(tmp_path):
    """dsp.audioio routes .flac through the native decoder + resample."""
    from voice100_tpu.dsp.audioio import load_audio

    t = np.arange(2205)
    wave = (6000 * np.sin(2 * np.pi * 440 * t / 22050)).astype(np.int64)
    path = _write(tmp_path, "s.flac", encode_flac([wave], 22050))
    out = load_audio(path, sample_rate=16000)
    assert abs(out.shape[0] - 1600) <= 2
    spec = np.abs(np.fft.rfft(out))
    peak = np.argmax(spec) * 16000 / len(out)
    assert abs(peak - 440) < 15


def test_native_resample_matches_numpy():
    from voice100_tpu.native import get_lib
    from voice100_tpu.dsp.resample import resample

    lib = get_lib()
    rng = np.random.RandomState(1)
    x = rng.randn(4410).astype(np.float32) * 0.2
    out = ctypes.POINTER(ctypes.c_float)()
    out_n = ctypes.c_long()
    code = lib.v100_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(x), 44100, 16000, ctypes.byref(out), ctypes.byref(out_n),
    )
    assert code == 0
    native = np.ctypeslib.as_array(out, shape=(out_n.value,)).copy()
    lib.v100_free(out)
    ref = resample(x, 44100, 16000)
    assert abs(native.shape[0] - ref.shape[0]) <= 1
    n = min(len(native), len(ref))
    # same algorithm family; interior samples agree closely
    np.testing.assert_allclose(
        native[10:n - 10], ref[10:n - 10], atol=5e-3
    )


def test_batch_decode_matches_python_path(tmp_path):
    """The C++ thread-pool batch decoder must match dsp.audioio for
    wav, flac, and mp3 inputs (first channel, resampled)."""
    import numpy as np

    from corpus_fixture import make_dummy_corpus
    from flac_fixture import encode_flac

    from voice100_tpu.dsp.audioio import load_audio
    from voice100_tpu.native.batch import load_audio_batch

    root = make_dummy_corpus(str(tmp_path), n_clips=3)
    paths = [
        os.path.join(root, "wavs", f"clip{i:04d}.wav") for i in range(3)
    ]
    t = np.arange(24000) / 24000.0
    tone = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    flac_path = str(tmp_path / "tone.flac")
    with open(flac_path, "wb") as f:
        f.write(encode_flac([(tone * 32767).astype(np.int32)], 24000))
    paths.append(flac_path)
    try:
        from mp3_fixture import lame_available, write_mp3

        if lame_available():
            mp3_path = str(tmp_path / "tone.mp3")
            write_mp3(mp3_path, tone, 24000)
            paths.append(mp3_path)
    except Exception:
        pass

    batch = load_audio_batch(paths, 16000)
    for path, wav in zip(paths, batch):
        ref = load_audio(path, 16000)
        assert wav is not None and wav.shape == ref.shape, path
        np.testing.assert_allclose(wav, ref, atol=2e-4)

    # per-file failures surface as None, not exceptions
    partial = load_audio_batch([paths[0], str(tmp_path / "missing.wav")])
    assert partial[0] is not None and partial[1] is None


def test_cache_dataset_prefetch_equivalence(tmp_path):
    """Features computed through the native prefetch path equal the
    single-file decode path, and the loader triggers prefetch."""
    import numpy as np

    from corpus_fixture import make_dummy_corpus

    from voice100_tpu.data import AudioTextDataModule

    make_dummy_corpus(str(tmp_path), n_clips=4)

    def epoch(cache_name):
        data = AudioTextDataModule(
            vocoder="mel", dataset="dummy_en", data_dir=str(tmp_path),
            cache_dir=str(tmp_path / cache_name), batch_size=2,
            valid_ratio=0.0,
        )
        data.setup("fit")
        return [b for b in data.train_dataloader()]

    with_prefetch = epoch("cache_a")

    # disable prefetch by removing the hook, fresh cache
    from voice100_tpu.data.transforms import EncodedCacheDataset

    saved = EncodedCacheDataset.prefetch
    EncodedCacheDataset.prefetch = None  # not callable -> skipped
    try:
        without_prefetch = epoch("cache_b")
    finally:
        EncodedCacheDataset.prefetch = saved

    for (a_audio, a_text), (b_audio, b_text) in zip(
        with_prefetch, without_prefetch
    ):
        np.testing.assert_allclose(a_audio[0], b_audio[0], atol=1e-5)
        np.testing.assert_array_equal(a_text[0], b_text[0])


def test_native_world_synthesis_matches_numpy():
    """The C++ vocoder (native/world.cpp) must match the NumPy
    synthesizer on the deterministic periodic path (the noise path
    differs only by RNG)."""
    from voice100_tpu.dsp.world.synthesis_np import synthesize_np
    from voice100_tpu.native.world import synthesize_native

    n_frames, n_fft = 60, 512
    t = np.arange(n_frames) * 0.01
    f0 = 160.0 * (1.0 + 0.04 * np.sin(2 * np.pi * 3.0 * t))
    freqs = np.arange(n_fft // 2 + 1) * 16000 / n_fft
    env = np.exp(-0.5 * ((freqs - 600.0) / 250.0) ** 2) + 1e-7
    spc = np.tile(env[None, :], (n_frames, 1))
    ap = np.full((n_frames, n_fft // 2 + 1), 1e-6)

    a = synthesize_np(f0, spc, ap, fs=16000, frame_period=10.0)
    b = synthesize_native(f0, spc, ap, fs=16000, frame_period=10.0)
    assert len(a) == len(b)
    scale = np.abs(a).max()
    np.testing.assert_allclose(a / scale, b / scale, atol=1e-4)

    # non-power-of-two fft size is rejected cleanly
    with pytest.raises(ValueError):
        synthesize_native(f0[:4], np.ones((4, 300)), np.ones((4, 300)))


def test_native_decoders_survive_corrupt_files(tmp_path):
    """Truncated/garbage/mislabeled files must produce clean per-file
    error slots (None), never crashes — the batch decoder ingests
    arbitrary corpora on a thread pool."""
    from corpus_fixture import make_dummy_corpus

    from voice100_tpu.native.batch import load_audio_batch

    root = make_dummy_corpus(str(tmp_path), n_clips=1)
    good = os.path.join(root, "wavs", "clip0000.wav")
    rng = np.random.RandomState(0)

    cases = []
    # random garbage with each extension
    for ext in (".wav", ".flac", ".mp3"):
        p = str(tmp_path / f"garbage{ext}")
        with open(p, "wb") as f:
            f.write(rng.bytes(4096))
        cases.append(p)
    # truncated copies of a real wav (incl. mid-header cuts)
    data = open(good, "rb").read()
    for cut in (4, 12, 20, 45, len(data) // 2):
        p = str(tmp_path / f"trunc{cut}.wav")
        with open(p, "wb") as f:
            f.write(data[:cut])
        cases.append(p)
    # a wav whose declared fmt chunk runs past EOF
    evil = bytearray(data[:44])
    evil[16:20] = (10**6).to_bytes(4, "little")  # fmt size = 1e6
    p = str(tmp_path / "evil.wav")
    with open(p, "wb") as f:
        f.write(bytes(evil))
    cases.append(p)
    # empty file
    p = str(tmp_path / "empty.flac")
    open(p, "wb").close()
    cases.append(p)

    out = load_audio_batch([good] + cases, 16000)
    assert out[0] is not None  # the good file still decodes
    # corrupt inputs may decode to garbage-but-bounded audio or fail
    # cleanly; either way: no crash, and failures are None
    for wav in out[1:]:
        assert wav is None or (
            isinstance(wav, np.ndarray) and np.isfinite(wav).all()
        )
