"""Native C++ audio library tests: FLAC decode + resample round trips."""

import ctypes
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
