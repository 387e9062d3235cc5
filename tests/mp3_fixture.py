"""Test-only MP3 encoding via the system libmp3lame (ctypes).

Used to synthesize CommonVoice-style mp3 fixtures hermetically; the
framework itself only decodes mp3 (voice100_tpu.native.mp3).
"""

import ctypes
import ctypes.util

import numpy as np

__all__ = ["lame_available", "write_mp3"]

_LAME = None


def _load():
    global _LAME
    if _LAME is not None:
        return _LAME
    for name in ("libmp3lame.so.0", "libmp3lame.so",
                 ctypes.util.find_library("mp3lame")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    else:
        raise RuntimeError("libmp3lame not available")
    lib.lame_init.restype = ctypes.c_void_p
    for fn in ("lame_set_in_samplerate", "lame_set_num_channels",
               "lame_set_brate", "lame_set_mode", "lame_set_quality",
               "lame_init_params", "lame_close"):
        getattr(lib, fn).restype = ctypes.c_int
    lib.lame_set_in_samplerate.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.lame_set_num_channels.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.lame_set_brate.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.lame_set_mode.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.lame_set_quality.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.lame_init_params.argtypes = [ctypes.c_void_p]
    lib.lame_close.argtypes = [ctypes.c_void_p]
    lib.lame_encode_buffer.restype = ctypes.c_int
    lib.lame_encode_buffer.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_short),
        ctypes.POINTER(ctypes.c_short),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int,
    ]
    lib.lame_encode_flush.restype = ctypes.c_int
    lib.lame_encode_flush.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int,
    ]
    _LAME = lib
    return lib


def lame_available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


def write_mp3(path: str, samples: np.ndarray, rate: int = 24000) -> None:
    """Encode mono float32 [-1, 1] samples to an MP3 file."""
    lib = _load()
    gfp = lib.lame_init()
    assert gfp
    lib.lame_set_in_samplerate(gfp, rate)
    lib.lame_set_num_channels(gfp, 1)
    lib.lame_set_mode(gfp, 3)  # MPEG_mode MONO
    lib.lame_set_brate(gfp, 64)
    lib.lame_set_quality(gfp, 5)
    assert lib.lame_init_params(gfp) >= 0

    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    n = len(pcm)
    out_size = int(1.25 * n + 7200) + 7200
    out = (ctypes.c_ubyte * out_size)()
    left = pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_short))
    written = lib.lame_encode_buffer(gfp, left, left, n, out, out_size)
    assert written >= 0, written
    flushed = lib.lame_encode_flush(
        gfp, ctypes.cast(ctypes.byref(out, written),
                         ctypes.POINTER(ctypes.c_ubyte)),
        out_size - written,
    )
    assert flushed >= 0, flushed
    lib.lame_close(gfp)
    with open(path, "wb") as f:
        f.write(bytes(out[: written + flushed]))
