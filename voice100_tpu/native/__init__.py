"""Native (C++) data-loader library: FLAC decode + resample.

Builds ``audioio.cpp`` into a shared library on first use (g++ -O3) and
binds it with ctypes — the framework's equivalent of the reference's
torchaudio/sox native decode path. A missing compiler degrades
gracefully: WAV decoding stays pure NumPy and FLAC raises a clear error.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

__all__ = ["get_lib", "NativeUnavailable"]

_LOCK = threading.Lock()
_LIB = None
_ERROR = None


class NativeUnavailable(ImportError):
    pass


def _build(sources, out: str) -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", out, *sources, "-ldl"]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise NativeUnavailable(
            f"native build failed: {' '.join(cmd)}\n{proc.stderr}"
        )


def get_lib() -> ctypes.CDLL:
    """Load (building if needed) the native audio library."""
    global _LIB, _ERROR
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _ERROR is not None:
            raise _ERROR
        here = os.path.dirname(os.path.abspath(__file__))
        sources = [
            os.path.join(here, "audioio.cpp"),
            os.path.join(here, "world.cpp"),
        ]
        out = os.path.join(here, "_audioio.so")
        try:
            if not os.path.exists(out) or any(
                os.path.getmtime(out) < os.path.getmtime(src)
                for src in sources
            ):
                _build(sources, out)
            lib = ctypes.CDLL(out)
        except (OSError, NativeUnavailable) as e:
            _ERROR = NativeUnavailable(str(e))
            raise _ERROR
        lib.v100_read_flac.restype = ctypes.c_int
        lib.v100_read_flac.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.v100_resample.restype = ctypes.c_int
        lib.v100_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.v100_read_mp3.restype = ctypes.c_int
        lib.v100_read_mp3.argtypes = list(lib.v100_read_flac.argtypes)
        lib.v100_mp3_available.restype = ctypes.c_int
        lib.v100_mp3_available.argtypes = []
        lib.v100_read_audio.restype = ctypes.c_int
        lib.v100_read_audio.argtypes = list(lib.v100_read_flac.argtypes)
        lib.v100_read_audio_batch.restype = ctypes.c_int
        lib.v100_read_audio_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.v100_free.restype = None
        lib.v100_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.v100_world_synthesize.restype = ctypes.c_int
        lib.v100_world_synthesize.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_long),
        ]
        _LIB = lib
        return _LIB
