"""ONNX protobuf bindings, generated on demand with protoc.

Compiles ``voice100_onnx.proto`` (a wire-compatible subset of the
public ONNX schema) into ``voice100_onnx_pb2.py`` next to this file on
first use — the same build-on-demand pattern as the native audio
library (voice100_tpu/native/__init__.py).
"""

from __future__ import annotations

import os
import subprocess
import threading

__all__ = ["get_pb", "OnnxSchemaUnavailable"]

_LOCK = threading.Lock()
_PB = None
_ERROR = None


class OnnxSchemaUnavailable(ImportError):
    pass


def get_pb():
    """Return the generated protobuf module for the ONNX schema."""
    global _PB, _ERROR
    with _LOCK:
        if _PB is not None:
            return _PB
        if _ERROR is not None:
            raise _ERROR
        here = os.path.dirname(os.path.abspath(__file__))
        src = os.path.join(here, "voice100_onnx.proto")
        out = os.path.join(here, "voice100_onnx_pb2.py")
        try:
            if not os.path.exists(out) or (
                os.path.getmtime(out) < os.path.getmtime(src)
            ):
                proc = subprocess.run(
                    [
                        "protoc",
                        f"--proto_path={here}",
                        f"--python_out={here}",
                        src,
                    ],
                    capture_output=True,
                    text=True,
                )
                if proc.returncode != 0:
                    raise OnnxSchemaUnavailable(
                        f"protoc failed: {proc.stderr}"
                    )
            from . import voice100_onnx_pb2 as pb
        except (OSError, ImportError, OnnxSchemaUnavailable) as e:
            _ERROR = OnnxSchemaUnavailable(str(e))
            raise _ERROR
        _PB = pb
        return _PB
