"""ONNX export + runtime (self-contained, no onnx package needed).

The reference's serving contract is ONNX consumed by voice100-runtime
(voice100/export_onnx.py:12-161). This package emits wire-valid ONNX
(opset 13, dynamic batch/time axes) directly from flax parameters via a
bundled schema subset, and includes a NumPy evaluator able to run the
emitted graphs — the framework's stand-in for onnxruntime, used for
round-trip numerics validation and CPU serving.
"""

from .builder import GraphBuilder  # noqa: F401
from .export import export_onnx  # noqa: F401
