"""Model export for serving: StableHLO (jax.export) + ONNX.

The reference exports ONNX graphs of the predict functions with dynamic
batch/time axes (voice100/export_onnx.py:12-161), folding the mc2sp
matrix into the TTS graph. Here the first-class artifact is a serialized
StableHLO module (the TPU/XLA-native equivalent, reloadable with
jax.export and runnable on any XLA backend); every model (all
three v2 predict surfaces and all five v1 surfaces) additionally emits
a real .onnx file via the self-contained emitter in
``voice100_tpu.onnx`` (opset 13, dynamic axes, mc2sp folded, eval-mode
BatchNorm folded — no onnx package required), runnable with
onnxruntime or the in-repo NumPy runtime.

Exported predict surfaces (matching the reference's wrappers):
  asr:   (audio, audio_len)        -> (logits, logits_len)
  align: (text, text_len)          -> durations
  tts:   (aligntext, aligntext_len) -> (f0, logspc, codeap)  [mc2sp folded]
"""

from __future__ import annotations

import json
import os
from argparse import ArgumentParser

import numpy as np
import jax.numpy as jnp

__all__ = ["export_model", "cli_main"]


def _predict_fn(model, variables):
    import jax.numpy as jnp
    from ..models import (
        AudioToAlignText,
        TextToAlignText,
        AlignTextToAudio,
        AudioToTextCTC,
        AudioAlignCTC,
        TextToAlignTextModel,
        AlignTextToAudioModel,
        AlignTextToAudioMultiTaskModel,
    )

    # v1 family (reference export_onnx_v1.py surfaces)
    if isinstance(model, AudioToTextCTC):
        def fn(audio):
            return model.apply(variables, audio)

        return fn, (np.zeros((1, 512, model.audio_size), np.float32),), "asr_v1"
    if isinstance(model, AudioAlignCTC):
        def fn(audio, audio_len):
            return model.apply(variables, audio, audio_len)

        example = (
            np.zeros((1, 512, model.audio_size), np.float32),
            np.asarray([512], np.int32),
        )
        return fn, example, "align_ctc_v1"
    if isinstance(model, TextToAlignTextModel):
        def fn(text):
            return model.apply(variables, text)

        return fn, (np.zeros((1, 128), np.int32),), "ttsalign_v1"
    if isinstance(
        model, (AlignTextToAudioModel, AlignTextToAudioMultiTaskModel)
    ):
        def fn(aligntext):
            return model.apply(
                variables, aligntext, method=type(model).predict
            )

        return fn, (np.zeros((1, 128), np.int32),), "ttsaudio_v1"

    if isinstance(model, AudioToAlignText):
        def fn(audio, audio_len):
            return model.apply(variables, audio, audio_len)

        example = (
            np.zeros((1, 512, model.audio_size), np.float32),
            np.asarray([512], np.int32),
        )
        return fn, example, "asr"
    if isinstance(model, TextToAlignText):
        def fn(text, text_len):
            return model.apply(
                variables, text, text_len, method=TextToAlignText.predict
            )

        example = (
            np.zeros((1, 128), np.int32),
            np.asarray([128], np.int32),
        )
        return fn, example, "align"
    if isinstance(model, AlignTextToAudio):
        from ..dsp.mcep import create_mc2sp_matrix

        mc2sp = None
        if model.logspc_size == 25:
            mc2sp = jnp.asarray(
                create_mc2sp_matrix(512, 24, 0.410).astype(np.float32)
            )

        def fn(aligntext, aligntext_len):
            f0, feat, codeap = model.apply(
                variables, aligntext, aligntext_len,
                method=AlignTextToAudio.predict,
            )
            logspc = feat @ mc2sp if mc2sp is not None else feat
            return f0, logspc, codeap

        example = (
            np.zeros((1, 128), np.int32),
            np.asarray([128], np.int32),
        )
        return fn, example, "tts"
    raise ValueError(f"Cannot export {type(model).__name__}")


def export_model(model, variables, output_path: str) -> str:
    """Serialize the model's predict surface as StableHLO bytes plus a
    JSON manifest; returns the artifact path."""
    import jax
    from jax import export as jax_export

    fn, example, kind = _predict_fn(model, variables)
    exported = jax_export.export(jax.jit(fn))(*example)
    blob = exported.serialize()
    with open(output_path, "wb") as f:
        f.write(blob)
    manifest = {
        "kind": kind,
        "format": "stablehlo.jax_export",
        "input_shapes": [list(np.shape(a)) for a in example],
        "calling_convention": "jax.export.deserialize(...).call(*args)",
    }
    with open(output_path + ".json", "w") as f:
        json.dump(manifest, f, indent=2)
    _export_onnx(model, variables, output_path)
    return output_path


def _export_onnx(model, variables, output_path: str) -> None:
    """Emit the .onnx serving artifact (self-contained emitter; covers
    all eight model architectures)."""
    from ..onnx import export_onnx

    onnx_path = os.path.splitext(output_path)[0] + ".onnx"
    try:
        export_onnx(model, variables, onnx_path)
    except (ValueError, ImportError) as e:
        # ImportError/OnnxSchemaUnavailable: protoc or protobuf missing
        # on this host — degrade to the StableHLO artifact
        print(f"[export] skipped onnx: {e}")
        return
    print(f"[export] wrote {onnx_path}")


def cli_main(argv=None) -> None:
    from ..training.checkpoint import load_variables
    from ..training.cli import load_config, build_from_config

    parser = ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt_path", required=True)
    parser.add_argument("--output", default=None)
    args = parser.parse_args(argv)

    model, _, _, _ = build_from_config(load_config(args.config), {})
    variables = load_variables(args.ckpt_path)
    output = args.output or (
        os.path.splitext(os.path.basename(args.config))[0] + ".stablehlo"
    )
    export_model(model, variables, output)
    print(f"[export] wrote {output}")


if __name__ == "__main__":
    cli_main()
