"""Import reference (PyTorch Lightning) checkpoints into this framework.

The reference distributes pretrained ``.ckpt`` files (torch pickles with
a ``state_dict``, /root/reference/README.md:295-324). Weight layouts
here were chosen to be cross-loadable (torch LSTM gate order, torch
conv length semantics), so conversion is pure renaming + transposes:

  v2 ASR   (AudioToAlignText, voice100/models/_asr_v2.py:20-38)
  v2 align (TextToAlignText,  voice100/models/_align_v2.py:14-23)
  v2 TTS   (AlignTextToAudio, voice100/models/_tts_v2.py:14-45)
  v1 ASR   (AudioToTextCTC,   voice100/models/asr.py:97-123)
  v1 align (AudioAlignCTC,    voice100/models/align.py:69-84)
  v1 TTS-align (TextToAlignTextModel, voice100/models/tts.py:67-88)
  v1 TTS-audio (AlignTextToAudioModel, voice100/models/tts.py:152-200)
  v1 TTS-audio-mt (AlignTextToAudioMultiTaskModel, voice100/models/tts.py:265-333)

Torch tensor -> flax param mapping:
  Conv1d.weight [out, in, k]        -> Conv kernel [k, in, out]
  ConvTranspose1d.weight [in,out,k] -> kernel [k, in, out]
  Linear.weight [out, in]           -> Dense kernel [in, out]
  LSTM weight_ih_l{k}{_rev} [4H, D] -> l{k}_{fwd,bwd}_w_ih (as-is)
  Embedding.weight                  -> Embed embedding (as-is)
  LayerNorm.weight/bias             -> scale/bias (as-is)
  WORLDNorm buffers                 -> world_norm collection
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = [
    "load_torch_state_dict",
    "convert_state_dict",
    "convert_asr_v2",
    "convert_align_v2",
    "convert_tts_v2",
    "convert_asr_v1",
    "convert_align_v1",
    "convert_ttsalign_v1",
    "convert_ttsaudio_v1",
    "convert_ttsaudio_mt_v1",
    "cli_main",
]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a Lightning .ckpt (or raw state dict) as numpy arrays."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def _lstm_params(state: Dict[str, np.ndarray], prefix: str, num_layers: int):
    out = {}
    for layer in range(num_layers):
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            for ours, theirs in (
                ("w_ih", "weight_ih"), ("w_hh", "weight_hh"),
                ("b_ih", "bias_ih"), ("b_hh", "bias_hh"),
            ):
                key = f"{prefix}.{theirs}_l{layer}{suffix}"
                out[f"l{layer}_{direction}_{ours}"] = state[key]
    return out


def _conv_block(state, torch_prefix: str, transpose: bool):
    w = state[f"{torch_prefix}.conv.weight"]
    if transpose:
        # torch ConvTranspose1d: [in, out, k]; our kernel: [k, in, out].
        # our forward is a dilated *cross-correlation*; torch's transposed
        # conv applies the kernel flipped along time.
        kernel = np.transpose(w, (2, 0, 1))[::-1].copy()
    else:
        kernel = np.transpose(w, (2, 1, 0))
    ln = {
        "scale": state[f"{torch_prefix}.layer_norm.weight"],
        "bias": state[f"{torch_prefix}.layer_norm.bias"],
    }
    if transpose:
        out = {"kernel": kernel, "LayerNorm_0": ln}
        if f"{torch_prefix}.conv.bias" in state:
            out["bias"] = state[f"{torch_prefix}.conv.bias"]
    else:
        conv = {"kernel": kernel}
        if f"{torch_prefix}.conv.bias" in state:
            conv["bias"] = state[f"{torch_prefix}.conv.bias"]
        out = {"Conv_0": conv, "LayerNorm_0": ln}
    return out


def _conv_stack(state, torch_prefix: str, settings):
    # flax auto-names compact children with per-class counters
    params = {}
    counters = {"conv": 0, "convt": 0}
    for i, (_, transpose, *_rest) in enumerate(settings):
        if transpose:
            name = f"ConvTransposeLayerBlock_{counters['convt']}"
            counters["convt"] += 1
        else:
            name = f"ConvLayerBlock_{counters['conv']}"
            counters["conv"] += 1
        params[name] = _conv_block(state, f"{torch_prefix}.{i}", transpose)
    return params


def _dense(state, torch_prefix: str):
    return {
        "kernel": state[f"{torch_prefix}.weight"].T,
        "bias": state[f"{torch_prefix}.bias"],
    }


def convert_asr_v2(state: Dict[str, np.ndarray], model) -> dict:
    """state_dict -> variables for models.AudioToAlignText."""
    params = {
        "ConvStack_0": _conv_stack(
            state, "encoder", model.encoder_settings
        ),
        "BiLSTM_0": _lstm_params(state, "lstm", model.decoder_num_layers),
        "Dense_0": _dense(state, "dense"),
    }
    return {"params": params}


def convert_align_v2(state: Dict[str, np.ndarray], model) -> dict:
    """state_dict -> variables for models.TextToAlignText."""
    params = {
        "Embed_0": {"embedding": state["embedding.weight"]},
        "BiLSTM_0": _lstm_params(state, "lstm", model.num_layers),
        "Dense_0": _dense(state, "dense"),
    }
    return {"params": params}


def convert_tts_v2(state: Dict[str, np.ndarray], model) -> dict:
    """state_dict -> variables for models.AlignTextToAudio."""
    params = {
        "embedding": {"embedding": state["embedding.weight"]},
        "lstm": _lstm_params(state, "lstm", model.encoder_num_layers),
        "decoder": _conv_stack(state, "decoder", model.decoder_settings),
        "projection": _dense(state, "projection"),
    }
    world_norm = {
        "norm": {
            key: state[f"norm.{key}"]
            for key in (
                "f0_mean", "f0_std", "logspc_mean", "logspc_std",
                "codeap_mean", "codeap_std",
            )
            if f"norm.{key}" in state
        }
    }
    return {"params": params, "world_norm": world_norm}


# --- v1 family ------------------------------------------------------------

def _conv1d(state, key: str, transpose: bool = False):
    """torch Conv1d [out, in/g, k] -> flax kernel [k, in/g, out];
    ConvTranspose1d [in, out, k] -> time-flipped [k, in, out]."""
    w = state[f"{key}.weight"]
    if transpose:
        kernel = np.transpose(w, (2, 0, 1))[::-1].copy()
    else:
        kernel = np.transpose(w, (2, 1, 0))
    out = {"kernel": kernel}
    if f"{key}.bias" in state:
        out["bias"] = state[f"{key}.bias"]
    return out


def _bn(state, key: str):
    params = {"scale": state[f"{key}.weight"], "bias": state[f"{key}.bias"]}
    stats = {"mean": state[f"{key}.running_mean"],
             "var": state[f"{key}.running_var"]}
    return params, stats


def _inverted_residual(state, prefix: str):
    """torch InvertedResidual (voice100/models/asr.py:40-53):
    conv.0/.1 = ConvBNActivate (Sequential conv,bn,relu6), conv.2 =
    pw-linear conv, conv.3 = bn -> flax InvertedResidual children."""
    params: Dict[str, dict] = {}
    stats: Dict[str, dict] = {}
    for i in range(2):
        bn_p, bn_s = _bn(state, f"{prefix}.conv.{i}.1")
        params[f"ConvBNActivate_{i}"] = {
            "Conv_0": _conv1d(state, f"{prefix}.conv.{i}.0"),
            "BatchNorm_0": bn_p,
        }
        stats[f"ConvBNActivate_{i}"] = {"BatchNorm_0": bn_s}
    params["Conv_0"] = _conv1d(state, f"{prefix}.conv.2")
    bn_p, bn_s = _bn(state, f"{prefix}.conv.3")
    params["BatchNorm_0"] = bn_p
    stats["BatchNorm_0"] = bn_s
    return params, stats


def _ir_stack(state, prefixes):
    params: Dict[str, dict] = {}
    stats: Dict[str, dict] = {}
    for i, prefix in enumerate(prefixes):
        p, s = _inverted_residual(state, prefix)
        params[f"InvertedResidual_{i}"] = p
        stats[f"InvertedResidual_{i}"] = s
    return params, stats


def convert_asr_v1(state: Dict[str, np.ndarray], model) -> dict:
    """state_dict -> variables for models.AudioToTextCTC
    (encoder.layers.0-8 inverted residuals + decoder.layers.1 conv)."""
    enc_p, enc_s = _ir_stack(
        state, [f"encoder.layers.{i}" for i in range(9)]
    )
    params = {
        "ConvVoiceEncoder_0": enc_p,
        "Conv_0": _conv1d(state, "decoder.layers.1"),
    }
    return {"params": params,
            "batch_stats": {"ConvVoiceEncoder_0": enc_s}}


def convert_align_v1(state: Dict[str, np.ndarray], model) -> dict:
    """state_dict -> variables for models.AudioAlignCTC."""
    params = {
        "Conv_0": _conv1d(state, "conv"),
        "BiLSTM_0": _lstm_params(state, "lstm", model.num_layers),
        "Dense_0": _dense(state, "dense"),
    }
    return {"params": params}


def convert_ttsalign_v1(state: Dict[str, np.ndarray], model) -> dict:
    """state_dict -> variables for models.TextToAlignTextModel."""
    ir_p, ir_s = _ir_stack(state, [f"layers.{i}" for i in range(4)])
    params = {"Embed_0": {"embedding": state["embedding.weight"]}}
    params.update(ir_p)
    params["Conv_0"] = _conv1d(state, "layers.4")
    return {"params": params, "batch_stats": ir_s}


def _world_norm(state, model):
    """norm.* buffers -> world_norm collection; identity stats for any
    buffer absent from the checkpoint."""
    s, c = model.logspc_size, model.codeap_size
    defaults = {
        "f0_mean": np.zeros(1, np.float32),
        "f0_std": np.ones(1, np.float32),
        "logspc_mean": np.zeros(s, np.float32),
        "logspc_std": np.ones(s, np.float32),
        "codeap_mean": np.zeros(c, np.float32),
        "codeap_std": np.ones(c, np.float32),
    }
    return {
        "norm": {
            key: state.get(f"norm.{key}", default)
            for key, default in defaults.items()
        }
    }


def convert_ttsaudio_v1(state: Dict[str, np.ndarray], model) -> dict:
    """state_dict -> variables for models.AlignTextToAudioModel
    (VoiceDecoder: IR x4, ConvTranspose upsample, IR x3, 1x1 conv)."""
    ir1_p, ir1_s = _ir_stack(
        state, [f"decoder.layers.{i}" for i in range(4)]
    )
    ir2_p, ir2_s = _ir_stack(
        state, [f"decoder.layers.{i}" for i in (5, 6, 7)]
    )
    up = _conv1d(state, "decoder.layers.4", transpose=True)
    decoder_p = dict(ir1_p)
    decoder_p.update({
        f"InvertedResidual_{i + 4}": ir2_p[f"InvertedResidual_{i}"]
        for i in range(3)
    })
    decoder_p["up_kernel"] = up["kernel"]
    decoder_p["up_bias"] = up["bias"]
    decoder_p["Conv_0"] = _conv1d(state, "decoder.layers.8")
    decoder_s = dict(ir1_s)
    decoder_s.update({
        f"InvertedResidual_{i + 4}": ir2_s[f"InvertedResidual_{i}"]
        for i in range(3)
    })
    params = {
        "embedding": {"embedding": state["embedding.weight"]},
        "decoder": decoder_p,
    }
    return {
        "params": params,
        "batch_stats": {"decoder": decoder_s},
        "world_norm": _world_norm(state, model),
    }


def convert_ttsaudio_mt_v1(state: Dict[str, np.ndarray], model) -> dict:
    """state_dict -> variables for models.AlignTextToAudioMultiTaskModel
    (VoiceMultiTaskDecoder: layer1 IR x6, layer3 phone head,
    layer2 = upsample + IR x2 + 1x1 conv)."""
    ir1_p, ir1_s = _ir_stack(
        state, [f"decoder.layer1.{i}" for i in range(6)]
    )
    ir2_p, ir2_s = _ir_stack(
        state, [f"decoder.layer2.{i}" for i in (1, 2)]
    )
    up = _conv1d(state, "decoder.layer2.0", transpose=True)
    decoder_p = dict(ir1_p)
    decoder_p["Conv_0"] = _conv1d(state, "decoder.layer3")
    decoder_p.update({
        f"InvertedResidual_{i + 6}": ir2_p[f"InvertedResidual_{i}"]
        for i in range(2)
    })
    decoder_p["up_kernel"] = up["kernel"]
    decoder_p["up_bias"] = up["bias"]
    decoder_p["Conv_1"] = _conv1d(state, "decoder.layer2.3")
    decoder_s = dict(ir1_s)
    decoder_s.update({
        f"InvertedResidual_{i + 6}": ir2_s[f"InvertedResidual_{i}"]
        for i in range(2)
    })
    params = {
        "embedding": {"embedding": state["embedding.weight"]},
        "decoder": decoder_p,
    }
    return {
        "params": params,
        "batch_stats": {"decoder": decoder_s},
        "world_norm": _world_norm(state, model),
    }


def convert_state_dict(state: Dict[str, np.ndarray], model) -> dict:
    """Dispatch on model type over all eight reference architectures."""
    from ..models import (
        AudioToAlignText, TextToAlignText, AlignTextToAudio,
        AudioToTextCTC, AudioAlignCTC, TextToAlignTextModel,
        AlignTextToAudioModel, AlignTextToAudioMultiTaskModel,
    )

    if isinstance(model, AudioToAlignText):
        return convert_asr_v2(state, model)
    if isinstance(model, TextToAlignText):
        return convert_align_v2(state, model)
    if isinstance(model, AlignTextToAudio):
        return convert_tts_v2(state, model)
    if isinstance(model, AudioToTextCTC):
        return convert_asr_v1(state, model)
    if isinstance(model, AudioAlignCTC):
        return convert_align_v1(state, model)
    if isinstance(model, TextToAlignTextModel):
        return convert_ttsalign_v1(state, model)
    if isinstance(model, AlignTextToAudioMultiTaskModel):
        return convert_ttsaudio_mt_v1(state, model)
    if isinstance(model, AlignTextToAudioModel):
        return convert_ttsaudio_v1(state, model)
    raise ValueError(f"no converter for {type(model).__name__}")


def cli_main(argv=None) -> None:
    """Convert a reference .ckpt into an orbax checkpoint directory."""
    from argparse import ArgumentParser

    from ..training.cli import load_config, build_from_config

    parser = ArgumentParser()
    parser.add_argument("--config", required=True,
                        help="matching config YAML (defines the model)")
    parser.add_argument("--ckpt_path", required=True,
                        help="reference .ckpt (torch pickle)")
    parser.add_argument("--output", required=True,
                        help="orbax checkpoint directory to write")
    args = parser.parse_args(argv)

    model, _, _, _ = build_from_config(load_config(args.config), {})
    state = load_torch_state_dict(args.ckpt_path)
    try:
        variables = convert_state_dict(state, model)
    except ValueError as e:
        raise SystemExit(str(e))

    import os

    import orbax.checkpoint as ocp

    variables = dict(variables)
    params = variables.pop("params")
    tree = {
        "params": params,
        "extra": variables,
        "opt_state": {},
        "meta": {
            "step": np.asarray(0),
            "epoch": np.asarray(0),
            "best_monitor": np.asarray(float("inf")),
        },
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.output), tree, force=True)
    ckptr.wait_until_finished()
    print(f"[import-torch] wrote {args.output}")


if __name__ == "__main__":
    cli_main()
