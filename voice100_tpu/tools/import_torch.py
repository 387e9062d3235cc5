"""Import reference (PyTorch Lightning) checkpoints into this framework.

The reference distributes pretrained ``.ckpt`` files (torch pickles with
a ``state_dict``, /root/reference/README.md:295-324). Weight layouts
here were chosen to be cross-loadable (torch LSTM gate order, torch
conv length semantics), so conversion is pure renaming + transposes:

  v2 ASR   (AudioToAlignText, voice100/models/_asr_v2.py:20-38)
  v2 align (TextToAlignText,  voice100/models/_align_v2.py:14-23)
  v2 TTS   (AlignTextToAudio, voice100/models/_tts_v2.py:14-45)

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
    "convert_asr_v2",
    "convert_align_v2",
    "convert_tts_v2",
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


def cli_main(argv=None) -> None:
    """Convert a reference .ckpt into an orbax checkpoint directory."""
    from argparse import ArgumentParser

    from ..models import AudioToAlignText, TextToAlignText, AlignTextToAudio
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
    if isinstance(model, AudioToAlignText):
        variables = convert_asr_v2(state, model)
    elif isinstance(model, TextToAlignText):
        variables = convert_align_v2(state, model)
    elif isinstance(model, AlignTextToAudio):
        variables = convert_tts_v2(state, model)
    else:
        raise SystemExit(f"no converter for {type(model).__name__}")

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
