"""Checkpoint save/restore (orbax).

The framework's replacement for Lightning ModelCheckpoint +
``load_from_checkpoint`` (reference config/asr_en_base.yaml:5-11,
voice100/align_text.py:27). State is a pytree of params, extra variable
collections, optimizer state, and counters.
"""

from __future__ import annotations

import dataclasses
import os
import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "restore_checkpoint", "load_variables"]


def _state_to_tree(state) -> dict:
    return {
        "params": state.params,
        "extra": state.extra,
        "opt_state": state.opt_state,
        "meta": {
            "step": np.asarray(state.step),
            "epoch": np.asarray(state.epoch),
            "best_monitor": np.asarray(state.best_monitor),
        },
    }


def save_checkpoint(path: str, state) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    tree = jax.tree_util.tree_map(np.asarray, _state_to_tree(state))
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, state):
    """Restore into an existing TrainState-shaped object."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = jax.tree_util.tree_map(np.asarray, _state_to_tree(state))
    tree = ckptr.restore(path, template)
    return dataclasses.replace(
        state,
        params=tree["params"],
        extra=tree["extra"],
        opt_state=tree["opt_state"],
        step=int(tree["meta"]["step"]),
        epoch=int(tree["meta"]["epoch"]),
        best_monitor=float(tree["meta"]["best_monitor"]),
    )


def merge_world_stats(variables: dict, stat_path: str) -> dict:
    """Overwrite WORLDNorm statistics in a variables dict from a
    calc-stat ``.npz`` (keys f0_mean/f0_std/logspc_*/codeap_*) — the
    analogue of the reference's ``norm.load_state_dict(torch.load(...))``
    (voice100/models/_tts_v2.py:44-45). Reference ``{ds}-stat.pt``
    torch state dicts (voice100/calc_stat.py:59-68) load as-is, so
    migrated corpora keep their statistics files."""
    if stat_path.endswith((".pt", ".pth", ".ckpt")):
        import torch

        raw = torch.load(stat_path, map_location="cpu")
        stats = {
            k: np.asarray(v) for k, v in raw.items()
            if hasattr(v, "__array__") or hasattr(v, "numpy")
        }
    else:
        stats = dict(np.load(stat_path))
    wn = variables.get("world_norm")
    if wn is None:
        return variables
    target = wn.get("norm", wn)
    for key in list(target):
        if key in stats:
            target[key] = (
                stats[key].astype(np.float32).reshape(np.shape(target[key]))
            )
    return variables


def load_variables(path: str) -> dict:
    """Load just the model variables ({'params': ..., **extra}) from a
    checkpoint — the analogue of ``Model.load_from_checkpoint``."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(path)
    variables = {"params": tree["params"]}
    variables.update(tree.get("extra") or {})
    return variables
