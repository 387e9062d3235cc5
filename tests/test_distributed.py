"""REAL multi-process data-parallel training.

Everything multi-process elsewhere in the suite runs simulated (two
loader configs in one interpreter). These tests spawn actual OS
processes joined by ``jax.distributed.initialize`` over a local
coordinator — the round-4 verdict's unexercised code paths: coordinator
wiring through the CLI (``--distributed --coordinator_address ...``),
per-process loader slices feeding ``host_local_array_to_global_array``,
cross-process orbax checkpointing, and restore with a non-zero
``process_index``.

The loader's contiguous block slicing (data/loader.py
_epoch_index_chunks) makes the process-concatenated global batch equal
the single-process batch in exact row order, so the 2-process
trajectory must match a 1-process run at the global batch size — that
equality is the end-to-end assertion here. (Reference scope: the
upstream trainer is single-device Lightning, SURVEY §2.4; multi-host DP
is this framework's TPU-pod design.)
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from corpus_fixture import make_dummy_corpus  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIG = """\
seed_everything: 1234
trainer:
  max_epochs: 2
  gradient_clip_val: 1.0
model:
  class_path: voice100_tpu.models.AudioToAlignText
  init_args:
    vocab_size: 29
    audio_size: 64
    encoder_settings: [[16, false, 3, 2, 1, false]]
    decoder_num_layers: 1
    decoder_hidden_size: 16
data:
  class_path: voice100_tpu.data.AudioTextDataModule
  init_args:
    vocoder: mel
    dataset: dummy_en
    language: en
    batch_size: {batch_size}
    valid_ratio: 0.25
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    # same static collate extents on every host (multi-process batches
    # must agree on the global shape) — conftest already pins these,
    # restate for clarity/robustness under bare invocation
    env["VOICE100_TPU_TIME_BUCKET"] = "128"
    env["VOICE100_TPU_TEXT_BUCKET"] = "48"
    return env


def _fit_args(cfg, data_dir, cache_dir, ckpt_dir, log_path, **extra):
    args = [
        sys.executable, "-m", "voice100_tpu", "fit",
        "--config", cfg, "--data_dir", data_dir,
        "--cache_dir", cache_dir, "--checkpoint_dir", ckpt_dir,
        "--log_path", log_path, "--platform", "cpu",
    ]
    for k, v in extra.items():
        args += [f"--{k}", str(v)]
    return args


def _run_pair(cfg, data_dir, cache_dir, ckpt_dir, log_path, port,
              **extra):
    """Two coordinator-joined fit processes; returns their outputs."""
    procs = []
    for pid in range(2):
        args = _fit_args(
            cfg, data_dir, cache_dir, ckpt_dir, log_path, **extra
        )
        args += [
            "--distributed",
            "--coordinator_address", f"localhost:{port}",
            "--num_processes", "2", "--process_id", str(pid),
        ]
        procs.append(subprocess.Popen(
            args, cwd=REPO, env=_env(2),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    outs = []
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, (
            f"process {pid} failed:\n{out[-4000:]}"
        )
    return outs


def _restore_tree(path):
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    """2 OS processes x 2 virtual CPU devices, global batch 4 == one
    process at batch 4 over 4 devices: identical 'last' checkpoints
    (exact global batch row order + same per-step RNG splits), then a
    real multi-process restore continues from the saved epoch."""
    data_dir = str(tmp_path / "data")
    make_dummy_corpus(data_dir, n_clips=8, seed=5)
    cache_dir = str(tmp_path / "cache")
    cfg2 = str(tmp_path / "dp2.yaml")
    with open(cfg2, "w") as f:
        f.write(CONFIG.format(batch_size=2))  # per-process -> global 4
    cfg1 = str(tmp_path / "dp1.yaml")
    with open(cfg1, "w") as f:
        f.write(CONFIG.format(batch_size=4))

    # warm the disk feature cache once so the two coordinator-joined
    # processes never race on writing the same cache file
    warm = subprocess.run(
        _fit_args(cfg1, data_dir, cache_dir,
                  str(tmp_path / "ckpt_warm"),
                  str(tmp_path / "warm.jsonl"), max_epochs=1),
        cwd=REPO, env=_env(4), capture_output=True, text=True,
        timeout=900,
    )
    assert warm.returncode == 0, warm.stdout + warm.stderr

    # single-process reference at the global batch size
    single = subprocess.run(
        _fit_args(cfg1, data_dir, cache_dir,
                  str(tmp_path / "ckpt_1p"),
                  str(tmp_path / "fit_1p.jsonl")),
        cwd=REPO, env=_env(4), capture_output=True, text=True,
        timeout=900,
    )
    assert single.returncode == 0, single.stdout + single.stderr

    # the real thing: 2 processes, one coordinator
    ckpt2 = str(tmp_path / "ckpt_2p")
    log2 = str(tmp_path / "fit_2p.jsonl")
    outs = _run_pair(cfg2, data_dir, cache_dir, ckpt2, log2,
                     _free_port())
    assert "processes=2" in outs[0]

    with open(log2) as f:
        records = [json.loads(line) for line in f]
    start = [r for r in records if r.get("event") == "fit_start"]
    assert start and start[0]["processes"] == 2
    assert start[0]["devices"] == 4
    # per-epoch records carry val loss/CER from the multi-process eval
    epochs = [r for r in records if "train_time_s" in r]
    assert len(epochs) == 2 and "val_cer" in epochs[-1]

    tree_1p = _restore_tree(str(tmp_path / "ckpt_1p" / "last"))
    tree_2p = _restore_tree(os.path.join(ckpt2, "last"))
    assert int(tree_2p["meta"]["epoch"]) == 2
    flat1 = jax_leaves(tree_1p["params"])
    flat2 = jax_leaves(tree_2p["params"])
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)

    # real multi-process restore: continue to epoch 3 from 'last'
    outs = _run_pair(cfg2, data_dir, cache_dir, ckpt2, log2,
                     _free_port(), max_epochs=3,
                     restore_from=os.path.join(ckpt2, "last"))
    resumed = _restore_tree(os.path.join(ckpt2, "last"))
    assert int(resumed["meta"]["epoch"]) == 3
    assert int(resumed["meta"]["step"]) > int(tree_2p["meta"]["step"])


def jax_leaves(tree):
    import jax

    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]
