"""Unified YAML CLI: ``voice100-tpu fit --config config/asr_en_base.yaml``.

Drop-in surface for the reference's LightningCLI entry point
(voice100/main.py:8-13): configs carry ``seed_everything``, ``trainer``
(max_epochs, gradient_clip_val, ModelCheckpoint callback), and
``model``/``data`` sections with ``class_path`` + ``init_args``.
Reference class paths (``voice100.models.*``,
``voice100.data_modules.*``) are accepted and mapped onto this
framework's classes, so the reference's own config files run unchanged.
"""

from __future__ import annotations

import argparse
import os
from typing import Any, Dict

import yaml

from .. import models as _models
from ..data import datamodule as _datamodules
from .trainer import Trainer, TrainerConfig

__all__ = ["cli_main", "build_from_config", "load_config"]

_MODEL_CLASSES = {
    name: getattr(_models, name) for name in _models.__all__
}
_DATA_CLASSES = {
    "AudioTextDataModule": _datamodules.AudioTextDataModule,
    "AlignTextDataModule": _datamodules.AlignTextDataModule,
}


def _resolve_class(class_path: str, table: Dict[str, Any]):
    name = class_path.rsplit(".", 1)[-1]
    if name not in table:
        raise ValueError(f"Unknown class_path {class_path!r}")
    return table[name]


def _filter_kwargs(cls, kwargs: Dict[str, Any]) -> Dict[str, Any]:
    """Drop reference-only kwargs our constructors don't take and
    normalize list-valued settings to tuples."""
    import dataclasses
    import inspect

    if dataclasses.is_dataclass(cls):
        accepted = {f.name for f in dataclasses.fields(cls)}
    else:
        accepted = set(inspect.signature(cls.__init__).parameters)
    out = {}
    dropped = []
    for k, v in kwargs.items():
        if k in accepted:
            if isinstance(v, list):
                v = tuple(tuple(e) if isinstance(e, list) else e for e in v)
            out[k] = v
        else:
            dropped.append(k)
    if dropped:
        print(f"[cli] note: ignoring config keys {dropped} for "
              f"{cls.__name__}")
    return out


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def build_from_config(config: Dict[str, Any], overrides: Dict[str, Any]):
    """Instantiate (model, datamodule, trainer_config) from a config."""
    model_cfg = config["model"]
    data_cfg = config["data"]
    model_cls = _resolve_class(model_cfg["class_path"], _MODEL_CLASSES)
    data_cls = _resolve_class(data_cfg["class_path"], _DATA_CLASSES)

    model_kwargs = dict(model_cfg.get("init_args") or {})
    # the reference TTS config points at a torch stat file; WORLD stats
    # load separately in this framework (tools/calc_stat emits .npz)
    audio_stat = model_kwargs.pop("audio_stat", None)
    model = model_cls(**_filter_kwargs(model_cls, model_kwargs))
    data_kwargs = dict(data_cfg.get("init_args") or {})
    data_kwargs.update(
        {k: v for k, v in overrides.items() if k in ("data_dir", "cache_dir",
                                                     "batch_size")}
    )
    data = data_cls(**_filter_kwargs(data_cls, data_kwargs))

    # Fail fast on model/data size mismatches: out-of-range labels make
    # the CTC loss silently nan (the reference v1 CLIs avoid this by
    # passing vocab_size=data.vocab_size, train_asr.py:29-32; the v2
    # YAML path trusts the config and can disagree with the tokenizer).
    # audio_size is only a shared contract for audio-INPUT (CTC) models;
    # TTS models reuse the name for their output width (2*f0 + logspc +
    # 2*codeap, reference models/_tts_v2.py:34), which legitimately
    # differs from the data feature width.
    checks = ["vocab_size"]
    if hasattr(model, "ctc_best_path") or hasattr(model, "greedy_decode"):
        checks.append("audio_size")
    for attr in checks:
        m_val = getattr(model, attr, None)
        d_val = getattr(data, attr, None)
        if m_val is not None and d_val is not None and m_val != d_val:
            raise SystemExit(
                f"[cli] model.{attr}={m_val} does not match "
                f"data.{attr}={d_val} (language/use_phone/vocoder "
                f"determine the data side); fix the config's "
                f"model.init_args.{attr}"
            )

    trainer_cfg = config.get("trainer") or {}
    monitor = "val_loss"
    every_n = 10
    for cb in trainer_cfg.get("callbacks") or []:
        init = cb.get("init_args") or {}
        monitor = init.get("monitor", monitor)
        every_n = init.get("every_n_epochs", every_n)
    tc = TrainerConfig(
        max_epochs=int(
            overrides.get("max_epochs")
            or trainer_cfg.get("max_epochs", 1)
        ),
        gradient_clip_val=float(trainer_cfg.get("gradient_clip_val", 1.0)),
        monitor=monitor,
        every_n_epochs=every_n,
        seed=int(config.get("seed_everything", 1234)),
        checkpoint_dir=overrides.get("checkpoint_dir"),
        log_path=overrides.get("log_path"),
        mesh_model_axis=int(overrides.get("mesh_model_axis", 1)),
        precision=str(
            overrides.get("precision")
            or trainer_cfg.get("precision", "32")
        ),
    )
    # remaining trainer keys pass straight through to matching
    # TrainerConfig fields (e.g. device_cache, upload_dtype,
    # log_every_n_steps); non-matching keys — Lightning knobs like
    # accelerator/devices in reference configs — keep being ignored
    import dataclasses

    handled = {"max_epochs", "gradient_clip_val", "callbacks",
               "precision"}
    fields = {f.name: f.type for f in dataclasses.fields(TrainerConfig)}
    for key, val in trainer_cfg.items():
        if key in handled or key not in fields:
            continue
        setattr(tc, key, val)
    return model, data, tc, audio_stat


def _run_predict(model, variables, data, loader, output: str) -> None:
    """``predict`` subcommand (reference LightningCLI surface,
    voice100/main.py:8-13): run the model's predict surface over the
    predict dataloader and write the results.

    CTC models write greedy transcripts (one line per clip); the
    duration model writes per-token durations; the TTS acoustic models
    write WORLD features. Padding rows from the final batch are
    excluded via the loader's real counts.
    """
    import jax
    import numpy as np

    from ..models import (
        TextToAlignText, TextToAlignTextModel,
        AlignTextToAudio, AlignTextToAudioModel,
        AlignTextToAudioMultiTaskModel,
    )
    from .trainer import Trainer

    if hasattr(type(model), "greedy_decode"):
        tokenizer = data.text_transform

        @jax.jit
        def step(audio, audio_len):
            return model.apply(
                variables, audio, audio_len,
                method=type(model).greedy_decode,
            )

        path = output if output.endswith(".txt") else output + ".txt"
        n = 0
        with open(path, "w", encoding="utf-8") as f:
            for batch, n_real in Trainer._iter_counted(loader):
                (audio, audio_len), _ = batch
                ids, out_len = step(audio, audio_len)
                ids, out_len = np.asarray(ids), np.asarray(out_len)
                for i in range(n_real):
                    hyp = tokenizer.merge_repeated(
                        tokenizer.decode(ids[i, : int(out_len[i])])
                    )
                    f.write(hyp + "\n")
                    n += 1
        print(f"[predict] wrote {n} transcripts to {path}")
        return

    path = output if output.endswith(".npz") else output + ".npz"
    if isinstance(model, (TextToAlignText, TextToAlignTextModel)):

        @jax.jit
        def step(text, text_len):
            if isinstance(model, TextToAlignText):
                return model.apply(
                    variables, text, text_len,
                    method=TextToAlignText.predict,
                )
            y = model.apply(variables, text, True)
            return jax.numpy.exp(y) - 1.0

        durations = []
        for batch, n_real in Trainer._iter_counted(loader):
            (text, text_len), *_ = batch
            pred = np.asarray(step(text, text_len))
            for i in range(n_real):
                durations.append(pred[i, : int(text_len[i])])
        np.savez(path, durations=np.asarray(durations, dtype=object))
        print(f"[predict] wrote durations for {len(durations)} texts "
              f"to {path}")
        return

    if isinstance(model, (AlignTextToAudio, AlignTextToAudioModel,
                          AlignTextToAudioMultiTaskModel)):

        @jax.jit
        def step(aligntext, aligntext_len):
            if isinstance(model, AlignTextToAudio):
                return model.apply(
                    variables, aligntext, aligntext_len,
                    method=AlignTextToAudio.predict,
                )
            out = model.apply(
                variables, aligntext, method=type(model).predict
            )
            return out[:3]

        f0s, logspcs, codeaps = [], [], []
        for batch, n_real in Trainer._iter_counted(loader):
            aligntext, aligntext_len = batch[-1]
            f0, logspc, codeap = (
                np.asarray(v) for v in step(aligntext, aligntext_len)
            )
            out_len = np.asarray(model.output_length(aligntext_len)) if (
                hasattr(model, "output_length")
            ) else 2 * np.asarray(aligntext_len)
            for i in range(n_real):
                m = int(out_len[i])
                f0s.append(f0[i, :m])
                logspcs.append(logspc[i, :m])
                codeaps.append(codeap[i, :m])
        np.savez(
            path,
            f0=np.asarray(f0s, dtype=object),
            logspc=np.asarray(logspcs, dtype=object),
            codeap=np.asarray(codeaps, dtype=object),
        )
        print(f"[predict] wrote WORLD features for {len(f0s)} clips "
              f"to {path}")
        return

    raise SystemExit(f"predict is not supported for {type(model).__name__}")


def cli_main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="voice100-tpu")
    parser.add_argument(
        "subcommand", choices=["fit", "validate", "test", "predict"],
    )
    parser.add_argument("--config", required=True)
    parser.add_argument(
        "--output", type=str, default=None,
        help="predict: output path (.txt for CTC transcripts, .npz for "
             "duration/TTS features)",
    )
    parser.add_argument("--max_epochs", type=int, default=None)
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--cache_dir", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--checkpoint_dir", type=str, default=None)
    parser.add_argument("--restore_from", type=str, default=None)
    parser.add_argument("--log_path", type=str, default=None)
    parser.add_argument("--audio_stat", type=str, default=None)
    parser.add_argument("--mesh_model_axis", type=int, default=1)
    parser.add_argument(
        "--precision", type=str, default=None,
        help="32 (default) or 16/bf16: bfloat16 recurrent matmuls with "
             "f32 master weights (reference --trainer.precision 16)",
    )
    parser.add_argument(
        "--platform", type=str, default=None,
        help="force a jax platform (e.g. cpu); useful because this "
             "machine's sitecustomize pre-registers the TPU backend",
    )
    parser.add_argument(
        "--distributed", action="store_true",
        help="multi-host pod training: call jax.distributed.initialize()"
             " before touching devices (coordinator/process settings come"
             " from the TPU pod environment, or from the three flags"
             " below for a manual cluster); the data loader then shards"
             " batches per process and the mesh spans all hosts' chips",
    )
    parser.add_argument(
        "--coordinator_address", type=str, default=None,
        help="with --distributed: host:port of process 0's coordinator"
             " (omit on TPU pods, where JAX auto-detects it)",
    )
    parser.add_argument(
        "--num_processes", type=int, default=None,
        help="with --distributed: total process count for a manual"
             " (non-pod) cluster",
    )
    parser.add_argument(
        "--process_id", type=int, default=None,
        help="with --distributed: this process's index in a manual"
             " (non-pod) cluster",
    )
    args = parser.parse_args(argv)

    if args.platform:
        import jax

        # before distributed init: a CPU cluster must not let this
        # machine's sitecustomize-registered TPU plugin win the backend
        jax.config.update("jax_platforms", args.platform)
    if args.distributed:
        import jax

        # must run before any backend query; each host then sees the
        # global device set and the DataLoader splits work by
        # jax.process_index() (data/loader.py)
        jax.distributed.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    overrides = {
        k: v
        for k, v in vars(args).items()
        if v is not None and k not in (
            "subcommand", "config", "distributed",
            "coordinator_address", "num_processes", "process_id",
        )
    }
    config = load_config(args.config)
    model, data, tc, audio_stat = build_from_config(config, overrides)
    audio_stat = args.audio_stat or audio_stat
    if tc.checkpoint_dir is None:
        base = os.path.splitext(os.path.basename(args.config))[0]
        tc.checkpoint_dir = os.path.join("checkpoints", base)

    trainer = Trainer(tc)
    if args.subcommand == "fit":
        init_variables = None
        if audio_stat and os.path.exists(audio_stat):
            # initialize first so stats merge into fresh variables
            import jax

            data.setup("fit")
            loader = data.train_dataloader()
            from .tasks import make_task

            task = make_task(model)
            init_variables = task.init(
                jax.random.PRNGKey(tc.seed), next(iter(loader))
            )
            init_variables = dict(init_variables)
            from .checkpoint import merge_world_stats

            init_variables = merge_world_stats(init_variables, audio_stat)
        trainer.fit(
            model, data,
            restore_from=args.restore_from,
            init_variables=init_variables,
        )
    else:
        ckpt = args.restore_from or os.path.join(tc.checkpoint_dir, "best")
        if not os.path.isdir(ckpt):
            ckpt = os.path.join(tc.checkpoint_dir, "last")
        if not os.path.isdir(ckpt):
            raise SystemExit(
                f"no checkpoint found under {tc.checkpoint_dir}; "
                "pass --restore_from"
            )
        from .checkpoint import load_variables
        from .tasks import make_task
        from .trainer import TrainState

        variables = dict(load_variables(ckpt))
        params = variables.pop("params")
        state = TrainState(params=params, extra=variables, opt_state=None)
        if args.subcommand == "predict":
            data.setup("predict")
            loader = data.predict_dataloader()
            base = os.path.splitext(os.path.basename(args.config))[0]
            _run_predict(
                model, {"params": state.params, **state.extra},
                data, loader, args.output or f"{base}-predictions",
            )
            return
        stage = "test" if args.subcommand == "test" else "fit"
        if stage == "fit":
            # validate: run the val split of the fit stage
            data.setup("fit")
            loader = data.val_dataloader()
        else:
            data.setup("test")
            loader = data.test_dataloader()
        task = make_task(model)
        _, eval_step = trainer._make_step_fns(task, task.make_optimizer(1))
        if trainer.mesh is None:
            from ..parallel.mesh import fit_mesh_for_batch

            trainer.mesh = fit_mesh_for_batch(data.batch_size)
        metrics = trainer.evaluate(eval_step, state, loader)
        rates = trainer._val_cer(model, data, state, loader)
        if rates is not None:
            metrics.update(rates)
        prefix = "test" if args.subcommand == "test" else "val"
        print(
            " ".join(f"{prefix}_{k}={v:.4f}" for k, v in metrics.items())
        )


if __name__ == "__main__":
    cli_main()
