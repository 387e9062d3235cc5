"""v1 argparse training CLIs (deprecated model family).

Parity with the reference console scripts train_asr / train_align /
train_ttsalign / train_ttsaudio / train_ttsaudio_mt
(voice100/train_*.py): argparse args compose datamodule + model +
trainer flags, seed 1234, gradient clip 1.0, checkpoint every 10 epochs.
Note: the reference also declares voice100-train-ttsaudio-v2 pointing at
a module that does not exist (pyproject.toml:21); v2 training here, as
there, goes through the unified ``fit`` CLI.
"""

from __future__ import annotations

import os
from argparse import ArgumentParser


from ..data import AudioTextDataModule, AlignTextDataModule
from ..training import Trainer, TrainerConfig

__all__ = [
    "asr_cli_main",
    "align_cli_main",
    "ttsalign_cli_main",
    "ttsaudio_cli_main",
    "ttsaudio_mt_cli_main",
]


def _common_parser(vocoder_default: str) -> ArgumentParser:
    parser = ArgumentParser()
    parser.add_argument("--dataset", default="ljspeech")
    parser.add_argument("--language", default="en")
    parser.add_argument("--vocoder", default=vocoder_default)
    parser.add_argument("--sample_rate", type=int, default=16000)
    parser.add_argument("--use_phone", action="store_true")
    parser.add_argument("--data_dir", default="./data")
    parser.add_argument("--cache_dir", default="./cache")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--max_epochs", type=int, default=100)
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--hidden_size", type=int, default=None)
    parser.add_argument("--checkpoint_dir", default=None)
    parser.add_argument("--resume_from_checkpoint", default=None)
    parser.add_argument("--audio_stat", default=None)
    return parser


def _trainer(args, name: str, monitor: str) -> Trainer:
    ckpt = args.checkpoint_dir or os.path.join("checkpoints", name)
    return Trainer(
        TrainerConfig(
            max_epochs=args.max_epochs,
            gradient_clip_val=1.0,
            checkpoint_dir=ckpt,
            monitor=monitor,
            every_n_epochs=10,
            seed=1234,
        )
    )


def asr_cli_main(argv=None) -> None:
    """v1 conv-CTC ASR (reference voice100/train_asr.py)."""
    from ..models import AudioToTextCTC

    parser = _common_parser("mel")
    parser.add_argument("--embed_size", type=int, default=512)
    parser.add_argument("--weight_decay", type=float, default=4e-5)
    args = parser.parse_args(argv)
    data = AudioTextDataModule(
        vocoder="mel", dataset=args.dataset, language=args.language,
        sample_rate=args.sample_rate, use_phone=args.use_phone,
        data_dir=args.data_dir, cache_dir=args.cache_dir,
        batch_size=args.batch_size,
    )
    model = AudioToTextCTC(
        audio_size=data.audio_size,
        vocab_size=data.vocab_size,
        embed_size=args.embed_size,
        hidden_size=args.hidden_size or 512,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
    )
    _trainer(args, "asr_v1", "val_loss").fit(
        model, data, restore_from=args.resume_from_checkpoint
    )


def align_cli_main(argv=None) -> None:
    """v1 biLSTM forced aligner (reference voice100/train_align.py)."""
    from ..models import AudioAlignCTC

    parser = _common_parser("mel")
    args = parser.parse_args(argv)
    data = AudioTextDataModule(
        vocoder="mel", dataset=args.dataset, language=args.language,
        sample_rate=args.sample_rate, use_phone=args.use_phone,
        data_dir=args.data_dir, cache_dir=args.cache_dir,
        batch_size=args.batch_size,
    )
    model = AudioAlignCTC(
        audio_size=data.audio_size,
        vocab_size=data.vocab_size,
        hidden_size=args.hidden_size or 128,
        num_layers=2,
        learning_rate=args.learning_rate,
    )
    _trainer(args, "align_v1", "val_loss").fit(
        model, data, restore_from=args.resume_from_checkpoint
    )


def ttsalign_cli_main(argv=None) -> None:
    """v1 conv duration model (reference voice100/train_ttsalign.py)."""
    from ..models import TextToAlignTextModel

    parser = _common_parser("mel")
    args = parser.parse_args(argv)
    data = AlignTextDataModule(
        data_dir=args.data_dir, dataset=args.dataset,
        language=args.language, use_phone=args.use_phone,
        batch_size=args.batch_size,
    )
    model = TextToAlignTextModel(
        vocab_size=data.vocab_size,
        hidden_size=args.hidden_size or 512,
        learning_rate=args.learning_rate,
    )
    _trainer(args, "ttsalign_v1", "val_loss").fit(
        model, data, restore_from=args.resume_from_checkpoint
    )


def _fit_ttsaudio(args, model_cls, name: str, use_target: bool) -> None:
    import jax
    from ..training.tasks import make_task

    data = AudioTextDataModule(
        vocoder=args.vocoder, dataset=args.dataset,
        language=args.language, sample_rate=args.sample_rate,
        use_align=True, use_phone=args.use_phone, use_target=use_target,
        data_dir=args.data_dir, cache_dir=args.cache_dir,
        batch_size=args.batch_size,
    )
    kwargs = dict(
        vocab_size=data.vocab_size,
        hidden_size=args.hidden_size or 512,
        use_mcep=args.vocoder == "world_mcep",
        learning_rate=args.learning_rate,
    )
    if use_target:
        kwargs["target_vocab_size"] = data.target_vocab_size
    model = model_cls(**kwargs)
    trainer = _trainer(args, name, "val_loss")

    init_variables = None
    stat_path = args.audio_stat or os.path.join(
        args.data_dir, f"{args.dataset}-stat.npz"
    )
    if not args.resume_from_checkpoint and os.path.exists(stat_path):
        data.setup("fit")
        task = make_task(model)
        batch = next(iter(data.train_dataloader()))
        init_variables = dict(task.init(jax.random.PRNGKey(1234), batch))
        from ..training.checkpoint import merge_world_stats

        init_variables = merge_world_stats(init_variables, stat_path)
    trainer.fit(
        model, data,
        restore_from=args.resume_from_checkpoint,
        init_variables=init_variables,
    )


def ttsaudio_cli_main(argv=None) -> None:
    """v1 acoustic model (reference voice100/train_ttsaudio.py)."""
    from ..models import AlignTextToAudioModel

    parser = _common_parser("world")
    args = parser.parse_args(argv)
    _fit_ttsaudio(args, AlignTextToAudioModel, "ttsaudio_v1", False)


def ttsaudio_mt_cli_main(argv=None) -> None:
    """v1 multi-task acoustic model
    (reference voice100/train_ttsaudio_mt.py)."""
    from ..models import AlignTextToAudioMultiTaskModel

    parser = _common_parser("world")
    args = parser.parse_args(argv)
    _fit_ttsaudio(
        args, AlignTextToAudioMultiTaskModel, "ttsaudio_mt_v1", True
    )


if __name__ == "__main__":
    asr_cli_main()
