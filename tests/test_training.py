"""End-to-end training slice over the dummy corpus (SURVEY.md §7 step 5).

Exercises: mel frontend -> conv+biLSTM AudioToAlignText -> CTC loss under
the jitted data-parallel train step -> greedy decode, plus checkpoint
save/restore and the duration model's training path.
"""

import os

import numpy as np
import pytest

from corpus_fixture import make_dummy_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("data"))
    make_dummy_corpus(data_dir, n_clips=8)
    return data_dir


TINY_ENC = ((32, False, 3, 2, 1, False), (32, False, 3, 1, 1, False))


def _tiny_asr():
    from voice100_tpu.models import AudioToAlignText

    return AudioToAlignText(
        audio_size=64,
        vocab_size=29,
        encoder_settings=TINY_ENC,
        decoder_num_layers=1,
        decoder_hidden_size=32,
        learning_rate=1e-3,
    )


def test_asr_training_loop_and_checkpoint(corpus, tmp_path):
    from voice100_tpu.data import AudioTextDataModule
    from voice100_tpu.training import Trainer, TrainerConfig
    from voice100_tpu.training.checkpoint import (
        restore_checkpoint, load_variables,
    )

    data = AudioTextDataModule(
        vocoder="mel",
        dataset="dummy_en",
        data_dir=corpus,
        cache_dir=str(tmp_path / "cache"),
        batch_size=4,
        valid_ratio=0.25,
    )
    ckpt_dir = str(tmp_path / "ckpt")
    trainer = Trainer(
        TrainerConfig(
            max_epochs=3,
            checkpoint_dir=ckpt_dir,
            every_n_epochs=2,
            log_every_n_steps=1,
            monitor="val_loss",
        )
    )
    model = _tiny_asr()
    state = trainer.fit(model, data)
    assert state.step == 3 * 2  # 6 train samples / bs 4 -> 2 steps/epoch
    assert os.path.isdir(os.path.join(ckpt_dir, "last"))
    assert os.path.isdir(os.path.join(ckpt_dir, "best"))
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_2"))

    # restore round-trips exactly
    restored = restore_checkpoint(os.path.join(ckpt_dir, "last"), state)
    a = np.concatenate(
        [np.ravel(x) for x in __import__("jax").tree_util.tree_leaves(
            state.params)]
    )
    b = np.concatenate(
        [np.ravel(np.asarray(x))
         for x in __import__("jax").tree_util.tree_leaves(restored.params)]
    )
    np.testing.assert_allclose(a, b)

    # load_variables gives apply-ready variables
    variables = load_variables(os.path.join(ckpt_dir, "last"))
    batch = next(iter(data.val_dataloader()))
    (audio, audio_len), _ = batch
    import jax.numpy as jnp
    from voice100_tpu.models import AudioToAlignText

    ids, out_len = model.apply(
        variables, jnp.asarray(audio), jnp.asarray(audio_len),
        method=AudioToAlignText.greedy_decode,
    )
    assert ids.shape[0] == audio.shape[0]


def test_asr_loss_decreases(corpus, tmp_path):
    """Overfit 4 clips: train loss must drop substantially."""
    import jax
    from voice100_tpu.data import AudioTextDataModule
    from voice100_tpu.training import make_task
    import optax

    data = AudioTextDataModule(
        vocoder="mel", dataset="dummy_en", data_dir=corpus,
        cache_dir=str(tmp_path / "cache2"), batch_size=4, valid_ratio=0.0,
    )
    data.setup("fit")
    batch = next(iter(data.train_dataloader()))

    model = _tiny_asr()
    task = make_task(model)
    variables = dict(task.init(jax.random.PRNGKey(0), batch))
    params = variables.pop("params")
    extra = variables
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            loss, _, _ = task.loss(p, extra, batch, rng, train=False)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(0)
    first = None
    for i in range(30):
        rng, k = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, k)
        if first is None:
            first = float(loss)
    last = float(loss)
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first * 0.7, (first, last)


def test_align_model_training(corpus, tmp_path):
    from voice100_tpu.data import AlignTextDataModule
    from voice100_tpu.models import TextToAlignText
    from voice100_tpu.training import Trainer, TrainerConfig

    data = AlignTextDataModule(
        data_dir=corpus, dataset="dummy_en", batch_size=4, valid_ratio=0.25
    )
    model = TextToAlignText(vocab_size=29, hidden_size=16, num_layers=1)
    trainer = Trainer(
        TrainerConfig(max_epochs=2, monitor="train_loss",
                      checkpoint_dir=str(tmp_path / "ckpt"))
    )
    state = trainer.fit(model, data)
    assert state.step > 0


def test_cli_fit_smoke(corpus, tmp_path):
    """The YAML CLI runs a fit end-to-end on a tiny config."""
    import yaml
    from voice100_tpu.training.cli import cli_main

    cfg = {
        "seed_everything": 1234,
        "trainer": {"max_epochs": 1, "gradient_clip_val": 1.0},
        "model": {
            "class_path": "voice100_tpu.models.AudioToAlignText",
            "init_args": {
                "vocab_size": 29,
                "audio_size": 64,
                "encoder_settings": [[16, False, 3, 2, 1, False]],
                "decoder_num_layers": 1,
                "decoder_hidden_size": 16,
            },
        },
        "data": {
            "class_path": "voice100_tpu.data.AudioTextDataModule",
            "init_args": {
                "vocoder": "mel",
                "dataset": "dummy_en",
                "language": "en",
                "batch_size": 4,
            },
        },
    }
    cfg_path = str(tmp_path / "tiny.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    cli_main([
        "fit",
        "--config", cfg_path,
        "--data_dir", corpus,
        "--cache_dir", str(tmp_path / "cache"),
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    assert os.path.isdir(str(tmp_path / "ckpt" / "last"))


def test_cli_validate_subcommand(corpus, tmp_path):
    """validate restores the checkpoint and reports val metrics."""
    import yaml
    from voice100_tpu.training.cli import cli_main

    cfg = {
        "seed_everything": 1234,
        "trainer": {"max_epochs": 1, "gradient_clip_val": 1.0},
        "model": {
            "class_path": "voice100_tpu.models.AudioToAlignText",
            "init_args": {
                "vocab_size": 29, "audio_size": 64,
                "encoder_settings": [[16, False, 3, 2, 1, False]],
                "decoder_num_layers": 1, "decoder_hidden_size": 16,
            },
        },
        "data": {
            "class_path": "voice100_tpu.data.AudioTextDataModule",
            "init_args": {
                "vocoder": "mel", "dataset": "dummy_en",
                "language": "en", "batch_size": 4, "valid_ratio": 0.25,
            },
        },
    }
    cfg_path = str(tmp_path / "v.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    common = [
        "--config", cfg_path,
        "--data_dir", corpus,
        "--cache_dir", str(tmp_path / "cache"),
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ]
    cli_main(["fit"] + common)
    cli_main(["validate"] + common)  # must not raise


def test_val_metrics_pad_invariant_and_cer(corpus, tmp_path):
    """val_loss must not change with pad_to_full duplication, and the
    trainer logs a greedy-decode val_cer for CTC models."""
    import json

    from voice100_tpu.data import AudioTextDataModule
    from voice100_tpu.training import Trainer, TrainerConfig

    # 8 clips, valid_ratio 0.375 -> 3 val samples; batch 2 -> final
    # val batch has 1 real + 1 duplicate row
    data = AudioTextDataModule(
        vocoder="mel",
        dataset="dummy_en",
        data_dir=corpus,
        cache_dir=str(tmp_path / "cache"),
        batch_size=2,
        valid_ratio=0.375,
    )
    log_path = str(tmp_path / "log.jsonl")
    trainer = Trainer(TrainerConfig(max_epochs=1, log_path=log_path))
    model = _tiny_asr()
    state = trainer.fit(model, data)

    records = [json.loads(line) for line in open(log_path)]
    epoch_rec = [r for r in records if "val_loss" in r][-1]
    assert "val_cer" in epoch_rec and "val_wer" in epoch_rec
    assert 0.0 <= epoch_rec["val_cer"] <= 2.0
    assert 0.0 <= epoch_rec["val_wer"] <= 2.0

    # recompute val loss without duplicate padding; must match exactly
    from voice100_tpu.training.tasks import make_task

    task = make_task(model)
    _, eval_step = trainer._make_step_fns(task, task.make_optimizer(1))
    loader = data.val_dataloader()
    loader.pad_to_full = False
    ragged = trainer.evaluate(eval_step, state, loader)
    assert abs(ragged["loss"] - epoch_rec["val_loss"]) < 1e-4


def test_cli_predict_subcommand(corpus, tmp_path):
    """`predict` runs greedy transcription over the predict loader and
    writes one line per clip (reference LightningCLI predict surface,
    voice100/main.py:8-13)."""
    import yaml

    from voice100_tpu.training.cli import cli_main

    cfg = {
        "seed_everything": 1234,
        "trainer": {"max_epochs": 1},
        "model": {
            "class_path": "voice100_tpu.models.AudioToAlignText",
            "init_args": {
                "vocab_size": 29, "audio_size": 64,
                "encoder_settings": [list(s) for s in TINY_ENC],
                "decoder_num_layers": 1, "decoder_hidden_size": 32,
            },
        },
        "data": {
            "class_path": "voice100_tpu.data.AudioTextDataModule",
            "init_args": {"vocoder": "mel", "dataset": "dummy_en",
                          "language": "en", "batch_size": 4},
        },
    }
    cfg_path = str(tmp_path / "asr.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    common = ["--config", cfg_path, "--data_dir", corpus,
              "--cache_dir", str(tmp_path / "cache"),
              "--checkpoint_dir", str(tmp_path / "ckpt")]
    cli_main(["fit"] + common)
    out = str(tmp_path / "hyps.txt")
    cli_main(["predict"] + common + ["--output", out])
    lines = open(out).read().splitlines()
    assert len(lines) == 8  # every corpus clip, no pad duplicates


def test_bf16_precision_training(corpus, tmp_path):
    """precision=16 (bf16 recurrent matmuls, f32 master weights) must
    train to a loss close to the f32 run on the same data/seed."""
    import jax.numpy as jnp

    from voice100_tpu.data import AudioTextDataModule
    from voice100_tpu.ops.lstm import set_default_compute_dtype
    from voice100_tpu.training import Trainer, TrainerConfig

    def run(precision):
        data = AudioTextDataModule(
            vocoder="mel", dataset="dummy_en", data_dir=corpus,
            cache_dir=str(tmp_path / "cache"), batch_size=4,
            valid_ratio=0.25,
        )
        trainer = Trainer(TrainerConfig(max_epochs=2, precision=precision))
        model = _tiny_asr()
        state = trainer.fit(model, data)
        task_loss = trainer.evaluate(
            trainer._make_step_fns(
                __import__("voice100_tpu.training.tasks",
                           fromlist=["make_task"]).make_task(model),
                __import__("optax").adam(1e-3),
            )[1],
            state, data.val_dataloader(),
        )["loss"]
        return float(task_loss), state

    try:
        loss16, state16 = run("16")
        from voice100_tpu.ops.lstm import default_compute_dtype

        assert default_compute_dtype() == jnp.bfloat16
        set_default_compute_dtype(None)
        loss32, _ = run("32")
    finally:
        set_default_compute_dtype(None)
    assert np.isfinite(loss16)
    # bf16 compute tracks the f32 run on this tiny problem
    assert abs(loss16 - loss32) / max(abs(loss32), 1e-6) < 0.1, (
        loss16, loss32)


def test_upload_dtype_resolution_and_bf16_padding():
    """upload_dtype='auto' follows the precision knob; explicit values
    override it. Padded bf16 batches keep their dtype."""
    import ml_dtypes

    from voice100_tpu.parallel.mesh import pad_batch_to_multiple
    from voice100_tpu.training import Trainer, TrainerConfig

    assert Trainer(TrainerConfig(precision="16"))._upload_bf16()
    assert Trainer(TrainerConfig(precision="bf16"))._upload_bf16()
    assert not Trainer(TrainerConfig(precision="32"))._upload_bf16()
    assert Trainer(
        TrainerConfig(precision="32", upload_dtype="bfloat16")
    )._upload_bf16()
    assert not Trainer(
        TrainerConfig(precision="16", upload_dtype="float32")
    )._upload_bf16()

    audio = np.zeros((3, 5, 4), ml_dtypes.bfloat16)
    lens = np.full((3,), 5, np.int32)
    padded, _ = pad_batch_to_multiple(((audio, lens),), 2)
    ((audio_p, lens_p),) = padded
    assert audio_p.dtype == ml_dtypes.bfloat16
    assert audio_p.shape[0] % 2 == 0
    assert lens_p.dtype == np.int32


def test_upload_cast_quantizes_inputs_never_targets():
    """bf16 upload may quantize model INPUT features only; float
    supervision targets (WORLD f0/logspc/codeap) must upload exactly
    as collated or the training objective itself changes."""
    import ml_dtypes

    from voice100_tpu.models import AudioToAlignText, AlignTextToAudio
    from voice100_tpu.training.tasks import make_task

    def cast(a):
        return (a.astype(ml_dtypes.bfloat16)
                if getattr(a, "dtype", None) == np.float32 else a)

    asr = make_task(AudioToAlignText(
        audio_size=8, vocab_size=29,
        encoder_settings=((8, False, 3, 2, 1, False),),
        decoder_num_layers=1, decoder_hidden_size=8,
    ))
    audio = np.zeros((2, 6, 8), np.float32)
    text = np.zeros((2, 4), np.int32)
    lens = np.full((2,), 4, np.int32)
    (a, _), (t, _) = asr.upload_cast(((audio, lens), (text, lens)), cast)
    assert a.dtype == ml_dtypes.bfloat16  # input features quantize
    assert t.dtype == np.int32

    tts = make_task(AlignTextToAudio(
        vocab_size=29, logspc_size=25, codeap_size=1,
        encoder_hidden_size=8,
    ))
    f0 = np.zeros((2, 6), np.float32)
    logspc = np.zeros((2, 6, 25), np.float32)
    codeap = np.zeros((2, 6, 1), np.float32)
    batch = ((f0, lens, logspc, codeap), (text, lens))
    out = tts.upload_cast(batch, cast)
    for leaf in (out[0][0], out[0][2], out[0][3]):
        assert leaf.dtype == np.float32, leaf.dtype  # targets untouched


def test_cli_distributed_flag(monkeypatch):
    """--distributed must call jax.distributed.initialize() before any
    other work (multi-host pods require it before touching devices)."""
    import jax
    import pytest

    from voice100_tpu.training.cli import cli_main

    called = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda *a, **k: called.append(True),
    )
    with pytest.raises(FileNotFoundError):
        cli_main(["fit", "--config", "/nonexistent/cfg.yaml",
                  "--distributed"])
    assert called  # initialize ran before the config was even read


def test_cli_predict_align_durations(corpus, tmp_path):
    """predict works for the duration model + AlignTextDataModule
    (writes per-token durations)."""
    import yaml

    import numpy as np

    from voice100_tpu.training.cli import cli_main

    cfg = {
        "seed_everything": 1234,
        "trainer": {"max_epochs": 1},
        "model": {
            "class_path": "voice100_tpu.models.TextToAlignText",
            "init_args": {"vocab_size": 29, "num_layers": 1,
                          "hidden_size": 16},
        },
        "data": {
            "class_path": "voice100_tpu.data.AlignTextDataModule",
            "init_args": {"dataset": "dummy_en", "language": "en",
                          "batch_size": 4},
        },
    }
    cfg_path = str(tmp_path / "align.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    common = ["--config", cfg_path, "--data_dir", corpus,
              "--checkpoint_dir", str(tmp_path / "ckpt")]
    cli_main(["fit"] + common)
    out = str(tmp_path / "durations.npz")
    cli_main(["predict"] + common + ["--output", out])
    with np.load(out, allow_pickle=True) as z:
        durations = z["durations"]
    assert len(durations) == 8
    assert all(d.shape[-1] == 2 for d in durations)


def test_graceful_stop_saves_last_and_resumes(corpus, tmp_path):
    """request_stop() (the SIGTERM path) halts after the current step,
    saves 'last', and --restore_from resumes training."""
    from voice100_tpu.data import AudioTextDataModule
    from voice100_tpu.training import Trainer, TrainerConfig

    def data():
        return AudioTextDataModule(
            vocoder="mel", dataset="dummy_en", data_dir=corpus,
            cache_dir=str(tmp_path / "cache"), batch_size=4,
            valid_ratio=0.0,
        )

    ckpt = str(tmp_path / "ckpt")
    trainer = Trainer(TrainerConfig(max_epochs=50, checkpoint_dir=ckpt,
                                    monitor="train_loss"))
    trainer.request_stop()  # pre-armed: stops after the first step
    state = trainer.fit(_tiny_asr(), data())
    assert state.step == 1
    assert os.path.isdir(os.path.join(ckpt, "last"))

    # resume continues from the saved state (epoch not yet finished)
    trainer2 = Trainer(TrainerConfig(max_epochs=2, checkpoint_dir=ckpt,
                                     monitor="train_loss"))
    state2 = trainer2.fit(
        _tiny_asr(), data(),
        restore_from=os.path.join(ckpt, "last"),
    )
    assert state2.step > state.step


def test_merge_world_stats_accepts_torch_pt(tmp_path):
    """Reference ``{ds}-stat.pt`` torch state dicts
    (voice100/calc_stat.py:59-68) load directly into WORLDNorm
    variables — migrated corpora keep their statistics files."""
    import numpy as np
    import torch

    from voice100_tpu.training.checkpoint import merge_world_stats

    stats = {
        "f0_mean": torch.tensor([123.0]),
        "f0_std": torch.tensor([17.0]),
        "logspc_mean": torch.arange(25, dtype=torch.float32),
        "logspc_std": torch.ones(25),
        "codeap_mean": torch.tensor([-3.0]),
        "codeap_std": torch.tensor([0.5]),
    }
    pt_path = str(tmp_path / "dummy-stat.pt")
    torch.save(stats, pt_path)

    variables = {
        "params": {},
        "world_norm": {
            "norm": {
                k: np.zeros_like(np.asarray(v)) for k, v in stats.items()
            }
        },
    }
    merged = merge_world_stats(variables, pt_path)
    target = merged["world_norm"]["norm"]
    for k, v in stats.items():
        np.testing.assert_allclose(target[k], np.asarray(v))
        assert target[k].dtype == np.float32
