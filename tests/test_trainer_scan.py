"""Multi-step scan dispatch (TrainerConfig.steps_per_dispatch): once the
HBM feature cache holds every row, the trainer runs K steps per jitted
dispatch via lax.scan with on-device batch gathers. These tests pin
that the scan path (a) actually engages, (b) reproduces the per-step
trajectory exactly in RNG consumption and batch order, and (c) handles
ragged tail chunks."""

import json

import numpy as np
import pytest

import jax

from corpus_fixture import make_dummy_corpus

from voice100_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus_scan")
    make_dummy_corpus(str(root), n_clips=12)
    return str(root)


def _fit(corpus, tmp_path, tag, **cfg_kwargs):
    from voice100_tpu.data import AudioTextDataModule
    from voice100_tpu.models import AudioToAlignText
    from voice100_tpu.training import Trainer, TrainerConfig

    data = AudioTextDataModule(
        vocoder="mel", dataset="dummy_en", data_dir=corpus,
        cache_dir=str(tmp_path / "cache"), batch_size=4,
        valid_ratio=0.0,
    )
    model = AudioToAlignText(
        audio_size=64, vocab_size=29,
        encoder_settings=((16, False, 3, 2, 1, False),),
        decoder_num_layers=1, decoder_hidden_size=16,
    )
    log_path = str(tmp_path / f"log_{tag}.jsonl")
    trainer = Trainer(TrainerConfig(
        max_epochs=3, device_cache=True, log_path=log_path,
        log_every_n_steps=1, **cfg_kwargs,
    ))
    # the scan path requires a single-device placement (the cache is
    # disabled on sharded meshes); pin it on the 8-device test platform
    trainer.mesh = make_mesh(jax.devices()[:1], data=1, model=1)
    state = trainer.fit(model, data)
    with open(log_path) as f:
        records = [json.loads(line) for line in f]
    return state, records


def test_scan_dispatch_matches_per_step(corpus, tmp_path):
    """steps_per_dispatch>1 must reproduce the per-step trajectory:
    same batches in the same order, identical RNG split sequence —
    final params agree to jit-recompilation tolerance."""
    base_state, base_recs = _fit(corpus, tmp_path, "per_step")
    scan_state, scan_recs = _fit(
        corpus, tmp_path, "scan", steps_per_dispatch=8)

    # the scan path engaged (epoch 0 streams to warm the cache, epochs
    # 1-2 dispatch scans)
    assert any(r.get("event") == "scan_dispatch" for r in scan_recs)
    assert not any(r.get("event") == "scan_dispatch" for r in base_recs)

    assert scan_state.step == base_state.step
    base_leaves = jax.tree_util.tree_leaves(base_state.params)
    scan_leaves = jax.tree_util.tree_leaves(scan_state.params)
    assert len(base_leaves) == len(scan_leaves)
    for a, b in zip(base_leaves, scan_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)

    # per-epoch train losses line up too (the epoch record logs the
    # last step's loss on both paths)
    base_losses = [r["train_loss"] for r in base_recs
                   if "train_loss" in r and "train_time_s" in r]
    scan_losses = [r["train_loss"] for r in scan_recs
                   if "train_loss" in r and "train_time_s" in r]
    np.testing.assert_allclose(base_losses, scan_losses,
                               rtol=1e-3, atol=1e-4)


def test_scan_tail_chunk(corpus, tmp_path):
    """A steps_per_dispatch that does not divide the epoch's batch
    count dispatches a shorter tail chunk and still matches."""
    base_state, _ = _fit(corpus, tmp_path, "per_step2")
    scan_state, scan_recs = _fit(
        corpus, tmp_path, "scan2", steps_per_dispatch=2)
    assert any(r.get("event") == "scan_dispatch" for r in scan_recs)
    assert scan_state.step == base_state.step
    for a, b in zip(jax.tree_util.tree_leaves(base_state.params),
                    jax.tree_util.tree_leaves(scan_state.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_scan_dispatch_dp_mesh(corpus, tmp_path):
    """Sharded store: on a 4x1 DP mesh the cache shards its item axis
    over 'data' and gathers emit shard_batch-layout batches (GSPMD
    collectives); scan dispatch over the sharded store must match the
    per-step streaming path on the same mesh."""
    def fit_mesh(tag, **cfg_kwargs):
        from voice100_tpu.data import AudioTextDataModule
        from voice100_tpu.models import AudioToAlignText
        from voice100_tpu.training import Trainer, TrainerConfig

        data = AudioTextDataModule(
            vocoder="mel", dataset="dummy_en", data_dir=corpus,
            cache_dir=str(tmp_path / "cache"), batch_size=4,
            valid_ratio=0.0,
        )
        model = AudioToAlignText(
            audio_size=64, vocab_size=29,
            encoder_settings=((16, False, 3, 2, 1, False),),
            decoder_num_layers=1, decoder_hidden_size=16,
        )
        log_path = str(tmp_path / f"log_mesh_{tag}.jsonl")
        trainer = Trainer(TrainerConfig(
            max_epochs=3, log_path=log_path, log_every_n_steps=1,
            **cfg_kwargs,
        ))
        trainer.mesh = make_mesh(jax.devices()[:4], data=4, model=1)
        state = trainer.fit(model, data)
        with open(log_path) as f:
            records = [json.loads(line) for line in f]
        return state, records

    base_state, _ = fit_mesh("stream")
    scan_state, recs = fit_mesh(
        "scan", device_cache=True, steps_per_dispatch=8)

    cache_events = [r for r in recs if r.get("event") == "device_cache"]
    assert cache_events and cache_events[0]["sharded"] is True
    assert any(r.get("event") == "scan_dispatch" for r in recs)
    assert scan_state.step == base_state.step
    for a, b in zip(jax.tree_util.tree_leaves(base_state.params),
                    jax.tree_util.tree_leaves(scan_state.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_scan_dispatch_bf16_precision(corpus, tmp_path):
    """The scan path composes with the bf16 precision knob: cached
    rows store the bf16-quantized uploads and the scanned steps match
    the per-step cached path (identical RNG and identical stored
    bytes, so trajectories agree to compile-variation tolerance)."""
    base_state, base_recs = _fit(
        corpus, tmp_path, "bf16_step", precision="bf16")
    scan_state, scan_recs = _fit(
        corpus, tmp_path, "bf16_scan", precision="bf16",
        steps_per_dispatch=8)
    assert any(r.get("event") == "scan_dispatch" for r in scan_recs)
    assert scan_state.step == base_state.step
    for a, b in zip(jax.tree_util.tree_leaves(base_state.params),
                    jax.tree_util.tree_leaves(scan_state.params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=5e-3, atol=5e-4)


def test_scan_resume_mid_training(corpus, tmp_path):
    """request_stop between chunks checkpoints 'last' and resume
    restarts the epoch, same contract as the per-step path."""
    from voice100_tpu.data import AudioTextDataModule
    from voice100_tpu.models import AudioToAlignText
    from voice100_tpu.training import Trainer, TrainerConfig

    data = AudioTextDataModule(
        vocoder="mel", dataset="dummy_en", data_dir=corpus,
        cache_dir=str(tmp_path / "cache"), batch_size=4,
        valid_ratio=0.0,
    )
    model = AudioToAlignText(
        audio_size=64, vocab_size=29,
        encoder_settings=((16, False, 3, 2, 1, False),),
        decoder_num_layers=1, decoder_hidden_size=16,
    )
    ckpt = str(tmp_path / "ckpt_scan")
    trainer = Trainer(TrainerConfig(
        max_epochs=2, device_cache=True, steps_per_dispatch=2,
        checkpoint_dir=ckpt,
    ))
    trainer.mesh = make_mesh(jax.devices()[:1], data=1, model=1)
    trainer.request_stop()
    state = trainer.fit(model, data)
    assert state.epoch == 0  # stopped during epoch 0; resume re-runs it

    trainer2 = Trainer(TrainerConfig(
        max_epochs=2, device_cache=True, steps_per_dispatch=2,
        checkpoint_dir=ckpt,
    ))
    trainer2.mesh = make_mesh(jax.devices()[:1], data=1, model=1)
    resumed = trainer2.fit(
        model, data, restore_from=f"{ckpt}/last")
    assert resumed.epoch == 2


def test_scan_dispatch_per_bucket_mixed_lengths(tmp_path):
    """Mixed-length corpus + length-bucketed sampler: the scan plan
    splits the epoch into per-bucket groups whose gathers slice to
    each bucket's own collate extents (NOT the store max — the
    round-4 bucketed-collate cliff), and the trajectory still equals
    the per-step device-cache path exactly because run-length
    grouping preserves the epoch's batch order."""
    from voice100_tpu.data import AudioTextDataModule
    from voice100_tpu.models import AudioToAlignText
    from voice100_tpu.training import Trainer, TrainerConfig

    root = str(tmp_path / "corpus_mixed")
    make_dummy_corpus(root, n_clips=16, min_dur=0.5, max_dur=2.4,
                      seed=11)
    # warm the DISK feature cache first so both runs see identical
    # epochs: length_hint only knows lengths once features are cached,
    # and a cold first run would batch epoch 0 unbucketed
    warm = AudioTextDataModule(
        vocoder="mel", dataset="dummy_en", data_dir=root,
        cache_dir=str(tmp_path / "cache"), batch_size=4,
        valid_ratio=0.0,
    )
    warm.setup("fit")
    for _ in warm.train_dataloader():
        pass

    def fit(tag, **cfg_kwargs):
        data = AudioTextDataModule(
            vocoder="mel", dataset="dummy_en", data_dir=root,
            cache_dir=str(tmp_path / "cache"), batch_size=4,
            valid_ratio=0.0, bucket_by_length=True,
        )
        model = AudioToAlignText(
            audio_size=64, vocab_size=29,
            encoder_settings=((16, False, 3, 2, 1, False),),
            decoder_num_layers=1, decoder_hidden_size=16,
        )
        log_path = str(tmp_path / f"log_mixed_{tag}.jsonl")
        trainer = Trainer(TrainerConfig(
            max_epochs=3, device_cache=True, log_path=log_path,
            log_every_n_steps=1, **cfg_kwargs,
        ))
        trainer.mesh = make_mesh(jax.devices()[:1], data=1, model=1)
        state = trainer.fit(model, data)
        with open(log_path) as f:
            records = [json.loads(line) for line in f]
        return state, records

    base_state, _ = fit("per_step")
    scan_state, scan_recs = fit("scan", steps_per_dispatch=8)

    events = [r for r in scan_recs if r.get("event") == "scan_dispatch"]
    assert events and events[0]["buckets"] >= 2, events

    assert scan_state.step == base_state.step
    for a, b in zip(jax.tree_util.tree_leaves(base_state.params),
                    jax.tree_util.tree_leaves(scan_state.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)

    base_losses = [r["train_loss"] for _, r in enumerate(scan_recs)
                   if "train_loss" in r and "train_time_s" in r]
    assert base_losses  # epochs recorded on the scan path too
