"""Training loop: jitted data-parallel steps, checkpoints, metric logs.

The framework's replacement for PyTorch Lightning's Trainer as the
reference uses it (voice100/main.py:8-13, train_*.py): Adam (+ optional
schedule from the task), gradient clipping, periodic + best-val + last
checkpoints (orbax), and step metric logging.

TPU-first: one generic train step is jitted once per batch bucket shape,
with the batch sharded over the mesh 'data' axis and parameters placed
by the TP policy in ``parallel.mesh`` — XLA/GSPMD inserts the gradient
all-reduce over ICI. Buffers are donated so optimizer state updates in
place.
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel.mesh import (
    fit_mesh_for_batch, kernel_sharding, make_mesh,
    mesh_spans_processes, pad_batch_to_multiple, replicate_tree,
    shard_batch, shard_params,
)
from .tasks import Task, make_task
from .checkpoint import save_checkpoint, restore_checkpoint

__all__ = ["Trainer", "TrainerConfig", "TrainState"]


@dataclass
class TrainerConfig:
    max_epochs: int = 1
    gradient_clip_val: float = 1.0
    checkpoint_dir: Optional[str] = None
    monitor: str = "val_loss"
    every_n_epochs: int = 10
    save_last: bool = True
    log_every_n_steps: int = 10
    seed: int = 1234
    mesh_model_axis: int = 1
    log_path: Optional[str] = None
    # capture a jax.profiler trace of training steps 2..4 into this dir
    profile_dir: Optional[str] = None
    # "32" (default) or "bf16": mixed-precision training with f32
    # master weights — the TPU-native equivalent of the reference's
    # --trainer.precision 16 recipes (/root/reference/README.md:187-190);
    # "16" is accepted as an alias for bf16. bf16 routes the Pallas
    # LSTM train kernels to their mixed-precision path (bf16 input
    # projections / streaming / gradient matmuls, f32 recurrence and
    # accumulation — ops/lstm.py _kernel_mode, ops/lstm_pallas.py) and runs
    # the v2 conv blocks in bf16 (models/layers.py); transposed convs
    # stay f32 (measured slower in bf16). The scan LSTM path honors the
    # same knob by casting its matmul operands.
    precision: str = "32"
    # host->device dtype for float train-batch INPUT arrays: "auto"
    # uploads bfloat16 when precision is bf16 (half the upload bytes;
    # the step upcasts to f32 on entry, so only the input quantization
    # changes — compute precision is still governed by `precision`).
    # Float supervision targets (e.g. WORLD f0/logspc/codeap) always
    # upload f32 regardless, so the loss objective never quantizes.
    # Set "float32"/"bfloat16" to force either way.
    # Validation batches always upload f32 so val metrics are
    # precision-knob-independent.
    upload_dtype: str = "auto"
    # HBM-resident train feature cache (data/device_cache.py): each
    # clip's collated rows upload once and later epochs assemble their
    # shuffled batches by on-device gather, so steady-state training
    # moves only batch indices over the host->device link. Opt-in; for
    # corpora that fit in device memory (one 16 GB chip holds ~350 h of
    # f16 log-mel). Works with bucketed collate (the store grows to the
    # largest bucket and gathers slice down, using the collate's
    # pad_values). On a multi-device mesh the store's item axis shards
    # over 'data' — cache capacity scales with the fleet — and gathers
    # emit shard_batch-layout batches with GSPMD collectives.
    device_cache: bool = False
    # hard cap for the device cache store (bytes); raises early instead
    # of OOMing mid-epoch when the corpus doesn't fit.
    device_cache_max_bytes: int = 8 * 1024**3
    # with device_cache: once every row is HBM-resident, run up to this
    # many train steps per jitted dispatch (lax.scan over the epoch's
    # batch row-index matrix, batches assembled by on-device gather
    # inside the scan). Steady-state epochs then pay ONE dispatch and
    # one tiny index upload per chunk instead of a gather+step dispatch
    # round trip per step — the difference between ~4.2k and ~17k
    # audio-s/s over a remote host->device link (bench.py
    # --metric train_loader). Warm epochs, incomplete caches, ragged
    # tail batches, and profile_dir runs fall back to the per-step
    # path. With bucketed collate, the epoch's batches group by their
    # collate bucket (data/device_cache.py epoch_plan — batch buckets
    # predicted from tracked true row lengths) and each group's scans
    # gather AT ITS OWN extents, so variable-length corpora don't pay
    # full-store padding per step. Groups run in first-occurrence
    # order with epoch order inside each group and one RNG split per
    # step, so a per-step run over the same plan order reproduces the
    # trajectory exactly (single-bucket corpora: identical to the
    # plain per-step path).
    steps_per_dispatch: int = 1


@dataclass
class TrainState:
    params: Any
    extra: Dict[str, Any]
    opt_state: Any
    step: int = 0
    epoch: int = 0
    best_monitor: float = float("inf")


class Trainer:
    def __init__(self, config: TrainerConfig) -> None:
        self.config = config
        self.mesh = None  # built in fit() once the batch size is known
        self._stop_requested = False
        self._log_file = None
        if config.log_path and jax.process_index() == 0:
            # one writer: in a multi-process run every host passes the
            # same log_path (shared FS on pods), and interleaved
            # appends would corrupt the JSONL
            os.makedirs(os.path.dirname(config.log_path) or ".", exist_ok=True)
            self._log_file = open(config.log_path, "a")

    # ------------------------------------------------------------------
    def _log(self, record: Dict[str, Any]) -> None:
        msg = " ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in record.items()
        )
        tag = (
            f"[trainer p{jax.process_index()}]"
            if jax.process_count() > 1 else "[trainer]"
        )
        print(f"{tag} {msg}", flush=True)
        if self._log_file:
            self._log_file.write(json.dumps(record) + "\n")
            self._log_file.flush()

    def _save(self, path: str, state) -> None:
        """Checkpoint write, multi-process safe: EVERY process calls
        orbax (its checkpointers carry internal cross-process barriers,
        so a lone-process save would deadlock); the state materializes
        to identical host arrays on each host (fully replicated under
        DP, the multi-process layout) and orbax's primary host writes.
        The built-in barrier also keeps hosts from racing ahead — e.g.
        restoring 'last' before it exists."""
        save_checkpoint(path, state)

    # ------------------------------------------------------------------
    def _make_step_fns(self, task: Task, optimizer):
        def step_body(params, extra, opt_state, batch, rng):
            # half-precision uploads (bf16 upload_dtype / f16 feature
            # cache) are upcast inside Task.loss/init — the compiled
            # step sees f32 math either way

            def loss_fn(p):
                loss, metrics, new_extra = task.loss(
                    p, extra, batch, rng, train=True
                )
                return loss, (metrics, new_extra)

            grads, (metrics, new_extra) = jax.grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_extra, opt_state, metrics

        train_step = partial(jax.jit, donate_argnums=(0, 2))(step_body)
        self._step_body = step_body  # shared by the scan dispatcher

        @jax.jit
        def eval_step(params, extra, batch):
            loss, metrics, _ = task.loss(
                params, extra, batch, rng=None, train=False
            )
            return metrics

        return train_step, eval_step

    def _make_scan_fn(self, cache, extents=None):
        """Multi-step dispatcher: scan the per-step body over a
        ``[k, B]`` row-index matrix, assembling each step's batch by
        on-device gather from the HBM feature store, sliced to the
        batch group's collate bucket (``extents``). One host dispatch
        (and one tiny index upload) per chunk; the per-step RNG split
        sequence is replicated exactly, so the trajectory matches a
        per-step run over the same plan order."""
        step_body = self._step_body
        gather = cache.gather_rows

        @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def multi_step(params, extra, opt_state, rng, store, idx_mat):
            def body(carry, idx):
                params, extra, opt_state, rng = carry
                rng, step_rng = jax.random.split(rng)
                batch = gather(store, idx, extents)
                params, extra, opt_state, metrics = step_body(
                    params, extra, opt_state, batch, step_rng
                )
                return (params, extra, opt_state, rng), metrics

            (params, extra, opt_state, rng), metrics = jax.lax.scan(
                body, (params, extra, opt_state, rng), idx_mat
            )
            return params, extra, opt_state, rng, metrics

        return multi_step

    def _scan_fn_for(self, cache, extents):
        """One jitted multi-step dispatcher per bucket extents (jit
        caches on the traced gather slice sizes via closure identity,
        so each bucket group must reuse ITS dispatcher)."""
        fns = getattr(self, "_scan_fns", None)
        if fns is None:
            fns = self._scan_fns = {}
        fn = fns.get(extents)
        if fn is None:
            fn = fns[extents] = self._make_scan_fn(cache, extents)
        return fn

    # ------------------------------------------------------------------
    def fit(
        self,
        model,
        datamodule,
        restore_from: Optional[str] = None,
        init_variables: Optional[Dict[str, Any]] = None,
    ) -> TrainState:
        cfg = self.config
        from ..ops.lstm import set_default_compute_dtype

        if str(cfg.precision) in ("16", "bf16", "bfloat16", "16-mixed"):
            import jax.numpy as jnp

            set_default_compute_dtype(jnp.bfloat16)
        else:
            # explicit reset: a previous bf16 fit in this process must
            # not leak into an f32 one
            set_default_compute_dtype(None)
        task = make_task(model)
        self._task = task
        if self.mesh is None:
            if jax.process_count() > 1:
                # multi-process DP: the mesh must span every process's
                # devices (a process with no mesh devices cannot join
                # the SPMD program), so use the full fleet; the global
                # batch is batch_size * process_count rows
                self.mesh = make_mesh(
                    jax.devices(), model=cfg.mesh_model_axis
                )
            else:
                self.mesh = fit_mesh_for_batch(
                    datamodule.batch_size, model=cfg.mesh_model_axis
                )
        datamodule.setup("fit")
        train_loader = datamodule.train_dataloader()
        val_loader = datamodule.val_dataloader()
        steps_per_epoch = len(train_loader)
        optimizer = task.make_optimizer(steps_per_epoch)
        if cfg.gradient_clip_val and cfg.gradient_clip_val > 0:
            optimizer = optax.chain(
                optax.clip_by_global_norm(cfg.gradient_clip_val), optimizer
            )

        rng = jax.random.PRNGKey(cfg.seed)
        rng, init_rng = jax.random.split(rng)
        first_batch = next(iter(train_loader))
        if init_variables is None:
            variables = task.init(init_rng, first_batch)
        else:
            variables = init_variables
        variables = dict(variables)
        norm = variables.get("world_norm", {}).get("norm")
        if norm is not None:
            # identity stats mean calc-stat was never run: the raw f0
            # stream (~hundreds of Hz) then dominates the WORLD loss
            # and the spectral envelope barely trains
            f0_std = np.asarray(norm.get("f0_std", 1.0))
            if float(np.max(np.abs(f0_std - 1.0))) < 1e-6:
                self._log({
                    "event": "warning",
                    "message": (
                        "WORLD norm stats are identity; run "
                        "tools.calc_stat and pass --audio_stat, or "
                        "the f0 stream will dominate the TTS loss"
                    ),
                })
        params = variables.pop("params")
        extra = variables
        multiproc = mesh_spans_processes(self.mesh)
        params = shard_params(params, self.mesh)
        if multiproc:
            # every non-batch jit input must be a GLOBAL array in a
            # multi-process run (init is seed-deterministic, so each
            # host holds identical values to replicate from)
            extra = replicate_tree(
                jax.tree_util.tree_map(np.asarray, extra), self.mesh
            )
        opt_state = optimizer.init(params)
        state = TrainState(params=params, extra=extra, opt_state=opt_state)

        if restore_from:
            state = restore_checkpoint(restore_from, state)
            if multiproc:
                # restore_checkpoint returns host arrays; re-place them
                # as global arrays (same layout as the initial state)
                state.params = shard_params(state.params, self.mesh)
                state.extra = replicate_tree(state.extra, self.mesh)
                state.opt_state = replicate_tree(
                    state.opt_state, self.mesh
                )

        train_step, eval_step = self._make_step_fns(task, optimizer)
        n_params = sum(
            int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(state.params)
        )
        self._log({"event": "fit_start", "params": n_params,
                   "steps_per_epoch": steps_per_epoch,
                   "devices": len(jax.devices()),
                   "processes": jax.process_count(),
                   "upload": "bf16" if self._upload_bf16() else "f32"})

        # graceful interruption: SIGTERM/SIGINT (preemption, ^C) request
        # a stop; the loop finishes the current step, saves 'last', and
        # returns — --restore_from <dir>/last resumes at that epoch
        installed = []
        if threading.current_thread() is threading.main_thread():
            import signal

            def _on_signal(signum, frame):
                if self._stop_requested:
                    # second signal: escalate so a hung compile/step
                    # can still be interrupted
                    raise KeyboardInterrupt
                self._log({"event": "stop_requested", "signal": signum})
                self._stop_requested = True

            for sig in (signal.SIGTERM, signal.SIGINT):
                try:
                    installed.append((sig, signal.signal(sig, _on_signal)))
                except (ValueError, OSError):
                    pass

        try:
            with self._kernel_ctx():
                return self._fit_loop(
                    cfg, task, model, datamodule, state, rng,
                    train_loader, val_loader, train_step, eval_step,
                )
        finally:
            # clear so a reused Trainer doesn't stop immediately on the
            # next fit (pre-arming request_stop() before fit still works)
            self._stop_requested = False
            if installed:
                import signal

                for sig, old in installed:
                    signal.signal(sig, old)

    def _kernel_ctx(self):
        """Context under which step functions are traced.

        Multi-device meshes declare kernel_sharding so the Pallas
        LSTM/CTC fast paths run per-shard via shard_map instead of
        silently falling back to the scans (the round-2 perf cliff:
        ~6x step throughput on a pod slice). Pure DP splits the batch
        over 'data'; tensor-parallel meshes run the kernels
        fleet-flattened (batch over 'data' x 'model', the small
        LSTM/CTC operands all-gathered inside the map — see
        parallel.mesh.kernel_batch_axes). Engaged by default on TPU
        backends; on CPU/GPU (where the kernels only run in interpret
        mode) set VOICE100_TPU_SHARD_KERNELS=1 to force it — the
        multichip tests and driver dryrun do.
        """
        import contextlib

        mesh = self.mesh
        if mesh is None or (
            mesh.shape.get("data", 1) * mesh.shape.get("model", 1) <= 1
        ):
            return contextlib.nullcontext()
        forced = os.environ.get("VOICE100_TPU_SHARD_KERNELS")
        if forced == "0":
            return contextlib.nullcontext()
        if jax.default_backend() in ("cpu", "gpu") and forced != "1":
            return contextlib.nullcontext()
        return kernel_sharding(mesh)

    def _pad_multiple(self) -> int:
        """Batch-axis multiple the loader pads to: the kernel fleet
        size when the shard kernels will engage (so a TP mesh's
        fleet-flattened batch split divides), else the 'data' axis.
        Multi-process runs pad their LOCAL rows, so the multiple is
        this process's share of the fleet."""
        import contextlib

        from ..parallel.mesh import kernel_batch_divisor

        if self.mesh is None:
            return 1
        if isinstance(self._kernel_ctx(), contextlib.nullcontext):
            n = self.mesh.shape["data"]
        else:
            n = kernel_batch_divisor(self.mesh)
        pc = jax.process_count()
        if pc > 1:
            assert n % pc == 0, (
                f"mesh axes ({n}) must divide evenly across "
                f"{pc} processes"
            )
            return max(1, n // pc)
        return n

    def request_stop(self) -> None:
        """Programmatic equivalent of SIGTERM: stop after the current
        step, saving the 'last' checkpoint."""
        self._stop_requested = True

    def _upload_bf16(self) -> bool:
        cfg = self.config
        mode = str(cfg.upload_dtype)
        if mode in ("bfloat16", "bf16", "16"):
            return True
        if mode == "auto":
            return str(cfg.precision) in ("16", "bf16", "bfloat16",
                                          "16-mixed")
        return False

    def _prefetched(self, loader):
        """Pad + shard + device_put batches with a 2-deep background
        window so the host->device upload of batch N+1 overlaps the
        step for batch N (data/prefetch.py; the reference hides the
        same latency behind DataLoader workers,
        voice100/data_modules.py:628-666)."""
        from ..data.prefetch import DevicePrefetcher

        data_axis = self._pad_multiple()
        upload_bf16 = self._upload_bf16()

        upload_cast = getattr(
            getattr(self, "_task", None), "upload_cast", None
        )

        multiproc = (
            self.mesh is not None and mesh_spans_processes(self.mesh)
        )

        def check_mp_shapes(batch):
            """Multi-process batches must collate to ONE static shape:
            hosts see different rows of the same global batch, so
            per-batch dynamic buckets would give each host a different
            global array shape — divergent SPMD programs, a deadlock.
            The first batch's shapes are cross-checked host-to-host
            (one tiny allgather); later batches check locally."""
            shapes = tuple(
                np.shape(leaf)
                for leaf in jax.tree_util.tree_leaves(batch)
            )
            first = getattr(self, "_mp_batch_shapes", None)
            if first is None:
                from jax.experimental import multihost_utils

                digest = np.frombuffer(
                    np.asarray(
                        [hash(shapes) & 0x7FFFFFFF], np.int64
                    ).tobytes(), np.int64,
                )
                gathered = multihost_utils.process_allgather(digest)
                if not (gathered == gathered[0]).all():
                    raise RuntimeError(
                        "multi-process batch shapes differ across "
                        "hosts; pin one collate bucket (set "
                        "VOICE100_TPU_TIME_BUCKET/TEXT_BUCKET above "
                        "the corpus max) so every host pads to the "
                        "same static extents"
                    )
                self._mp_batch_shapes = shapes
            elif shapes != first:
                raise RuntimeError(
                    f"multi-process batch shapes drifted ({shapes} vs "
                    f"{first}); pin one collate bucket (set "
                    "VOICE100_TPU_TIME_BUCKET/TEXT_BUCKET above the "
                    "corpus max) so every batch pads to the same "
                    "static extents"
                )

        def place(batch):
            if upload_bf16 and upload_cast is not None:
                # halve the upload bytes: float INPUT features quantize
                # to bf16 on the prefetch thread; the train step upcasts
                # on entry (compute stays per the precision knob). The
                # task's upload_cast picks only input leaves — float
                # supervision targets (e.g. WORLD f0/logspc/codeap)
                # always upload exactly as collated so the training
                # objective is upload-dtype-independent.
                import ml_dtypes

                batch = upload_cast(
                    batch,
                    lambda a: a.astype(ml_dtypes.bfloat16)
                    if getattr(a, "dtype", None) == np.float32 else a,
                )
            batch, _ = pad_batch_to_multiple(batch, data_axis)
            if multiproc:
                check_mp_shapes(batch)
                return shard_batch(batch, self.mesh)
            if self.mesh is None or self.mesh.size == 1:
                # single device: upload the whole batch as ONE PJRT
                # transfer (per-leaf device_put pays a fixed dispatch
                # cost per leaf — a full round trip on remote links)
                from ..data.pack import device_put_packed

                return device_put_packed(batch)
            return shard_batch(batch, self.mesh)

        cache = self._device_cache(loader)
        if cache is not None:
            def cache_place(pair):
                indices, batch = pair
                if upload_bf16 and upload_cast is not None:
                    import ml_dtypes

                    batch = upload_cast(
                        batch,
                        lambda a: a.astype(ml_dtypes.bfloat16)
                        if getattr(a, "dtype", None) == np.float32
                        else a,
                    )
                return cache.place(indices, batch)

            prefetcher = DevicePrefetcher(
                loader.iter_with_indices(), size=2, place=cache_place
            )
        else:
            prefetcher = DevicePrefetcher(loader, size=2, place=place)
        try:
            yield from prefetcher
        finally:
            prefetcher.close()

    def _device_cache(self, loader):
        """Build (once) the HBM-resident train feature cache when the
        config opts in. On a multi-device mesh the store's item axis is
        sharded over 'data' (capacity scales with the fleet) and
        gathers emit batches in shard_batch's layout."""
        if not self.config.device_cache:
            return None
        if jax.process_count() > 1:
            # multi-host DP: each process sees a different loader stride,
            # so per-host _cached/complete states (and hence scan
            # engagement) would diverge into different SPMD programs —
            # a collective deadlock — and per-host-different replicated
            # idx scatters into a global sharded store are undefined.
            # Stream until the cache learns cross-host index sync.
            if not getattr(self, "_warned_multihost_cache", False):
                self._warned_multihost_cache = True
                self._log({
                    "event": "warning",
                    "message": (
                        "device_cache disabled: multi-process runs "
                        "stream batches (per-host cache states would "
                        "diverge)"
                    ),
                })
            return None
        cached = getattr(self, "_feature_cache", None)
        if cached is None or cached.n_items != len(loader.dataset):
            from ..data.device_cache import DeviceFeatureCache

            mesh = (
                self.mesh
                if self.mesh is not None and self.mesh.size > 1 else None
            )
            if mesh is not None:
                bs = getattr(loader, "batch_size", 0)
                if (not bs or bs % self._pad_multiple() != 0
                        or not getattr(loader, "pad_to_full", False)):
                    # sharded gathers need every batch at a batch size
                    # that divides the mesh's pad multiple; fall back
                    # to the streaming path otherwise
                    return None
            cached = DeviceFeatureCache(
                len(loader.dataset),
                max_bytes=self.config.device_cache_max_bytes,
                pad_values=getattr(
                    loader.collate_fn, "pad_values", None),
                mesh=mesh,
                var_specs=getattr(
                    loader.collate_fn, "var_specs", None),
            )
            self._feature_cache = cached
            self._log({
                "event": "device_cache", "items": cached.n_items,
                "sharded": mesh is not None,
            })
        return cached

    def _fit_loop(self, cfg, task, model, datamodule, state, rng,
                  train_loader, val_loader, train_step, eval_step):
        scan_logged = False
        for epoch in range(state.epoch, cfg.max_epochs):
            train_loader.set_epoch(epoch)
            t0 = time.time()
            running = None
            # multi-step scan dispatch: once the HBM feature cache holds
            # every row, the epoch is a set of per-bucket row-index
            # matrices — no host decode/collate/upload, one dispatch
            # per chunk of steps, each bucket group computing at ITS
            # collate extents instead of the store's full extents
            plan = cache = None
            if cfg.steps_per_dispatch > 1 and not cfg.profile_dir:
                cache = self._device_cache(train_loader)
                if cache is not None:
                    plan = cache.epoch_plan(train_loader)
            if plan is not None:
                if not scan_logged:
                    scan_logged = True
                    self._log({
                        "event": "scan_dispatch",
                        "steps_per_dispatch": int(cfg.steps_per_dispatch),
                        "batches_per_epoch": sum(
                            len(mat) for _, mat in plan),
                        "buckets": len({k for k, _ in plan}),
                        "runs": len(plan),
                    })
                stopped = False
                for extents, mat in plan:
                    scan_fn = self._scan_fn_for(cache, extents)
                    for start in range(0, len(mat),
                                       int(cfg.steps_per_dispatch)):
                        chunk = mat[
                            start:start + int(cfg.steps_per_dispatch)]
                        rng, metrics, state = self._scan_chunk(
                            scan_fn, cache, chunk, state, rng)
                        prev = state.step - len(chunk)
                        if prev == 0:
                            from ..ops import ctc as _ctc, lstm as _lstm

                            self._log({
                                "event": "kernel_path",
                                "lstm": _lstm.last_kernel_mode() or "n/a",
                                "ctc": _ctc.last_kernel_mode() or "n/a",
                            })
                        if (prev // cfg.log_every_n_steps
                                != state.step // cfg.log_every_n_steps):
                            logged = {
                                k: float(np.mean(np.asarray(v)))
                                for k, v in metrics.items()
                            }
                            self._log({
                                "epoch": epoch, "step": state.step,
                                **{f"train_{k}": v
                                   for k, v in logged.items()},
                            })
                        running = jax.tree_util.tree_map(
                            lambda m: m[-1], metrics)
                        if self._stop_requested:
                            stopped = True
                            break
                    if stopped:
                        break
                if stopped:
                    self._log({"event": "stopped", "epoch": epoch,
                               "step": state.step})
                    state.epoch = epoch  # resume re-runs this epoch
                    if cfg.checkpoint_dir and cfg.save_last:
                        self._save(
                            os.path.join(cfg.checkpoint_dir, "last"),
                            state,
                        )
                    return state
                self._epoch_tail(cfg, task, model, datamodule, state,
                                 epoch, t0, running, val_loader,
                                 eval_step)
                continue
            for batch in self._prefetched(train_loader):
                rng, step_rng = jax.random.split(rng)
                if cfg.profile_dir and state.step == 2:
                    jax.profiler.start_trace(cfg.profile_dir)
                state.params, state.extra, state.opt_state, metrics = (
                    train_step(
                        state.params, state.extra, state.opt_state,
                        batch, step_rng,
                    )
                )
                state.step += 1
                if state.step == 1:
                    from ..ops import ctc as _ctc, lstm as _lstm

                    self._log({
                        "event": "kernel_path",
                        "lstm": _lstm.last_kernel_mode() or "n/a",
                        "ctc": _ctc.last_kernel_mode() or "n/a",
                    })
                if self._stop_requested:
                    if (cfg.profile_dir and 2 <= state.step < 5):
                        # a trace is in flight; close it before leaving
                        jax.profiler.stop_trace()
                    self._log({"event": "stopped", "epoch": epoch,
                               "step": state.step})
                    state.epoch = epoch  # resume re-runs this epoch
                    if cfg.checkpoint_dir and cfg.save_last:
                        self._save(
                            os.path.join(cfg.checkpoint_dir, "last"),
                            state,
                        )
                    return state
                if cfg.profile_dir and state.step == 5:
                    jax.tree_util.tree_map(
                        lambda x: x.block_until_ready(), metrics
                    )
                    jax.profiler.stop_trace()
                    self._log({"event": "profile_written",
                               "dir": cfg.profile_dir})
                if state.step % cfg.log_every_n_steps == 0:
                    metrics = {
                        k: float(v) for k, v in metrics.items()
                    }
                    self._log({"epoch": epoch, "step": state.step,
                               **{f"train_{k}": v for k, v in metrics.items()}})
                running = metrics
            self._epoch_tail(cfg, task, model, datamodule, state, epoch,
                             t0, running, val_loader, eval_step)
        return state

    def _scan_chunk(self, scan_fn, cache, chunk, state, rng):
        """One multi-step dispatch: len(chunk) train steps in a single
        jitted scan (see _make_scan_fn)."""
        (state.params, state.extra, state.opt_state, rng, metrics) = (
            scan_fn(
                state.params, state.extra, state.opt_state, rng,
                cache.store, chunk,
            )
        )
        state.step += len(chunk)
        return rng, metrics, state

    def _epoch_tail(self, cfg, task, model, datamodule, state, epoch,
                    t0, running, val_loader, eval_step):
        """Per-epoch bookkeeping shared by the per-step and scan paths:
        the epoch record, validation, and checkpointing."""
        train_time = time.time() - t0

        monitor_value = None
        val_metrics = {}
        epoch_record = {
            "epoch": epoch,
            "step": state.step,
            "train_time_s": round(train_time, 2),
        }
        lr_schedule = getattr(task, "lr_schedule", None)
        if lr_schedule is not None:
            epoch_record["lr"] = float(lr_schedule(state.step))
        if running is not None:
            epoch_record["train_loss"] = float(running["loss"])
        if val_loader is not None and len(val_loader) > 0:
            val_metrics = self.evaluate(eval_step, state, val_loader)
            rates = self._val_cer(model, datamodule, state,
                                  val_loader)
            if rates is not None:
                val_metrics.update(rates)
            epoch_record.update(
                {f"val_{k}": v for k, v in val_metrics.items()}
            )
        self._log(epoch_record)
        if cfg.monitor == "val_loss":
            monitor_value = val_metrics.get("loss")
        else:
            monitor_value = (running or {}).get("loss")
            if monitor_value is not None:
                monitor_value = float(monitor_value)

        state.epoch = epoch + 1
        if cfg.checkpoint_dir:
            is_best = (
                monitor_value is not None
                and monitor_value < state.best_monitor
            )
            if is_best:
                state.best_monitor = monitor_value
                self._save(
                    os.path.join(cfg.checkpoint_dir, "best"), state
                )
            if cfg.save_last:
                self._save(
                    os.path.join(cfg.checkpoint_dir, "last"), state
                )
            if (epoch + 1) % cfg.every_n_epochs == 0:
                self._save(
                    os.path.join(cfg.checkpoint_dir, f"epoch_{epoch + 1}"),
                    state,
                )

    # ------------------------------------------------------------------
    def evaluate(self, eval_step, state: TrainState, loader) -> Dict[str, float]:
        """Loss metrics over a loader, invariant to ``pad_to_full``:
        duplicated pad rows in the final batch are sliced off before the
        step runs (the partial shape compiles once, eval-only).

        Multi-process: per-host slicing would give hosts different
        batch shapes (divergent SPMD programs), so the padded global
        batch runs whole and pad-duplicate rows keep their loss weight
        — a bias bounded by (global_batch - 1) / n_valid samples,
        identical on every host."""
        totals: Dict[str, float] = {}
        count = 0
        data_axis = self.mesh.shape["data"] if self.mesh is not None else 1
        multiproc = (
            self.mesh is not None and mesh_spans_processes(self.mesh)
        )
        for batch, n_real in self._iter_counted(loader):
            bs = jax.tree_util.tree_leaves(batch)[0].shape[0]
            if multiproc:
                batch, _ = pad_batch_to_multiple(
                    batch, self._pad_multiple()
                )
                batch = shard_batch(batch, self.mesh)
                n_real = jax.tree_util.tree_leaves(batch)[0].shape[0]
            elif n_real < bs:
                batch = jax.tree_util.tree_map(
                    lambda x: x[:n_real], batch
                )
            elif bs % data_axis == 0:
                batch = shard_batch(batch, self.mesh)
            metrics = eval_step(state.params, state.extra, batch)
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v) * n_real
            count += n_real
        return {k: v / max(count, 1) for k, v in totals.items()}

    @staticmethod
    def _iter_counted(loader):
        if hasattr(loader, "iter_with_counts"):
            yield from loader.iter_with_counts()
        else:
            for batch in loader:
                yield batch, jax.tree_util.tree_leaves(batch)[0].shape[0]

    # ------------------------------------------------------------------
    def _val_cer(self, model, datamodule, state: TrainState,
                 loader) -> Optional[Dict[str, float]]:
        """Greedy-decode character error rate on the validation split
        (CTC models only; decode flow: argmax -> tokenizer.decode ->
        merge_repeated, as in the reference runtime,
        /root/reference/tests/test_onnx.py:39-43)."""
        tokenizer = getattr(datamodule, "text_transform", None)
        if tokenizer is None or not hasattr(type(model), "greedy_decode"):
            return None
        from ..ops.metrics import error_rate

        # one jitted decode per (trainer, model): jit caches key on
        # function identity, so a fresh closure each epoch would
        # recompile the full decode graph every validation pass
        decode = getattr(self, "_cer_decode", None)
        if decode is None or self._cer_decode_model is not model:
            @jax.jit
            def decode(params, extra, audio, audio_len):
                return model.apply(
                    {"params": params, **extra}, audio, audio_len,
                    method=type(model).greedy_decode,
                )

            self._cer_decode = decode
            self._cer_decode_model = model

        edits = total = 0
        w_edits = w_total = 0
        # WER only makes sense when decoded text has whitespace word
        # boundaries (char modes); phone tokenizers join with '/' or
        # per-phone spaces and JA has no word boundaries
        word_level = not hasattr(tokenizer, "_separator")
        multiproc = (
            self.mesh is not None and mesh_spans_processes(self.mesh)
        )
        for batch, n_real in self._iter_counted(loader):
            (audio, audio_len), (text, text_len) = batch
            if multiproc:
                # decode the GLOBAL batch (local rows placed as this
                # host's slice), then score only this host's rows from
                # its addressable output shards; per-host counts are
                # summed once at the end
                pad = self._pad_multiple()
                (g_audio, g_audio_len) = shard_batch(
                    pad_batch_to_multiple(
                        (audio, audio_len), pad)[0],
                    self.mesh,
                )
                ids, out_len = decode(state.params, state.extra,
                                      g_audio, g_audio_len)
                ids = self._local_rows(ids)
                out_len = self._local_rows(out_len)
                n_real = min(n_real, len(ids))
            else:
                ids, out_len = decode(state.params, state.extra,
                                      audio, audio_len)
                ids, out_len = np.asarray(ids), np.asarray(out_len)
            refs, hyps = [], []
            for i in range(n_real):
                ref = tokenizer.decode(text[i, : int(text_len[i])])
                hyp = tokenizer.merge_repeated(
                    tokenizer.decode(ids[i, : int(out_len[i])])
                )
                refs.append(ref)
                hyps.append(hyp)
            e, t = error_rate(refs, hyps)
            edits += e
            total += t
            if word_level:
                we, wt = error_rate(
                    [r.split() for r in refs], [h.split() for h in hyps]
                )
                w_edits += we
                w_total += wt
        if multiproc:
            from jax.experimental import multihost_utils

            sums = multihost_utils.process_allgather(
                np.asarray([edits, total, w_edits, w_total], np.int64)
            ).sum(axis=0)
            edits, total, w_edits, w_total = (int(x) for x in sums)
        rates = {"cer": edits / max(total, 1)}
        if word_level:
            rates["wer"] = w_edits / max(w_total, 1)
        return rates

    @staticmethod
    def _local_rows(garr) -> np.ndarray:
        """This host's rows of a batch-sharded global array, in global
        row order (the loader's contiguous per-process slice)."""
        shards = sorted(
            garr.addressable_shards,
            key=lambda s: s.index[0].start or 0,
        )
        return np.concatenate([np.asarray(s.data) for s in shards])

    def run_eval(
        self, model, datamodule, state: TrainState, stage: str = "test"
    ) -> Dict[str, float]:
        """Run the loss over a test/validate stage (reference
        ``voice100 test/validate`` subcommands)."""
        task = make_task(model)
        if self.mesh is None:
            self.mesh = fit_mesh_for_batch(
                datamodule.batch_size, model=self.config.mesh_model_axis
            )
        datamodule.setup(stage)
        loader = (
            datamodule.test_dataloader()
            if stage == "test"
            else datamodule.val_dataloader()
        )
        _, eval_step = self._make_step_fns(
            task, task.make_optimizer(1)
        )
        with self._kernel_ctx():
            return self.evaluate(eval_step, state, loader)
