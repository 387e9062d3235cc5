"""Device mesh and sharding policy.

The reference has no in-repo parallelism (SURVEY.md §2.4): training is
single-device Lightning. This framework treats scaling as first-class
the TPU way: a ``jax.sharding.Mesh`` over ('data', 'model') axes;
batches shard over 'data' (DP), and the wide recurrent/projection
weights optionally shard over 'model' (TP). Everything else is GSPMD —
``jax.jit`` inserts the all-reduces over ICI from the sharding
annotations; there is no hand-written collective code in the training
path.

Models in this family are small (0.7M-12M params), so the default and
recommended layout is pure DP (model=1); TP support exists so the same
train step scales to wider variants and is exercised by the multichip
dry run.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "infer_param_spec",
    "mesh_spans_processes",
    "replicate_tree",
    "shard_params",
    "shard_batch",
    "pad_batch_to_multiple",
    "kernel_sharding",
    "active_kernel_mesh",
    "kernel_batch_axes",
    "kernel_batch_divisor",
]


def pallas_interpret() -> bool:
    """Whether Pallas kernels must run in interpret mode: only TPU
    backends compile the pltpu kernels; anything else (cpu tests, a
    forced GPU shard run) would fail to lower at trace time."""
    return jax.default_backend() in ("cpu", "gpu")


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def fit_mesh_for_batch(batch_size: int, model: int = 1) -> Mesh:
    """Mesh sized for wall-clock-optimal DP over ``batch_size``.

    Per-device work is ``ceil(batch_size / data)`` rows, so the 'data'
    axis is chosen to minimize that first (the full fleet always
    achieves the minimum); among sizes with the same per-device rows it
    prefers the largest divisor of ``batch_size`` (no padding), else
    the smallest size (least padding). Non-divisible batches are padded
    by replicating trailing samples (:func:`pad_batch_to_multiple`,
    applied by the Trainer) — statistically equivalent to sampling
    those samples twice in the step. Devices left out of the mesh under
    this policy never cost wall time (using them would not reduce
    per-device rows).
    """
    import logging

    n = len(jax.devices())
    avail = max(1, n // model)
    min_rows = -(-batch_size // avail)
    candidates = [
        d for d in range(1, avail + 1)
        if -(-batch_size // d) == min_rows
    ]
    divisors = [d for d in candidates if batch_size % d == 0]
    data = max(divisors) if divisors else min(candidates)
    used = data * model
    log = logging.getLogger(__name__)
    if batch_size % data != 0:
        log.warning(
            "fit_mesh_for_batch: batch_size=%d is not divisible by the "
            "%dx%d mesh; each batch is padded to %d by replicating "
            "trailing samples (duplicates carry normal loss weight — "
            "equivalent to drawing them twice). Pick a batch size "
            "divisible by %d devices to avoid the padding.",
            batch_size, data, model, min_rows * data, data,
        )
    elif used < n:
        log.warning(
            "fit_mesh_for_batch: using a %dx%d mesh and leaving %d "
            "device(s) idle — with batch_size=%d the idle devices "
            "could not reduce the %d rows each device already "
            "processes, so this layout is wall-clock optimal.",
            data, model, n - used, batch_size, min_rows,
        )
    return make_mesh(jax.devices()[:used], data=data, model=model)


def pad_batch_to_multiple(batch, multiple: int):
    """Pad every array's leading (batch) axis up to a multiple of
    ``multiple`` by wrap-around replication of real samples — the same
    convention as the loader's ``pad_to_full`` final-batch padding.
    Returns ``(batch, n_real)``; no-op when already divisible."""
    leaves = jax.tree_util.tree_leaves(batch)
    if not leaves:
        return batch, 0
    n_real = leaves[0].shape[0]
    target = -(-n_real // multiple) * multiple
    if target == n_real:
        return batch, n_real
    idx = np.arange(target) % n_real
    return (
        jax.tree_util.tree_map(lambda x: np.asarray(x)[idx], batch),
        n_real,
    )


# ----------------------------------------------------------------------
# Kernel sharding context: lets the Pallas fast paths (ops/lstm.py,
# ops/ctc.py) compose with a data-parallel mesh. pallas_call does not
# auto-partition under GSPMD, so on a sharded mesh the ops must wrap
# their kernels in jax.shard_map over the 'data' axis — but the ops are
# called deep inside a model's apply with no mesh in scope. The Trainer
# (training/trainer.py) enters this context for the duration of a fit
# when the layout is pure DP (model axis == 1, batch over 'data',
# params replicated), and the ops pick the mesh up at TRACE time.
#
# Trace-time semantics: a step function jitted while the context is
# active bakes the shard_map in; entering/exiting the context does not
# affect already-compiled programs.
_KERNEL_MESH: Optional[Mesh] = None


@contextlib.contextmanager
def kernel_sharding(mesh: Optional[Mesh]):
    """Declare that batch-leading arrays inside jitted code are sharded
    over ``mesh`` axis 'data' with parameters replicated across it.

    Under this context the Pallas LSTM/CTC kernels run per-shard via
    ``jax.shard_map`` instead of silently falling back to the scan
    implementations. On tensor-parallel meshes the kernels run
    fleet-flattened (batch over 'data' x 'model', weights all-gathered
    inside the shard_map — see :func:`kernel_batch_axes`).
    """
    global _KERNEL_MESH
    prev = _KERNEL_MESH
    _KERNEL_MESH = mesh
    try:
        yield
    finally:
        _KERNEL_MESH = prev


def active_kernel_mesh() -> Optional[Mesh]:
    """The mesh declared by :func:`kernel_sharding`, or None."""
    return _KERNEL_MESH


def kernel_batch_axes(mesh: Mesh) -> tuple:
    """Mesh axes the kernel shard_map splits the batch over.

    Pure DP splits over 'data'. On a tensor-parallel mesh the LSTM/CTC
    weights are small (a few MB), so instead of forfeiting the Pallas
    kernels the batch splits over the WHOLE fleet ('data' x 'model'):
    inside the shard_map the weights are replicated (GSPMD all-gathers
    the TP shards once per step) and every device runs the kernel on
    batch/(data*model) rows. Gradient psums from the shard_map
    transpose reduce over both axes — the full DP gradient.
    """
    if mesh.shape.get("model", 1) > 1:
        return ("data", "model")
    return ("data",)


def kernel_batch_divisor(mesh: Mesh) -> int:
    """Batch rows must divide this for the kernel shard path."""
    n = 1
    for axis in kernel_batch_axes(mesh):
        n *= mesh.shape.get(axis, 1)
    return max(n, 1)


def data_shard_map(fn, mesh: Mesh, n_batch_args: int, n_static_args: int = 0):
    """Wrap ``fn(*replicated, *batched)`` in shard_map over the kernel
    batch axes (see :func:`kernel_batch_axes`).

    The first ``n_static_args`` arguments are replicated (P()); the last
    ``n_batch_args`` are sharded on their leading axis.
    ``check_vma=False`` because pallas_call is not varying-axis aware;
    shard_map's transpose then conservatively psums cotangents of the
    replicated arguments, which is exactly the DP gradient all-reduce.
    """
    axes = kernel_batch_axes(mesh)
    in_specs = (P(),) * n_static_args + (P(axes),) * n_batch_args
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=P(axes),
        check_vma=False,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over 'data', rest replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def infer_param_spec(path_leaf, mesh: Mesh, min_size: int = 256):
    """Tensor-parallel PartitionSpec for a parameter.

    Policy: shard the largest axis that divides evenly by the 'model'
    axis size and is at least ``min_size`` — this catches the LSTM gate
    matrices [4H, D], conv kernels [k, in, out] on their channel axes,
    and dense kernels, while leaving biases/norms replicated. With
    model=1 everything is replicated (pure DP).
    """
    leaf = path_leaf
    model_size = mesh.shape["model"]
    if model_size == 1 or leaf.ndim == 0:
        return P()
    sizes = list(leaf.shape)
    candidates = [
        (size, dim)
        for dim, size in enumerate(sizes)
        if size % model_size == 0 and size >= min_size
    ]
    if not candidates:
        return P()
    _, dim = max(candidates)
    spec = [None] * leaf.ndim
    spec[dim] = "model"
    return P(*spec)


def mesh_spans_processes(mesh: Mesh) -> bool:
    """True when the mesh includes devices of other processes (a real
    multi-process run under ``jax.distributed.initialize``)."""
    pi = jax.process_index()
    return any(d.process_index != pi for d in mesh.devices.flat)


def _place_global(leaf, mesh: Mesh, spec) -> jax.Array:
    """Build a global array on a multi-process mesh from a host value
    every process holds in full (``jax.device_put`` only talks to
    addressable devices; ``make_array_from_callback`` asks each process
    for exactly the index slices its local devices need)."""
    leaf = np.asarray(leaf)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        leaf.shape, sharding, lambda idx: leaf[idx]
    )


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh per ``infer_param_spec``.

    On a multi-process mesh every process passes the SAME full host
    values (model init is seed-deterministic, so each host's init is
    bit-identical) and receives global arrays."""
    if mesh_spans_processes(mesh):
        return jax.tree_util.tree_map(
            lambda leaf: _place_global(
                leaf, mesh, infer_param_spec(np.asarray(leaf), mesh)
            ),
            params,
        )
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, infer_param_spec(leaf, mesh))
        ),
        params,
    )


def replicate_tree(tree, mesh: Mesh):
    """Place a host pytree fully replicated over the mesh (extra
    variable collections, RNG keys, restored optimizer state). On a
    multi-process mesh the values must be identical on every host."""
    if mesh_spans_processes(mesh):
        return jax.tree_util.tree_map(
            lambda leaf: _place_global(leaf, mesh, P()), tree
        )
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, sharding), tree
    )


def shard_batch(batch, mesh: Mesh):
    """Place host batch arrays with the leading axis over 'data'.

    Multi-process: each process passes its LOCAL rows (the loader's
    contiguous per-process slice of the global batch) and the global
    array is their process-order concatenation — exactly the
    single-process batch row order (data/loader.py
    _epoch_index_chunks)."""
    if mesh_spans_processes(mesh):
        from jax.experimental import multihost_utils

        return multihost_utils.host_local_array_to_global_array(
            batch, mesh, P("data")
        )
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
