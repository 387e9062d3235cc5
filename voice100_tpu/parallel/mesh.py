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

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "infer_param_spec",
    "shard_params",
    "shard_batch",
]


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
    """Mesh whose 'data' axis evenly divides ``batch_size``.

    Uses the largest divisor of batch_size that fits the available
    devices; surplus devices stay out of the mesh (models this small
    prefer a clean DP layout over padding games).
    """
    import logging
    import math

    n = len(jax.devices())
    avail = max(1, n // model)
    data = math.gcd(batch_size, avail)
    # prefer the largest divisor of batch_size not exceeding avail
    for d in range(avail, 0, -1):
        if batch_size % d == 0:
            data = d
            break
    used = data * model
    if used < n:
        logging.getLogger(__name__).warning(
            "fit_mesh_for_batch: batch_size=%d is not divisible by the "
            "%d available devices (model=%d); using a %dx%d mesh and "
            "leaving %d device(s) idle. Pick a batch size divisible by "
            "the device count to use the full fleet.",
            batch_size, n, model, data, model, n - used,
        )
    return make_mesh(jax.devices()[:used], data=data, model=model)


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


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh per ``infer_param_spec``."""
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, infer_param_spec(leaf, mesh))
        ),
        params,
    )


def shard_batch(batch, mesh: Mesh):
    """Place host batch arrays with the leading axis over 'data'."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
