"""Packed host->device batch upload: one PJRT transfer per batch.

``jax.device_put`` of a batch pytree issues one PJRT transfer per leaf,
and every transfer carries a fixed dispatch cost — microseconds on a
PCIe-attached host, a full network round trip on a tunneled / remote
PJRT link. A typical collated batch here has 4+ leaves (audio, lengths,
text, lengths), so the fixed cost quadruples. Packing the whole batch
into ONE contiguous uint8 buffer collapses that to a single transfer; a
tiny jitted program on the device slices and bitcasts the leaves back
out (the bytes are already in HBM, so unpacking is a handful of fused
device-side copies).

The reference has no equivalent — its CUDA H2D copies enqueue on a
stream with ~µs latency (voice100/data_modules.py:628-666 relies on
DataLoader workers + pinned memory). On TPU serving/training hosts the
same trick removes per-leaf dispatch from the step critical path.

Only f32/f16/bf16/i32/u32 leaves pack — exactly what collate and the
half-precision upload paths emit. Narrow integer / bool leaves fall
back to per-leaf ``jax.device_put``: sub-32-bit integer jit OUTPUTS are
exotic on TPU (measured on this environment's remote-PJRT backend:
consuming an unpacked i16/u8/bool leaf wedges the stream, while
f32/f16/i32 round-trip cleanly).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pack_batch", "unpack_batch", "device_put_packed"]

_PACK_DTYPES = {
    np.dtype(np.float32),
    np.dtype(np.float16),
    np.dtype(np.int32),
    np.dtype(np.uint32),
}
try:  # the bf16 upload-quantize path emits ml_dtypes.bfloat16 leaves
    import ml_dtypes

    _PACK_DTYPES.add(np.dtype(ml_dtypes.bfloat16))
except ImportError:  # pragma: no cover
    pass


def _packable(arr: np.ndarray) -> bool:
    return arr.dtype in _PACK_DTYPES


def pack_batch(batch):
    """Flatten a batch pytree into ``(uint8 buffer, static spec)``.

    Returns ``(None, None)`` when any leaf is not packable; callers
    fall back to per-leaf upload.
    """
    leaves, treedef = jax.tree_util.tree_flatten(batch)
    arrs = []
    for leaf in leaves:
        a = np.ascontiguousarray(leaf)
        if not _packable(a):
            return None, None
        arrs.append(a)
    offsets = []
    total = 0
    for a in arrs:
        offsets.append(total)
        total += a.nbytes
    packed = np.empty(total, np.uint8)
    for a, off in zip(arrs, offsets):
        packed[off:off + a.nbytes] = a.view(np.uint8).ravel()
    spec = (
        treedef,
        tuple(
            # dtype by NAME: round-trips extension dtypes (bfloat16)
            # that numpy's .str cannot express
            (a.shape, a.dtype.name, off)
            for a, off in zip(arrs, offsets)
        ),
    )
    return packed, spec


@partial(jax.jit, static_argnums=(1,))
def unpack_batch(packed, spec):
    """Reconstruct the batch pytree from the packed device buffer.

    Pure device-side slices + bitcasts; compiled once per (shapes,
    dtypes) spec — i.e. once per collate bucket, same cadence as the
    train step itself.
    """
    treedef, leaf_specs = spec
    leaves = []
    for shape, dtype_str, off in leaf_specs:
        dt = np.dtype(dtype_str)
        n = int(np.prod(shape, dtype=np.int64))
        seg = jax.lax.slice(packed, (off,), (off + n * dt.itemsize,))
        if dt == np.bool_:
            leaf = seg != 0
        elif dt.itemsize == 1:
            leaf = jax.lax.bitcast_convert_type(seg, jnp.dtype(dt))
        else:
            leaf = jax.lax.bitcast_convert_type(
                seg.reshape(n, dt.itemsize), jnp.dtype(dt)
            )
        leaves.append(leaf.reshape(shape))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def device_put_packed(batch, device=None):
    """Upload a batch pytree in ONE transfer (fallback: plain
    ``jax.device_put`` when a leaf dtype cannot be byte-packed)."""
    packed, spec = pack_batch(batch)
    if packed is None:
        return jax.device_put(batch, device)
    buf = (
        jax.device_put(packed, device)
        if device is not None
        else jax.device_put(packed)
    )
    # Finish the transfer before dispatching unpack: a fresh-spec
    # unpack means a compile RPC, and on remote-PJRT links a compile
    # racing an in-flight bulk transfer can wedge the stream (measured
    # on this environment's tunneled backend). Callers run this on a
    # prefetch thread, so blocking here still overlaps device steps.
    buf.block_until_ready()
    return unpack_batch(buf, spec)
