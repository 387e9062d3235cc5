"""HBM-resident feature cache: epoch batches assembled on device.

The reference re-reads features from host RAM every epoch and re-uploads
them to the accelerator (torch DataLoader over a disk/RAM feature cache,
voice100/data_modules.py:628-666) — cheap over PCIe, dominant over a
remote or bandwidth-limited host->device link. The TPU-native
alternative for corpora that fit in HBM is to keep the padded feature
rows ON DEVICE: each clip uploads once, and every later epoch assembles
its shuffled batches with a device-side gather, moving only the batch's
row indices (a few hundred bytes) over the link.

Sizing: one v5e chip (16 GB) holds ~350 hours of float16 80-dim log-mel
at 10 ms hop; data-parallel pods shard the store with the batch. The
cache is OPT-IN (``Trainer(device_cache=True)`` or direct use).

Bucketed collate: batch shapes vary by bucket (collate.py pads each
batch to its own rounded max length), so the store keeps every row at
the LARGEST extent seen so far, fills beyond each row's scattered
extent with the collate's own per-leaf pad value (``pad_values``, the
attribute the collate fns in data/collate.py carry), grows on demand,
and slices gathers down to the requesting batch's bucket. A row's true
length never exceeds any bucket it appears under, so sliced gathers are
byte-identical to host collation. Without ``pad_values`` the cache
falls back to requiring one fixed bucket.

Warm protocol: batches whose rows are not all cached yet upload the
collated batch (packed, one transfer) and scatter its rows into the
store; once every row of a batch is cached, the batch is gathered
instead. This is self-healing — ``drop_last`` epochs that miss a tail
clip simply upload it whenever it first appears.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .pack import device_put_packed

__all__ = ["DeviceFeatureCache"]


def _scatter(store, rows, idx):
    """Write each row at its batch extent; the store beyond that extent
    already holds the pad value (init/growth fill), so rows read back
    correctly at any later bucket."""
    def upd(s, r):
        index = (idx,) + tuple(slice(0, d) for d in r.shape[1:])
        return s.at[index].set(r)

    return jax.tree_util.tree_map(upd, store, rows)


class DeviceFeatureCache:
    """Wraps ``loader.iter_with_indices()`` into device-resident batches.

    ``place(indices, batch)`` returns the batch ON DEVICE either by
    upload+scatter (rows not yet cached) or by pure device gather.
    ``epoch_batches(loader)`` is the convenience iterator.
    """

    def __init__(self, n_items: int, max_bytes: Optional[int] = None,
                 pad_values=None, mesh=None, var_specs=None) -> None:
        self.n_items = int(n_items)
        self.max_bytes = max_bytes
        # var_specs (collate.py): feature-leaf index -> (length-leaf
        # index, bucket kind). With it, place() tracks each row's TRUE
        # lengths from the batch's length leaves, and epoch_plan()
        # groups the epoch's batches by the collate bucket those
        # lengths imply — scan-dispatch gathers then slice each group
        # to ITS bucket instead of computing at the store's full
        # extents (the round-4 bucketed-collate throughput cliff).
        self._var_specs = dict(var_specs) if var_specs else None
        self._lengths = None
        if self._var_specs:
            self._spec_cols = {
                li: col
                for col, li in enumerate(sorted(self._var_specs))
            }
            self._lengths = np.zeros(
                (self.n_items, len(self._spec_cols)), np.int64
            )
        # mesh: a ('data','model') mesh shards the store's ITEM axis
        # over 'data' (each chip holds corpus/D rows — pods scale cache
        # capacity with fleet size) and replicates it over 'model';
        # gathers emit batches sharded over 'data', matching
        # shard_batch's layout, with GSPMD inserting the collectives.
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        if self.mesh is not None:
            data = int(self.mesh.shape["data"])
            # pad the item axis to the 'data' axis size for even shards
            self.n_rows = -(-self.n_items // data) * data
        else:
            self.n_rows = self.n_items
        self._store = None
        self._cached = np.zeros(self.n_items, bool)
        # donate the store: scatter updates in place instead of copying
        # the whole corpus-sized array every warm batch
        self._scatter = jax.jit(_scatter, donate_argnums=(0,))
        self._gather_fns = {}
        self._shapes = None
        self._treedef = None
        self._pad_leaves = (
            None if pad_values is None
            else jax.tree_util.tree_leaves(pad_values)
        )

    def _store_sharding(self):
        if self.mesh is None:
            return None
        from ..parallel.mesh import NamedSharding, P

        return NamedSharding(self.mesh, P("data"))

    def _batch_sharding(self):
        if self.mesh is None:
            return None
        from ..parallel.mesh import batch_sharding

        return batch_sharding(self.mesh)

    @property
    def complete(self) -> bool:
        return bool(self._cached.all())

    def nbytes(self) -> int:
        if self._store is None:
            return 0
        return sum(
            leaf.nbytes for leaf in jax.tree_util.tree_leaves(self._store)
        )

    def _total_bytes(self, shapes) -> int:
        return sum(
            int(np.prod((self.n_rows,) + shape))
            * np.dtype(dtype).itemsize
            for shape, dtype in shapes
        )

    def _check_budget(self, shapes) -> None:
        total = self._total_bytes(shapes)
        if self.max_bytes is not None and total > self.max_bytes:
            raise ValueError(
                f"device feature cache would need {total/1e9:.2f} GB "
                f"> max_bytes={self.max_bytes/1e9:.2f} GB; use the "
                "streaming loader for corpora that exceed device memory"
            )

    def _init_store(self, batch) -> None:
        import jax.numpy as jnp

        leaves, treedef = jax.tree_util.tree_flatten(batch)
        self._treedef = treedef
        self._shapes = [
            (np.shape(leaf)[1:], np.asarray(leaf).dtype)
            for leaf in leaves
        ]
        self._check_budget(self._shapes)
        if self._pad_leaves is None:
            pads = [0] * len(leaves)
        else:
            if len(self._pad_leaves) != len(leaves):
                raise ValueError(
                    f"pad_values has {len(self._pad_leaves)} leaves, "
                    f"batch has {len(leaves)}"
                )
            pads = self._pad_leaves
        sharding = self._store_sharding()
        if sharding is None:
            leaves = [
                jnp.full((self.n_rows,) + shape, pad, dtype)
                for (shape, dtype), pad in zip(self._shapes, pads)
            ]
        else:
            # host-build each leaf and place sharded: every chip holds
            # only its n_rows/D slice of the item axis
            leaves = [
                jax.device_put(
                    np.full((self.n_rows,) + shape, pad, dtype), sharding
                )
                for (shape, dtype), pad in zip(self._shapes, pads)
            ]
        self._store = jax.tree_util.tree_unflatten(treedef, leaves)

    def _batch_shapes(self, batch):
        leaves = jax.tree_util.tree_leaves(batch)
        if len(leaves) != len(self._shapes):
            raise ValueError(
                f"batch has {len(leaves)} leaves, store has "
                f"{len(self._shapes)}"
            )
        out = []
        for leaf, (shape, dtype) in zip(leaves, self._shapes):
            got_shape = np.shape(leaf)[1:]
            got_dtype = np.asarray(leaf).dtype
            if got_dtype != dtype or len(got_shape) != len(shape):
                raise ValueError(
                    "device feature cache row layout drifted (stored "
                    f"rows {shape}/{dtype}, got {got_shape}/{got_dtype})"
                )
            out.append(got_shape)
        return out

    def _fit_extents(self, batch) -> None:
        """Grow the store (pad-value fill) to cover this batch's bucket;
        strict fixed-bucket check when no pad values are known."""
        got = self._batch_shapes(batch)
        if self._pad_leaves is None:
            for g, (shape, dtype) in zip(got, self._shapes):
                if g != shape:
                    raise ValueError(
                        "device feature cache needs a fixed collate "
                        f"bucket (stored rows {shape}/{dtype}, got "
                        f"{g}/{dtype}) — the collate_fn carries no "
                        "pad_values; set VOICE100_TPU_TIME_BUCKET/"
                        "VOICE100_TPU_TEXT_BUCKET to a single bucket"
                    )
            return
        targets = [
            tuple(max(a, b) for a, b in zip(shape, g))
            for g, (shape, _) in zip(got, self._shapes)
        ]
        if all(t == shape for t, (shape, _) in zip(targets, self._shapes)):
            return
        import jax.numpy as jnp

        new_shapes = [
            (t, dtype) for t, (_, dtype) in zip(targets, self._shapes)
        ]
        self._check_budget(new_shapes)
        leaves = jax.tree_util.tree_leaves(self._store)
        sharding = self._store_sharding()
        grown = []
        for s, tgt, (shape, dtype), pad in zip(
                leaves, targets, self._shapes, self._pad_leaves):
            if tgt != shape:
                s = jnp.pad(
                    s,
                    [(0, 0)] + [(0, t - c) for t, c in zip(tgt, shape)],
                    constant_values=np.asarray(pad, dtype),
                )
                if sharding is not None:
                    # pad's output sharding is inferred; re-pin the
                    # item-axis layout explicitly
                    s = jax.device_put(s, sharding)
            grown.append(s)
        self._store = jax.tree_util.tree_unflatten(self._treedef, grown)
        self._shapes = new_shapes
        self._gather_fns.clear()

    def _gather_fn(self, shapes):
        key = tuple(shapes)
        fn = self._gather_fns.get(key)
        if fn is None:
            treedef = self._treedef

            def gather(store, idx):
                leaves = jax.tree_util.tree_leaves(store)
                out = [
                    s[(idx,) + tuple(slice(0, d) for d in shape)]
                    for s, shape in zip(leaves, key)
                ]
                return jax.tree_util.tree_unflatten(treedef, out)

            batch_sh = self._batch_sharding()
            fn = jax.jit(
                gather,
                **({} if batch_sh is None
                   else {"out_shardings": batch_sh}),
            )
            self._gather_fns[key] = fn
        return fn

    def _track_lengths(self, idx, batch) -> None:
        """Record each row's true lengths (from the batch's EXACT
        length leaves — collate never buckets those) so epoch_plan can
        predict a regrouped batch's collate bucket."""
        if self._var_specs is None:
            return
        leaves = jax.tree_util.tree_leaves(batch)
        for li, (len_leaf, _kind) in self._var_specs.items():
            self._lengths[idx, self._spec_cols[li]] = np.asarray(
                leaves[len_leaf]
            )[: len(idx)]

    def place(self, indices, batch):
        """Return ``batch`` on device; cache rows as a side effect."""
        idx = np.asarray(indices, np.int32)
        if self._store is None:
            self._init_store(batch)
        self._fit_extents(batch)
        self._track_lengths(idx, batch)
        if self._cached[idx].all():
            shapes = self._batch_shapes(batch)
            return self._gather_fn(shapes)(
                self._store, jax.device_put(idx)
            )
        if self.mesh is None:
            placed = device_put_packed(batch)
        else:
            from ..parallel.mesh import shard_batch

            placed = shard_batch(batch, self.mesh)
        self._store = self._scatter(
            self._store, placed, jax.device_put(idx)
        )
        self._cached[idx] = True
        return placed

    def epoch_batches(self, loader):
        """Iterate one epoch of device-resident batches."""
        for indices, batch in loader.iter_with_indices():
            yield self.place(indices, batch)

    # -- multi-step scan support (training/trainer.py steps_per_dispatch)

    @property
    def store(self):
        """The device-resident store pytree (None before first place)."""
        return self._store

    def gather_rows(self, store, idx, extents=None):
        """Pure batch assembly — traceable inside jit/lax.scan (unlike
        :meth:`place`, which slices to the requesting bucket on host).
        ``extents`` (a static per-leaf row-shape tuple from
        :meth:`epoch_plan`) slices each leaf to its batch group's
        collate bucket; without it the gather runs at the store's FULL
        extents. Rows beyond their true extent hold the collate pad
        value, and lengths are stored rows themselves, so masked
        training losses match host collation either way. On a sharded
        store the gathered batch is constrained to shard_batch's
        layout (batch rows over 'data'); GSPMD inserts the collectives
        that move rows between chips."""
        leaves = jax.tree_util.tree_leaves(store)
        if extents is None:
            out = [s[idx] for s in leaves]
        else:
            out = [
                s[(idx,) + tuple(slice(0, d) for d in shape)]
                for s, shape in zip(leaves, extents)
            ]
        batch_sh = self._batch_sharding()
        if batch_sh is not None:
            out = [
                jax.lax.with_sharding_constraint(o, batch_sh)
                for o in out
            ]
        return jax.tree_util.tree_unflatten(self._treedef, out)

    def epoch_plan(self, loader):
        """The epoch's batches grouped by collate bucket: a list of
        ``(extents, idx_mat)`` where ``extents`` is the per-leaf row
        shape every batch in the group collates to (host collation
        would produce exactly these shapes) and ``idx_mat`` is that
        group's ``[k, B]`` row-index matrix. Groups are MAXIMAL
        CONSECUTIVE RUNS of equal-bucket batches — the epoch's batch
        order is preserved exactly, so the scanned trajectory equals a
        per-step run of the same epoch on any corpus. Long runs (and
        hence long scans) come from the SAMPLER: the loader's
        ``length_hint`` bucketing emits each epoch as contiguous
        bucket groups. Falls back to one full-extent group when the
        collate carries no ``var_specs``; returns ``None`` under
        :meth:`epoch_index_matrix`'s conditions.
        """
        mat = self.epoch_index_matrix(loader)
        if mat is None:
            return None
        if self._var_specs is None:
            return [(tuple(s for s, _ in self._shapes), mat)]
        from .collate import bucket_extent

        runs = []
        cur_key, cur_rows = None, []
        for row in mat:
            extents = []
            for li, (shape, _dtype) in enumerate(self._shapes):
                spec = self._var_specs.get(li)
                if spec is None:
                    extents.append(shape)
                    continue
                n = int(self._lengths[row, self._spec_cols[li]].max())
                # a store extent can undercut the bucket when the env
                # granularity grew between warm and plan time; clamp
                extents.append(
                    (min(bucket_extent(spec[1], n), shape[0]),)
                    + shape[1:]
                )
            key = tuple(extents)
            if key != cur_key:
                if cur_rows:
                    runs.append((cur_key, np.stack(cur_rows)))
                cur_key, cur_rows = key, []
            cur_rows.append(row)
        if cur_rows:
            runs.append((cur_key, np.stack(cur_rows)))
        return runs

    def epoch_index_matrix(self, loader):
        """The epoch's batches as a ``[n_batches, B]`` int32 row-index
        matrix (after ``loader.set_epoch``), or ``None`` when the epoch
        cannot be served by pure device gathers: store absent or not
        yet fully cached (the warm epoch must stream through
        :meth:`place`), or ragged batch rows (no ``pad_to_full`` and a
        tail batch). When this returns a matrix, the entire epoch needs
        no host decode, collate, or feature upload — only these indices
        cross the link."""
        if self._store is None or not self.complete:
            return None
        chunks = loader._epoch_index_chunks()
        if not chunks:
            return None
        rows = [loader._effective_indices(idx) for idx in chunks]
        if any(len(r) != len(rows[0]) for r in rows[1:]):
            return None
        return np.stack(rows).astype(np.int32)
