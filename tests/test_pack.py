"""Packed single-transfer batch upload (voice100_tpu/data/pack.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voice100_tpu.data.pack import (
    device_put_packed,
    pack_batch,
    unpack_batch,
)


def _assert_tree_equal(expect, got):
    flat_e, td_e = jax.tree_util.tree_flatten(expect)
    flat_g, td_g = jax.tree_util.tree_flatten(got)
    assert td_e == td_g
    for a, b in zip(flat_e, flat_g):
        b = np.asarray(b)
        assert np.asarray(a).dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), b)


def test_pack_roundtrip_nested_tree():
    batch = (
        (np.random.randn(4, 16, 8).astype(np.float32),
         np.array([3, 9, 16, 2], np.int32)),
        (np.random.randn(4, 7).astype(np.float16),
         np.arange(8, dtype=np.uint32).reshape(4, 2)),
    )
    _assert_tree_equal(batch, device_put_packed(batch))


def test_pack_bf16_leaf():
    import ml_dtypes

    batch = {"x": np.arange(12, dtype=np.float32)
             .astype(ml_dtypes.bfloat16).reshape(3, 4),
             "n": np.array([3], np.int32)}
    packed, spec = pack_batch(batch)
    assert packed is not None
    # one buffer, exact byte count
    assert packed.nbytes == 3 * 4 * 2 + 4
    _assert_tree_equal(batch, unpack_batch(jax.device_put(packed), spec))


@pytest.mark.parametrize("leaf", [
    np.array([True, False, True]),          # bool: narrow-int output
    np.arange(4, dtype=np.uint8),           # u8: narrow-int output
    np.arange(4, dtype=np.int16),           # i16: narrow-int output
    np.arange(4, dtype=np.int64),           # x64 usually disabled
])
def test_pack_fallback_dtypes(leaf):
    """Unsupported dtypes must fall back to per-leaf device_put (on
    remote-PJRT backends, programs with sub-32-bit integer outputs can
    wedge the stream — pack.py whitelists f32/f16/bf16/i32/u32)."""
    packed, spec = pack_batch((leaf, np.zeros(2, np.float32)))
    assert packed is None and spec is None
    out = device_put_packed((leaf, np.zeros(2, np.float32)))
    np.testing.assert_array_equal(
        np.asarray(out[0]).astype(np.int64), leaf.astype(np.int64)
    )


def test_pack_consumed_by_jit():
    """Unpacked leaves feed a jitted step exactly like device_put ones."""
    batch = (
        (np.random.randn(8, 32, 4).astype(np.float16),
         np.full((8,), 32, np.int32)),
        (np.random.randint(0, 29, (8, 12), dtype=np.int32),
         np.full((8,), 12, np.int32)),
    )

    @jax.jit
    def consume(b):
        (audio, al), (txt, tl) = b
        return (jnp.sum(audio.astype(jnp.float32)) + jnp.sum(al)
                + jnp.sum(txt) + jnp.sum(tl))

    got = float(consume(device_put_packed(batch)))
    expect = float(consume(jax.device_put(batch)))
    assert got == expect


def test_pack_empty_and_zero_size():
    batch = (np.zeros((0, 4), np.float32), np.array([5], np.int32))
    _assert_tree_equal(batch, device_put_packed(batch))
