"""Pallas CTC lattice kernels vs the lax.scan reference.

Runs the kernels in interpret mode on CPU; on-hardware parity and the
~130 ms -> ~2 ms speedup are recorded in PLAN.md and bench.py. The
scan implementation itself is torch-parity-tested in
tests/test_ops_parity.py, so matching it transitively pins torch
semantics (blank=0, masked lengths, zero_infinity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voice100_tpu.ops.ctc import ctc_loss
from voice100_tpu.ops.ctc_pallas import ctc_ll_pallas


def _loss_from_ll(ll, target_lengths):
    loss = -ll
    loss = jnp.where(loss >= 1e30 / 2, 0.0, loss)
    return jnp.mean(loss / jnp.maximum(target_lengths, 1))


def _random_case(seed, B=4, T=37, V=11, L=9):
    rng = np.random.RandomState(seed)
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.randn(B, T, V).astype(np.float32))
    )
    tgt = jnp.asarray(rng.randint(1, V, size=(B, L)).astype(np.int32))
    il = jnp.asarray(rng.randint(T // 2, T + 1, size=(B,)), jnp.int32)
    tl = jnp.asarray(rng.randint(0, L + 1, size=(B,)), jnp.int32)
    return lp, tgt, il, tl


@pytest.mark.parametrize("seed", [0, 1])
def test_ctc_pallas_ll_and_grad_match_scan(seed):
    lp, tgt, il, tl = _random_case(seed)
    ll_ref = -ctc_loss(lp, tgt, il, tl, reduction="none")
    ll_pal = ctc_ll_pallas(lp, tgt, il, tl, True)
    np.testing.assert_allclose(
        np.asarray(ll_pal), np.asarray(ll_ref), rtol=1e-5, atol=1e-5
    )

    g_ref = jax.grad(lambda x: ctc_loss(x, tgt, il, tl))(lp)
    g_pal = jax.grad(
        lambda x: _loss_from_ll(ctc_ll_pallas(x, tgt, il, tl, True), tl)
    )(lp)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=1e-4, atol=1e-6
    )


def test_ctc_pallas_repeats_and_infeasible():
    """Repeated labels exercise the skip gate; an infeasible row
    (target longer than frames) exercises zero_infinity's zero grad."""
    rng = np.random.RandomState(2)
    B, T, V, L = 4, 24, 7, 9
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.randn(B, T, V).astype(np.float32))
    )
    tgt = jnp.asarray(
        [
            [3, 3, 4, 4, 1, 1, 2, 2, 5],
            [1, 1, 1, 1, 1, 1, 1, 1, 1],
            [2, 5, 2, 5, 2, 5, 2, 5, 2],
            [6, 6, 6, 6, 6, 6, 6, 6, 6],
        ],
        jnp.int32,
    )
    il = jnp.asarray([24, 10, 24, 12], jnp.int32)  # row 1 infeasible
    tl = jnp.asarray([9, 9, 9, 9], jnp.int32)

    ref = ctc_loss(lp, tgt, il, tl)
    pal = _loss_from_ll(ctc_ll_pallas(lp, tgt, il, tl, True), tl)
    np.testing.assert_allclose(float(pal), float(ref), rtol=1e-5)

    g_ref = jax.grad(lambda x: ctc_loss(x, tgt, il, tl))(lp)
    g_pal = jax.grad(
        lambda x: _loss_from_ll(ctc_ll_pallas(x, tgt, il, tl, True), tl)
    )(lp)
    assert bool(jnp.isfinite(g_pal).all())
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=1e-4, atol=1e-6
    )
    # the infeasible row's gradient is exactly zero (zero_infinity)
    assert float(jnp.abs(g_pal[1]).max()) == 0.0


def test_ctc_loss_dispatch_unchanged_on_cpu():
    """On CPU the public ctc_loss keeps the scan path (kernel gating,
    ops/ctc.py:_ctc_mode); a kernel_sharding mesh or the env override
    flips it."""
    import voice100_tpu.ops.ctc as ctc_mod

    assert ctc_mod._ctc_mode(0, batch=8) == "scan"
    assert ctc_mod._ctc_mode(1, batch=8) == "scan"


def test_viterbi_pallas_matches_scan():
    """Paths are integer-exact vs the scan Viterbi (which is itself
    exact-match tested vs the reference NumPy DP in test_models.py)."""
    from voice100_tpu.ops.ctc import ctc_viterbi_align
    from voice100_tpu.ops.ctc_pallas import ctc_viterbi_pallas

    rng = np.random.RandomState(3)
    B, T, V, L = 5, 41, 11, 9
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.randn(B, T, V).astype(np.float32))
    )
    tgt = jnp.asarray(rng.randint(1, V, size=(B, L)).astype(np.int32))
    tgt = tgt.at[0].set(jnp.asarray([2, 2, 3, 3, 1, 1, 4, 4, 5]))
    il = jnp.asarray([41, 33, 25, 41, 20], jnp.int32)
    tl = jnp.asarray([9, 6, 4, 9, 2], jnp.int32)
    ref = ctc_viterbi_align(lp, tgt, il, tl)
    score, path, labels = ctc_viterbi_pallas(lp, tgt, il, tl, True)
    np.testing.assert_allclose(
        np.asarray(score), np.asarray(ref.score), rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(path), np.asarray(ref.path))
    np.testing.assert_array_equal(
        np.asarray(labels), np.asarray(ref.labels)
    )
