"""Fused Pallas TPU kernels for the CTC loss lattice.

Why: the CTC forward algorithm is a T-step recursion over a tiny
``[B, 2L+1]`` alpha lattice. As a ``lax.scan`` (ops/ctc.py:79-101) each
of the ~500 steps costs far more in per-step scan/launch overhead than
in arithmetic — measured 67 ms forward / 129 ms forward+backward at
asr_en_base shapes (B=64, T=500, S=257) on v5e, ~77% of the whole
training step. These kernels run the entire time loop inside one
``pallas_call`` with the lattice resident in VMEM, following the same
sequential-grid + VMEM-scratch-carry pattern as ops/lstm_pallas.py.

Structure:

* emissions ``lp_z[b,t,s] = log_probs[b,t,z_s]`` are gathered once
  outside the kernel (one batched XLA gather);
* the forward kernel streams ``lp_z`` in and the full alpha lattice
  ``[T, B, S]`` out (the backward needs it);
* the backward kernel is the exact adjoint of the masked forward
  recursion (including per-sample length holds and lattice validity
  masks), carrying the adjoint ``g = dLL/dalpha_t`` backward in VMEM
  and emitting ``dLL/d lp_z``;
* the vocab scatter ``dLL/d log_probs = sum_s [z_s=v] dLL/d lp_z`` is
  one one-hot matmul outside (MXU-friendly).

The public entry is :func:`ctc_ll_pallas`, a ``jax.custom_vjp`` of the
per-sample log-likelihood ``ll[B]``; reductions/zero_infinity stay in
plain JAX in ops/ctc.py. Numerics match the scan implementation (same
log-sum-exp associations forward; the backward is analytically exact).

Reference behavior being accelerated: torch ``nn.CTCLoss`` training
(voice100/models/_asr_v2.py:37).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ctc_ll_pallas"]

_NEG_INF = -1e30

BLOCK_T = 8  # timesteps per grid step (TPU sublane tiling)


def _shift_right(a, k, lanes):
    """a[:, s-k] with -inf fill, via circular roll + lane mask."""
    rolled = pltpu.roll(a, shift=k, axis=1)
    return jnp.where(lanes < k, _NEG_INF, rolled)


def _lse3(a0, a1, a2):
    m = jnp.maximum(jnp.maximum(a0, a1), a2)
    m_safe = jnp.maximum(m, _NEG_INF)
    return m_safe + jnp.log(
        jnp.exp(a0 - m_safe) + jnp.exp(a1 - m_safe) + jnp.exp(a2 - m_safe)
    )


def _fwd_kernel(active_ref, lpz_ref, alpha0_ref, skip_ref, valid_ref,
                alpha_out_ref, a_ref):
    t = pl.program_id(0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, a_ref.shape, 1)
    can_skip = skip_ref[...] != 0
    valid = valid_ref[...] != 0

    @pl.when(t == 0)
    def _():
        a_ref[...] = alpha0_ref[...]

    for k in range(BLOCK_T):
        is_first = (t == 0) & (k == 0)
        alpha = a_ref[...]
        a1 = _shift_right(alpha, 1, lanes)
        a2 = jnp.where(can_skip, _shift_right(alpha, 2, lanes), _NEG_INF)
        new = _lse3(alpha, a1, a2) + lpz_ref[k]
        new = jnp.where(valid, new, _NEG_INF)
        active = active_ref[k][:, None] != 0
        new = jnp.where(active & ~is_first, new, alpha)
        a_ref[...] = new
        alpha_out_ref[k] = new


def _bwd_kernel(active_ref, lpz_ref, alpha_prev_ref, gseed_ref, skip_ref,
                valid_ref, init_ref, grad_out_ref, g_ref):
    """Reverse grid over time: step i handles original t = T-1-i.

    For t >= 1: emits grad_e[t] = g_t (masked) and propagates
    g_{t-1} from g_t through the forward step's adjoint, reading
    alpha_{t-1} from the saved lattice. For t == 0: emits
    grad_e[0] = g_0 * init_mask (alpha_0 = e_0 on the first two lanes).
    """
    i = pl.program_id(0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, g_ref.shape, 1)
    s_pad = g_ref.shape[-1]
    can_skip = skip_ref[...] != 0
    valid = valid_ref[...] != 0

    @pl.when(i == 0)
    def _():
        g_ref[...] = gseed_ref[...]

    for k in range(BLOCK_T):
        # original time index for this inner step
        # (grid walks blocks of time in reverse; rows inside a block
        # are stored forward, so walk them backward)
        g = g_ref[...]
        active = active_ref[BLOCK_T - 1 - k][:, None] != 0
        is_t0 = init_ref[BLOCK_T - 1 - k][0] != 0

        @pl.when(jnp.logical_not(is_t0))
        def _(g=g, active=active, k=k):
            alpha_prev = alpha_prev_ref[BLOCK_T - 1 - k]
            # recompute pre(s) = LSE3(alpha_prev shifts) as forward did
            a1 = _shift_right(alpha_prev, 1, lanes)
            a2 = jnp.where(
                can_skip, _shift_right(alpha_prev, 2, lanes), _NEG_INF
            )
            pre = _lse3(alpha_prev, a1, a2)
            pre_safe = jnp.maximum(pre, _NEG_INF)
            ge = jnp.where(active & valid, g, 0.0)
            grad_out_ref[BLOCK_T - 1 - k] = ge
            # contributions of alpha_{t-1}(s) to new(s + k), k = 0,1,2
            w = ge * jnp.exp(
                jnp.minimum(alpha_prev - pre_safe, 0.0)
            )  # not yet shifted: this is the k=0 term evaluated at s
            # k=0 term: gate = valid(s)
            c0 = w
            # k=1,2 terms: need g_t(s+k) * exp(a_{t-1}(s) - pre(s+k));
            # compute exp(a(s) - pre(s+k)) = exp(a(s) - roll(pre, -k)(s))
            def contrib(shift):
                # left shift by k == circular roll by s_pad - k
                pre_l = pltpu.roll(pre_safe, shift=s_pad - shift, axis=1)
                ge_l = pltpu.roll(ge, shift=s_pad - shift, axis=1)
                gate = lanes < (s_pad - shift)
                if shift == 2:
                    skip_l = pltpu.roll(
                        skip_ref[...], shift=s_pad - 2, axis=1
                    )
                    gate = gate & (skip_l != 0)
                d = jnp.minimum(alpha_prev - pre_l, 0.0)
                return jnp.where(gate, ge_l * jnp.exp(d), 0.0)

            g_new = c0 + contrib(1) + contrib(2)
            g_ref[...] = jnp.where(active, g_new, g)

        @pl.when(is_t0)
        def _(g=g):
            init2 = lanes < 2
            grad_out_ref[BLOCK_T - 1 - k] = jnp.where(
                init2 & valid, g, 0.0
            )


def _prep(log_probs, targets, input_lengths, target_lengths):
    """Shared lattice constants; pads S to a lane multiple of 128."""
    batch, time, _ = log_probs.shape
    label_len = targets.shape[1]
    s_len = 2 * label_len + 1
    s_pad = max(-(-s_len // 128) * 128, 128)
    z = jnp.full((batch, s_len), 0, dtype=jnp.int32)
    z = z.at[:, 1::2].set(targets.astype(jnp.int32))
    s_idx = jnp.arange(s_len)
    z_prev2 = jnp.pad(z, ((0, 0), (2, 0)))[:, :s_len]
    can_skip = (z != 0) & (z != z_prev2)
    valid = s_idx[None, :] < (2 * target_lengths[:, None] + 1)
    pad = ((0, 0), (0, s_pad - s_len))
    # emissions via a one-hot MXU matmul: an XLA gather of [B,T,S]
    # takes ~100 ms at asr_en_base shapes (element-wise gather path);
    # the equivalent batched matmul is ~0.5 GFLOP, microseconds.
    # The lattice always runs f32: log-semiring sums lose too much in
    # bf16, so a mixed-precision caller's log_probs are upcast here
    # (the VJP casts the cotangent back to the primal dtype).
    onehot = jax.nn.one_hot(z, log_probs.shape[2], dtype=jnp.float32)
    lp_z = jnp.einsum(
        "bsv,btv->bts", onehot, log_probs.astype(jnp.float32)
    )  # [B, T, S]
    lp_z = jnp.pad(lp_z, ((0, 0), (0, 0), (0, s_pad - s_len)))
    return (
        z,
        jnp.pad(can_skip, pad).astype(jnp.int32),
        jnp.pad(valid, pad).astype(jnp.int32),
        lp_z,
        s_len,
        s_pad,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ctc_fwd_call(lp_z, alpha0, can_skip, valid, input_lengths,
                  interpret=False):
    batch, time, s_pad = lp_z.shape
    pad_t = -(-time // BLOCK_T) * BLOCK_T
    lpz_t = jnp.swapaxes(lp_z, 0, 1)  # [T, B, S]
    lpz_t = jnp.pad(lpz_t, ((0, pad_t - time), (0, 0), (0, 0)))
    active = (
        jnp.arange(pad_t)[:, None] < input_lengths[None, :]
    ).astype(jnp.int32)  # [Tpad, B]

    alpha_all = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((pad_t, batch, s_pad), jnp.float32),
        grid=(pad_t // BLOCK_T,),
        in_specs=[
            pl.BlockSpec((BLOCK_T, batch), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_T, batch, s_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_T, batch, s_pad), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((batch, s_pad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=20 * pad_t * batch * s_pad,
            bytes_accessed=2 * pad_t * batch * s_pad * 4,
            transcendentals=4 * pad_t * batch * s_pad,
        ),
        interpret=interpret,
    )(active, lpz_t, alpha0, can_skip, valid)
    return alpha_all[:time]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ctc_bwd_call(lp_z, alpha_all, g_seed, can_skip, valid,
                  input_lengths, interpret=False):
    batch, time, s_pad = lp_z.shape
    pad_t = -(-time // BLOCK_T) * BLOCK_T
    lpz_t = jnp.swapaxes(lp_z, 0, 1)
    lpz_t = jnp.pad(lpz_t, ((0, pad_t - time), (0, 0), (0, 0)))
    # alpha_prev[t] = alpha_all[t-1]; row 0 unused (t=0 handled by init)
    alpha_prev = jnp.pad(alpha_all, ((1, pad_t - time), (0, 0), (0, 0)))[
        :pad_t
    ]
    active = (
        jnp.arange(pad_t)[:, None] < input_lengths[None, :]
    ).astype(jnp.int32)
    is_t0 = (jnp.arange(pad_t) == 0).astype(jnp.int32)[:, None]  # [Tpad,1]

    n_blocks = pad_t // BLOCK_T

    grad_e = pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((pad_t, batch, s_pad), jnp.float32),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK_T, batch), lambda i, n=n_blocks: (n - 1 - i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_T, batch, s_pad),
                         lambda i, n=n_blocks: (n - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_T, batch, s_pad),
                         lambda i, n=n_blocks: (n - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_T, 1), lambda i, n=n_blocks: (n - 1 - i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_T, batch, s_pad),
            lambda i, n=n_blocks: (n - 1 - i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((batch, s_pad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=30 * pad_t * batch * s_pad,
            bytes_accessed=4 * pad_t * batch * s_pad * 4,
            transcendentals=6 * pad_t * batch * s_pad,
        ),
        interpret=interpret,
    )(active, lpz_t, alpha_prev, g_seed, can_skip, valid, is_t0)
    return grad_e[:time]


def _ll_from_alpha(alpha_last, target_lengths, s_len):
    end = 2 * target_lengths
    a_last = jnp.take_along_axis(alpha_last, end[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(
        alpha_last, jnp.maximum(end - 1, 0)[:, None], axis=1
    )[:, 0]
    a_prev = jnp.where(target_lengths > 0, a_prev, _NEG_INF)
    m = jnp.maximum(a_last, a_prev)
    ll = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))
    return ll, a_last, a_prev


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def ctc_ll_pallas(log_probs, targets, input_lengths, target_lengths,
                  interpret=False):
    """Per-sample CTC log-likelihood ``ll[B]`` (blank = 0), fused.

    Differentiable in ``log_probs`` only (targets/lengths are integer).
    Semantics match the scan implementation in ops/ctc.py: same masking,
    same log-sum-exp associations.
    """
    ll, _ = _ctc_ll_fwd_impl(
        log_probs, targets, input_lengths, target_lengths, interpret
    )
    return ll


def _ctc_ll_fwd_impl(log_probs, targets, input_lengths, target_lengths,
                     interpret):
    # the lattice recurrence is numerically f32 regardless of the
    # caller's precision (a bf16 log-sum-exp chain over hundreds of
    # frames loses the tail); the cotangent is returned in the caller's
    # dtype via v_probe below
    caller_dtype = log_probs.dtype
    log_probs = log_probs.astype(jnp.float32)
    z, can_skip, valid, lp_z, s_len, s_pad = _prep(
        log_probs, targets, input_lengths, target_lengths
    )
    lanes = jnp.arange(s_pad)
    alpha0 = jnp.where(
        (lanes[None, :] < 2) & (valid != 0), lp_z[:, 0], _NEG_INF
    ).astype(jnp.float32)
    alpha_all = _ctc_fwd_call(
        lp_z, alpha0, can_skip, valid,
        input_lengths.astype(jnp.int32), interpret=interpret,
    )
    alpha_last = alpha_all[-1][:, :s_len]
    ll, a_last, a_prev = _ll_from_alpha(alpha_last, target_lengths, s_len)
    # v_probe's static shape carries the vocab size into the backward,
    # and its dtype the primal log_probs dtype (the cotangent must match
    # it even if a mixed-precision caller passes bf16 log_probs)
    v_probe = jnp.zeros((log_probs.shape[2],), caller_dtype)
    res = (z, can_skip, valid, lp_z, alpha_all, ll, a_last, a_prev,
           input_lengths, target_lengths, v_probe)
    return ll, res


def _ctc_ll_fwd(log_probs, targets, input_lengths, target_lengths,
                interpret):
    return _ctc_ll_fwd_impl(
        log_probs, targets, input_lengths, target_lengths, interpret
    )


def _ctc_ll_bwd(interpret, res, g_ll):
    (z, can_skip, valid, lp_z, alpha_all, ll, a_last, a_prev,
     input_lengths, target_lengths, v_probe) = res
    s_len = z.shape[1]
    s_pad = lp_z.shape[-1]
    vocab = v_probe.shape[0]
    end = 2 * target_lengths
    lanes = jnp.arange(s_pad)
    # seed: dll/dalpha_{T-1}, scaled by the incoming cotangent
    w_last = jnp.exp(a_last - ll)
    w_prev = jnp.where(target_lengths > 0, jnp.exp(a_prev - ll), 0.0)
    g_seed = (
        jnp.where(lanes[None, :] == end[:, None], w_last[:, None], 0.0)
        + jnp.where(
            lanes[None, :] == jnp.maximum(end - 1, 0)[:, None],
            w_prev[:, None], 0.0,
        )
    ) * g_ll[:, None]
    grad_e = _ctc_bwd_call(
        lp_z, alpha_all, g_seed.astype(jnp.float32), can_skip, valid,
        input_lengths.astype(jnp.int32), interpret=interpret,
    )  # [T, B, S_pad]
    grad_e = jnp.swapaxes(grad_e, 0, 1)[..., :s_len]  # [B, T, S]
    # scatter to vocab as one MXU matmul: [B,T,S] x [B,S,V] -> [B,T,V]
    onehot = jax.nn.one_hot(z, vocab, dtype=grad_e.dtype)  # [B, S, V]
    grad_lp = jnp.einsum(
        "bts,bsv->btv", grad_e, onehot
    ).astype(v_probe.dtype)
    import numpy as _np
    from jax import dtypes as _dtypes

    zero_int = lambda a: _np.zeros(a.shape, _dtypes.float0)  # noqa: E731
    return (grad_lp, zero_int(z[:, 1::2]), zero_int(input_lengths),
            zero_int(target_lengths))


ctc_ll_pallas.defvjp(_ctc_ll_fwd, _ctc_ll_bwd)


# --- Viterbi forced alignment ---------------------------------------------
#
# Same lattice, max semiring, plus the backtrace. The reference transition
# rule (voice100/models/align.py:18-66, max_move=3) gates only the
# landing state of a 2-slot move on blanks — different from the loss's
# skip gate. Both time loops (forward and backtrace) are fused kernels;
# the backtrace carries the lattice position as an integer extracted
# from a one-hot lane comparison (per-row dynamic indexing is not a
# vector op; `lanes == pos` is).  Not differentiable (alignment is a
# decoding op); ops/ctc.py keeps the scan for CPU/multi-device.

def _vit_fwd_kernel(active_ref, lpz_ref, alpha0_ref, isblank_ref,
                    valid_ref, alpha_out_ref, move_out_ref, a_ref):
    t = pl.program_id(0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, a_ref.shape, 1)
    is_blank = isblank_ref[...] != 0
    valid = valid_ref[...] != 0

    @pl.when(t == 0)
    def _():
        a_ref[...] = alpha0_ref[...]

    for k in range(BLOCK_T):
        is_first = (t == 0) & (k == 0)
        alpha = a_ref[...]
        c1 = _shift_right(alpha, 1, lanes)
        c2 = jnp.where(is_blank, _NEG_INF, _shift_right(alpha, 2, lanes))
        # first-max-wins tie-break, like jnp.argmax over [move0..move2]
        best = alpha
        bm = jnp.zeros_like(lanes)
        upd1 = c1 > best
        best = jnp.where(upd1, c1, best)
        bm = jnp.where(upd1, 1, bm)
        upd2 = c2 > best
        best = jnp.where(upd2, c2, best)
        bm = jnp.where(upd2, 2, bm)
        new = best + lpz_ref[k]
        new = jnp.where(valid, new, _NEG_INF)
        active = active_ref[k][:, None] != 0
        new = jnp.where(active & ~is_first, new, alpha)
        bm = jnp.where(active & ~is_first, bm, 0)
        a_ref[...] = new
        alpha_out_ref[k] = new
        move_out_ref[k] = bm


def _vit_bt_kernel(move_ref, final_ref, path_out_ref, pos_ref):
    """Reverse grid over time. pos_ref is a [B, 128] broadcast of the
    current lattice position; step t emits the position at time t and
    steps to t-1 via the recorded move."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        pos_ref[...] = final_ref[...]

    s_pad = move_ref.shape[-1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (pos_ref.shape[0], s_pad), 1)
    for k in range(BLOCK_T):
        pos = pos_ref[...]  # [B, 128] (all lanes equal)
        path_out_ref[BLOCK_T - 1 - k] = pos
        onehot = lanes == pos[:, :1]
        move = jnp.sum(
            jnp.where(onehot, move_ref[BLOCK_T - 1 - k], 0),
            axis=1, keepdims=True,
        )  # [B, 1]
        pos_ref[...] = jnp.broadcast_to(pos[:, :1] - move, pos.shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ctc_viterbi_pallas(log_probs, targets, input_lengths, target_lengths,
                       interpret=False):
    """Fused Viterbi alignment: returns (score[B], path[B,T],
    labels[B,T]) matching ops/ctc.py ctc_viterbi_align (max_move=3,
    blank=0)."""
    batch, time, _ = log_probs.shape
    label_len = targets.shape[1]
    s_len = 2 * label_len + 1
    s_pad = max(-(-s_len // 128) * 128, 128)
    z = jnp.zeros((batch, s_len), dtype=jnp.int32)
    z = z.at[:, 1::2].set(targets.astype(jnp.int32))
    s_idx = jnp.arange(s_len)
    valid = s_idx[None, :] < (2 * target_lengths[:, None] + 1)
    pad = ((0, 0), (0, s_pad - s_len))
    is_blank = jnp.pad(z == 0, pad).astype(jnp.int32)
    valid_p = jnp.pad(valid, pad).astype(jnp.int32)
    onehot = jax.nn.one_hot(z, log_probs.shape[2], dtype=log_probs.dtype)
    lp_z = jnp.einsum("bsv,btv->bts", onehot, log_probs)
    lp_z = jnp.pad(lp_z, ((0, 0), (0, 0), (0, s_pad - s_len)))

    lanes = jnp.arange(s_pad)
    alpha0 = jnp.where(
        (lanes[None, :] < 2) & (valid_p != 0), lp_z[:, 0], _NEG_INF
    ).astype(jnp.float32)

    pad_t = -(-time // BLOCK_T) * BLOCK_T
    lpz_t = jnp.pad(
        jnp.swapaxes(lp_z, 0, 1), ((0, pad_t - time), (0, 0), (0, 0))
    )
    active = (
        jnp.arange(pad_t)[:, None] < input_lengths[None, :]
    ).astype(jnp.int32)

    alpha_all, moves = pl.pallas_call(
        _vit_fwd_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((pad_t, batch, s_pad), jnp.float32),
            jax.ShapeDtypeStruct((pad_t, batch, s_pad), jnp.int32),
        ],
        grid=(pad_t // BLOCK_T,),
        in_specs=[
            pl.BlockSpec((BLOCK_T, batch), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_T, batch, s_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_T, batch, s_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_T, batch, s_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((batch, s_pad), jnp.float32)],
        interpret=interpret,
    )(active, lpz_t, alpha0, is_blank, valid_p)

    alpha_last = alpha_all[time - 1][:, :s_len]
    end = 2 * target_lengths
    a_last = jnp.take_along_axis(alpha_last, end[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(
        alpha_last, jnp.maximum(end - 1, 0)[:, None], axis=1
    )[:, 0]
    take_last = a_last > a_prev
    final_pos = jnp.where(take_last, end, jnp.maximum(end - 1, 0))
    score = jnp.where(take_last, a_last, a_prev)

    # moves[t] recorded the advance used to arrive AT time t (0 at t=0)
    final_b = jnp.broadcast_to(
        final_pos.astype(jnp.int32)[:, None], (batch, 128)
    )
    path_t = pl.pallas_call(
        _vit_bt_kernel,
        out_shape=jax.ShapeDtypeStruct((pad_t, batch, 128), jnp.int32),
        grid=(pad_t // BLOCK_T,),
        in_specs=[
            pl.BlockSpec((BLOCK_T, batch, s_pad),
                         lambda i, n=pad_t // BLOCK_T: (n - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_T, batch, 128),
            lambda i, n=pad_t // BLOCK_T: (n - 1 - i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((batch, 128), jnp.int32)],
        interpret=interpret,
    )(moves, final_b)
    path = jnp.swapaxes(path_t[:time, :, 0], 0, 1)  # [B, T]

    frame_mask = jnp.arange(time)[None, :] < input_lengths[:, None]
    path = jnp.where(frame_mask, path, 0)
    labels = jnp.take_along_axis(z, path, axis=1)
    labels = jnp.where(frame_mask, labels, 0)
    return score, path, labels
