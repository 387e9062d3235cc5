"""CTC loss and CTC Viterbi forced alignment as XLA scans.

The reference uses torch ``nn.CTCLoss(zero_infinity=True)`` for training
(voice100/models/_asr_v2.py:37) and a per-utterance NumPy Viterbi loop
for forced alignment (voice100/models/align.py:18-66, called one clip at
a time from _asr_v2.py:106-115). Both are reimplemented here as fully
batched on-device programs:

* ``ctc_loss``: log-semiring forward algorithm via ``lax.scan`` over
  time with a ``[B, 2L+1]`` alpha lattice; differentiable, static
  shapes, masked for per-sample input/target lengths. Matches torch
  semantics (blank=0, reduction='mean' divides by target length,
  zero_infinity clamps).
* ``ctc_viterbi_align``: max-semiring forward with backpointers and a
  scan backtrace; reproduces the reference's ``max_move=3`` transition
  rule (moves of 0/1/2 label slots per frame, a 2-slot move may not land
  on a blank).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["ctc_loss", "ctc_viterbi_align", "ViterbiResult"]

_NEG_INF = -1e30


# Last mode picked at trace time ('pallas'|'shard'|'scan'); for path
# reporting by the driver dryrun and the trainer logs.
_LAST_KERNEL_MODE = None


def last_kernel_mode():
    return _LAST_KERNEL_MODE


def _ctc_mode(blank: int, batch: int) -> str:
    """Pick the CTC implementation at trace time.

    'pallas': the fused lattice kernels (ctc_pallas.py) — the lax.scan
    pays ~130 ms/step in per-step overhead at asr_en_base shapes, ~77%
    of the whole training step. Default on single-device TPU.
    'shard': the same kernels per-shard via jax.shard_map over the
    batch axes of the mesh declared by parallel.mesh.kernel_sharding
    (pallas_call does not auto-partition under GSPMD; tensor-parallel
    meshes split the batch over the whole fleet).
    'scan': the lax.scan lattice (CPU/GPU, blank != 0, batches not
    divisible by the fleet).

    Override with VOICE100_TPU_CTC_KERNEL=pallas|scan. The kernels are
    blank=0 only (the framework's tokenizers reserve id 0,
    text/tokenizers.py).
    """
    import logging
    import os

    if blank != 0:
        return "scan"
    forced = os.environ.get("VOICE100_TPU_CTC_KERNEL")
    if forced == "pallas":
        return "pallas"
    if forced == "scan":
        return "scan"
    from ..parallel.mesh import active_kernel_mesh, kernel_batch_divisor

    mesh = active_kernel_mesh()
    if mesh is not None:
        div = kernel_batch_divisor(mesh)
        if batch % div == 0:
            return "shard"
        logging.getLogger(__name__).warning(
            "kernel_sharding mesh active but batch %d is not divisible "
            "by the mesh fleet (%d); falling back to the scan CTC",
            batch, div,
        )
        return "scan"
    if jax.default_backend() in ("cpu", "gpu"):
        return "scan"
    if len(jax.devices()) == 1:
        return "pallas"
    logging.getLogger(__name__).warning(
        "multi-device run without parallel.mesh.kernel_sharding: the "
        "Pallas CTC kernels fall back to lax.scan (slower)."
    )
    return "scan"


def _kernel_interpret() -> bool:
    from ..parallel.mesh import pallas_interpret

    return pallas_interpret()


def _extend_with_blanks(targets: jnp.ndarray, blank: int) -> jnp.ndarray:
    """``[B, L] -> [B, 2L+1]`` blank-interleaved labels."""
    batch, label_len = targets.shape
    ext = jnp.full((batch, 2 * label_len + 1), blank, dtype=targets.dtype)
    return ext.at[:, 1::2].set(targets)


def ctc_loss(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank: int = 0,
    reduction: str = "mean",
    zero_infinity: bool = True,
) -> jnp.ndarray:
    """Batched CTC negative log-likelihood.

    Args:
        log_probs: ``[B, T, V]`` log-softmax outputs.
        targets: ``[B, L]`` padded label ids.
        input_lengths: ``[B]`` frames per sample.
        target_lengths: ``[B]`` labels per sample.
        reduction: 'mean' (torch default: per-sample loss divided by its
            target length, then batch mean), 'sum', or 'none'.
    """
    global _LAST_KERNEL_MODE
    mode = _ctc_mode(blank, batch=log_probs.shape[0])
    _LAST_KERNEL_MODE = mode
    if mode != "scan":
        from .ctc_pallas import ctc_ll_pallas

        if mode == "shard":
            from ..parallel.mesh import active_kernel_mesh, data_shard_map

            interpret = _kernel_interpret()

            def _per_shard(lp, tg, il, tl):
                return ctc_ll_pallas(lp, tg, il, tl, interpret)

            ll = data_shard_map(
                _per_shard, active_kernel_mesh(), n_batch_args=4,
            )(log_probs, targets, input_lengths, target_lengths)
        else:
            ll = ctc_ll_pallas(
                log_probs, targets, input_lengths, target_lengths,
                _kernel_interpret(),
            )
        loss = -ll
        if zero_infinity:
            loss = jnp.where(loss >= -_NEG_INF / 2, 0.0, loss)
        if reduction == "none":
            return loss
        if reduction == "sum":
            return jnp.sum(loss)
        denom = jnp.maximum(target_lengths, 1).astype(loss.dtype)
        return jnp.mean(loss / denom)

    batch, time, _ = log_probs.shape
    z = _extend_with_blanks(targets, blank)  # [B, S]
    s_len = z.shape[1]
    s_idx = jnp.arange(s_len)

    # A diagonal skip (s-2 -> s) is allowed when z_s is a real label that
    # differs from z_{s-2}.
    z_prev2 = jnp.pad(z, ((0, 0), (2, 0)), constant_values=blank)[:, :s_len]
    can_skip = (z != blank) & (z != z_prev2)  # [B, S]
    # States beyond this sample's lattice (s >= 2L+1) are invalid.
    valid_state = s_idx[None, :] < (2 * target_lengths[:, None] + 1)

    alpha0 = jnp.where(
        s_idx[None, :] < 2,
        jnp.take_along_axis(log_probs[:, 0], z, axis=1),
        _NEG_INF,
    )
    alpha0 = jnp.where(valid_state, alpha0, _NEG_INF)

    lp_t = jnp.swapaxes(log_probs, 0, 1)  # [T, B, V]

    def step(alpha, inp):
        lp, t = inp
        a1 = jnp.pad(
            alpha, ((0, 0), (1, 0)), constant_values=_NEG_INF
        )[:, :s_len]
        a2 = jnp.pad(
            alpha, ((0, 0), (2, 0)), constant_values=_NEG_INF
        )[:, :s_len]
        a2 = jnp.where(can_skip, a2, _NEG_INF)
        stacked = jnp.stack([alpha, a1, a2], axis=0)
        m = jnp.max(stacked, axis=0)
        new = m + jnp.log(
            jnp.sum(jnp.exp(stacked - m[None]), axis=0)
        )
        new = new + jnp.take_along_axis(lp, z, axis=1)
        new = jnp.where(valid_state, new, _NEG_INF)
        active = (t < input_lengths)[:, None]
        alpha = jnp.where(active, new, alpha)
        return alpha, None

    alpha, _ = jax.lax.scan(
        step, alpha0, (lp_t[1:], jnp.arange(1, time))
    )

    end = 2 * target_lengths  # index of final blank
    a_last = jnp.take_along_axis(alpha, end[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(
        alpha, jnp.maximum(end - 1, 0)[:, None], axis=1
    )[:, 0]
    a_prev = jnp.where(target_lengths > 0, a_prev, _NEG_INF)
    m = jnp.maximum(a_last, a_prev)
    ll = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))
    loss = -ll
    if zero_infinity:
        loss = jnp.where(loss >= -_NEG_INF / 2, 0.0, loss)
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    denom = jnp.maximum(target_lengths, 1).astype(loss.dtype)
    return jnp.mean(loss / denom)


class ViterbiResult(NamedTuple):
    score: jnp.ndarray   # [B] best path log-prob
    path: jnp.ndarray    # [B, T] position in the blank-interleaved lattice
    labels: jnp.ndarray  # [B, T] label id per frame (the aligned text)


def ctc_viterbi_align(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank: int = 0,
    max_move: int = 3,
) -> ViterbiResult:
    """Batched CTC forced alignment (best path through the label lattice).

    Transition rule matches the reference ``ctc_best_path``
    (voice100/models/align.py:18-66): per frame the lattice position may
    advance by 0..max_move-1 slots, and an even advance > 0 may not land
    on a blank. Frames at/after ``input_lengths`` hold position; their
    outputs are zeroed like the reference's padded batching
    (_asr_v2.py:117-118).
    """
    global _LAST_KERNEL_MODE
    mode = _ctc_mode(blank, batch=log_probs.shape[0]) if max_move == 3 \
        else "scan"
    _LAST_KERNEL_MODE = mode
    if mode != "scan":
        from .ctc_pallas import ctc_viterbi_pallas

        if mode == "shard":
            from ..parallel.mesh import active_kernel_mesh, data_shard_map

            interpret = _kernel_interpret()

            def _per_shard(lp, tg, il, tl):
                return ctc_viterbi_pallas(lp, tg, il, tl, interpret)

            score, path, labels = data_shard_map(
                _per_shard, active_kernel_mesh(), n_batch_args=4,
            )(log_probs, targets, input_lengths, target_lengths)
        else:
            score, path, labels = ctc_viterbi_pallas(
                log_probs, targets, input_lengths, target_lengths,
                _kernel_interpret(),
            )
        return ViterbiResult(score=score, path=path, labels=labels)

    batch, time, _ = log_probs.shape
    z = _extend_with_blanks(targets, blank)
    s_len = z.shape[1]
    s_idx = jnp.arange(s_len)
    valid_state = s_idx[None, :] < (2 * target_lengths[:, None] + 1)
    is_blank = z == blank

    lp_z_0 = jnp.take_along_axis(log_probs[:, 0], z, axis=1)
    alpha0 = jnp.where(s_idx[None, :] < 2, lp_z_0, _NEG_INF)
    alpha0 = jnp.where(valid_state, alpha0, _NEG_INF)

    lp_t = jnp.swapaxes(log_probs, 0, 1)  # [T, B, V]

    def step(alpha, inp):
        lp, t = inp
        cands = []
        for move in range(max_move):
            shifted = jnp.pad(
                alpha, ((0, 0), (move, 0)), constant_values=_NEG_INF
            )[:, :s_len]
            if move > 0 and move % 2 == 0:
                shifted = jnp.where(is_blank, _NEG_INF, shifted)
            cands.append(shifted)
        stacked = jnp.stack(cands, axis=0)  # [max_move, B, S]
        best_move = jnp.argmax(stacked, axis=0)  # [B, S]
        best = jnp.max(stacked, axis=0)
        new = best + jnp.take_along_axis(lp, z, axis=1)
        new = jnp.where(valid_state, new, _NEG_INF)
        active = (t < input_lengths)[:, None]
        alpha = jnp.where(active, new, alpha)
        best_move = jnp.where(active, best_move, 0)
        return alpha, best_move.astype(jnp.int8)

    alpha, moves = jax.lax.scan(
        step, alpha0, (lp_t[1:], jnp.arange(1, time))
    )
    # moves[t-1] holds the advance used to arrive at time t.

    end = 2 * target_lengths  # final blank position
    a_last = jnp.take_along_axis(alpha, end[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(
        alpha, jnp.maximum(end - 1, 0)[:, None], axis=1
    )[:, 0]
    # Reference tie-break: final blank only on strictly greater score
    # (align.py:58).
    take_last = a_last > a_prev
    final_pos = jnp.where(take_last, end, jnp.maximum(end - 1, 0))
    score = jnp.where(take_last, a_last, a_prev)

    def backtrace(pos, mv):
        # pos is the lattice position at time t+1; mv = moves into t+1.
        move = jnp.take_along_axis(mv, pos[:, None], axis=1)[:, 0]
        prev = pos - move.astype(pos.dtype)
        return prev, pos

    first_pos, path_rest = jax.lax.scan(
        backtrace, final_pos.astype(jnp.int32), moves, reverse=True
    )
    # path_rest[i] is the position at time i+1; the final carry is time 0.
    path = jnp.concatenate([first_pos[None], path_rest], axis=0)
    path = jnp.swapaxes(path, 0, 1)  # [B, T]

    frame_mask = (
        jnp.arange(time)[None, :] < input_lengths[:, None]
    )
    path = jnp.where(frame_mask, path, 0)
    labels = jnp.take_along_axis(z, path, axis=1)
    labels = jnp.where(frame_mask, labels, 0)
    return ViterbiResult(score=score, path=path, labels=labels)
