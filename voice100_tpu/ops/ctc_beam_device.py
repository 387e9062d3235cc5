"""Batched CTC prefix beam search on device.

The host decoder (ops/ctc_beam.py) is the Hannun et al. 2014 algorithm
as a per-utterance Python loop: fine as a reference, but serving a
batch means fetching the full ``[B, T, V]`` log-prob tensor to the host
(megabytes per batch) and decoding clips one at a time on one core.
This module runs the same dynamic program as a ``lax.scan`` over time,
vmapped over the batch, entirely on device — the host fetches only the
decoded ``[B, L]`` id matrix. The reference project has no beam search
at all (it decodes greedily, /root/reference/tests/test_onnx.py:39-43).

TPU-first design notes:

* The beam state is fixed-shape: ``beam_size`` prefixes stored as
  ``[K, L_max]`` int32 rows plus per-prefix (log P ending in blank,
  log P ending in non-blank) mass, exactly Hannun's two-track bookkeeping.
* Prefix identity for the merge step is a pair of independent 32-bit
  polynomial rolling hashes updated incrementally on append — content
  equality without comparing ``L_max``-long rows. A candidate table of
  ``K*(P+1)`` entries is merged with an equality matrix + masked
  logsumexp (a ~72x72 VPU op), then ``top_k`` keeps the best ``K``.
* Per frame only the ``P = topk`` most probable non-blank symbols are
  considered as extensions (plus blank and each prefix's last symbol,
  which the correctness of the merge requires unconditionally). With
  ``topk >= V - 1`` the candidate set equals the host decoder's
  unpruned set, which the parity tests exploit.
* Padded frames (``t >= length``) are forced to emit blank with log
  probability 0: every prefix's total mass is unchanged, so ranking —
  and therefore the decoded output — is invariant to frame padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ctc_prefix_beam_search_batched"]

_NEG_INF = -1e30  # avoids -inf - -inf = nan inside logaddexp/where math

# rolling-hash constants (two independent channels; a merge collision
# needs both 32-bit hashes to collide on different contents)
_H_MULT1 = np.uint32(1000003)
_H_MULT2 = np.uint32(2654435761)
_H_EMPTY1 = np.uint32(0x811C9DC5)
_H_EMPTY2 = np.uint32(0x01000193)


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    # clamp so exp never sees (-1e30 - -1e30); where() keeps it exact
    d = jnp.minimum(jnp.abs(a - b), 80.0)
    out = m + jnp.log1p(jnp.exp(-d))
    return jnp.where(jnp.maximum(a, b) <= _NEG_INF / 2, _NEG_INF, out)


def _search_one(log_probs, length, beam_size: int, topk: int, blank: int,
                lm_table=None, lm_weight=None, lm_bonus=None):
    """Beam-search a single utterance: ``[T, V]`` -> (ids [T], n).

    With ``lm_table`` (dense trigram ``[V, V, V]`` log probs,
    text/ngram.py) every appended symbol's score additionally receives
    ``lm_weight * log P_lm(s | c2, c1) + lm_bonus`` — standard shallow
    fusion with a length bonus; contexts start at (blank, blank) = BOS.
    """
    t_max, vocab = log_probs.shape
    k = beam_size
    p = min(topk, vocab - 1)

    # frame forced to "certain blank" past the utterance end
    pad_frame = jnp.full((vocab,), _NEG_INF).at[blank].set(0.0)

    prefix0 = jnp.zeros((k, t_max), jnp.int32)
    plen0 = jnp.zeros((k,), jnp.int32)
    last0 = jnp.full((k,), -1, jnp.int32)
    p_b0 = jnp.full((k,), _NEG_INF).at[0].set(0.0)
    p_nb0 = jnp.full((k,), _NEG_INF)
    ctx0 = jnp.full((k, 2), blank, jnp.int32)  # (c2, c1) LM context
    # beam 0 holds the real empty prefix; the other slots get distinct
    # sentinel hashes so they can never merge with live prefixes
    ks = jnp.arange(k, dtype=jnp.uint32)
    h10 = jnp.where(ks == 0, _H_EMPTY1, ks * np.uint32(0x9E3779B9))
    h20 = jnp.where(ks == 0, _H_EMPTY2, ks * np.uint32(0x85EBCA6B) + 1)

    def step(state, frame_t):
        prefix, plen, last, p_b, p_nb, h1, h2, ctx = state
        frame, t = frame_t
        frame = jnp.where(t < length, frame, pad_frame)

        total = _logaddexp(p_b, p_nb)
        lp_blank = frame[blank]
        # per-beam log prob of repeating the last symbol (empty: -inf)
        lp_last = jnp.where(
            last >= 0, frame[jnp.maximum(last, 0)], _NEG_INF
        )

        # top-P non-blank extension symbols, shared across beams
        nb_frame = frame.at[blank].set(_NEG_INF)
        ext_lp, ext_sym = jax.lax.top_k(nb_frame, p)

        # --- candidate class A: the prefix itself (blank, or repeat
        # of its last symbol without a separating blank) — [K]
        a_pb = total + lp_blank
        a_pnb = p_nb + lp_last
        # --- candidate class B: prefix + sym for each top-P sym — [K, P]
        sym_b = jnp.broadcast_to(ext_sym[None, :], (k, p))
        is_rep = sym_b == last[:, None]
        b_pnb = (
            jnp.where(is_rep, p_b[:, None], total[:, None])
            + ext_lp[None, :]
        )
        if lm_table is not None:
            # shallow fusion: every appended symbol pays/earns the LM
            # and a constant length bonus (class A never extends the
            # prefix, so it carries no LM term)
            lm_row = lm_table[ctx[:, 0], ctx[:, 1]]  # [K, V]
            b_pnb = b_pnb + (
                lm_weight * lm_row[jnp.arange(k)[:, None], sym_b]
                + lm_bonus
            )
        b_pb = jnp.full((k, p), _NEG_INF)
        h1_b = h1[:, None] * _H_MULT1 + sym_b.astype(jnp.uint32) + 2
        h2_b = h2[:, None] * _H_MULT2 + sym_b.astype(jnp.uint32) + 2

        m = k + k * p
        parent = jnp.concatenate(
            [jnp.arange(k), jnp.repeat(jnp.arange(k), p)]
        )
        appended = jnp.concatenate(
            [jnp.zeros((k,), bool), jnp.ones((k * p,), bool)]
        )
        sym_c = jnp.concatenate(
            [jnp.zeros((k,), jnp.int32), sym_b.reshape(-1)]
        )
        pb_c = jnp.concatenate([a_pb, b_pb.reshape(-1)])
        pnb_c = jnp.concatenate([a_pnb, b_pnb.reshape(-1)])
        h1_c = jnp.concatenate([h1, h1_b.reshape(-1)])
        h2_c = jnp.concatenate([h2, h2_b.reshape(-1)])

        # merge candidates with identical content (same rolling hashes):
        # each row sums the mass of its duplicates, then only the first
        # occurrence survives
        eq = (h1_c[:, None] == h1_c[None, :]) & (
            h2_c[:, None] == h2_c[None, :]
        )
        def masked_lse(v):
            vm = jnp.where(eq, v[None, :], _NEG_INF)
            mx = jnp.max(vm, axis=1)
            s = jnp.sum(
                jnp.where(eq, jnp.exp(vm - mx[:, None]), 0.0), axis=1
            )
            return jnp.where(mx <= _NEG_INF / 2, _NEG_INF, mx + jnp.log(s))

        pb_m = masked_lse(pb_c)
        pnb_m = masked_lse(pnb_c)
        first = jnp.cumsum(eq, axis=1)[jnp.arange(m), jnp.arange(m)] == 1
        total_m = jnp.where(first, _logaddexp(pb_m, pnb_m), _NEG_INF)

        _, keep = jax.lax.top_k(total_m, k)
        par = parent[keep]
        app = appended[keep]
        sym_k = sym_c[keep]

        new_prefix = prefix[par]
        write = (
            jnp.arange(t_max)[None, :] == plen[par][:, None]
        ) & app[:, None]
        new_prefix = jnp.where(write, sym_k[:, None], new_prefix)
        new_plen = plen[par] + app.astype(jnp.int32)
        new_last = jnp.where(app, sym_k, last[par])
        new_ctx = jnp.where(
            app[:, None],
            jnp.stack([ctx[par, 1], sym_k], axis=1),
            ctx[par],
        )
        return (
            new_prefix, new_plen, new_last,
            pb_m[keep], pnb_m[keep], h1_c[keep], h2_c[keep], new_ctx,
        ), None

    state0 = (prefix0, plen0, last0, p_b0, p_nb0, h10, h20, ctx0)
    (prefix, plen, _, p_b, p_nb, _, _, _), _ = jax.lax.scan(
        step, state0, (log_probs, jnp.arange(t_max))
    )
    best = jnp.argmax(_logaddexp(p_b, p_nb))
    return prefix[best], plen[best]


@functools.partial(
    jax.jit, static_argnames=("beam_size", "topk", "blank")
)
def _search_batched_plain(log_probs, lengths, beam_size, topk, blank):
    return jax.vmap(
        lambda lp, n: _search_one(lp, n, beam_size, topk, blank)
    )(log_probs, lengths)


@functools.partial(
    jax.jit, static_argnames=("beam_size", "topk", "blank")
)
def _search_batched_fused(log_probs, lengths, lm_table, lm_weight,
                          lm_bonus, beam_size, topk, blank):
    return jax.vmap(
        lambda lp, n: _search_one(
            lp, n, beam_size, topk, blank,
            lm_table=lm_table, lm_weight=lm_weight, lm_bonus=lm_bonus,
        )
    )(log_probs, lengths)


def ctc_prefix_beam_search_batched(
    log_probs,
    lengths,
    beam_size: int = 8,
    topk: int = 8,
    blank: int = 0,
    lm_table=None,
    lm_weight: float = 0.5,
    lm_bonus: float = 0.0,
):
    """Decode ``[B, T, V]`` log-softmax outputs on device.

    Args:
        log_probs: per-frame log probabilities, padded on time.
        lengths: ``[B]`` valid frame counts.
        beam_size: prefixes kept per frame.
        topk: non-blank symbols considered as extensions per frame
            (``topk >= V - 1`` considers every symbol, matching the
            host decoder's unpruned candidate set).
        lm_table: optional dense trigram ``[V, V, V]`` log-prob table
            (text/ngram.py) for on-device shallow fusion.
        lm_weight: fusion weight on the LM log prob per appended symbol.
        lm_bonus: constant per-symbol length bonus (counters the LM's
            short-output bias).

    Returns:
        ``(ids [B, T], n [B])`` — the best label sequence per row
        (no blanks or CTC repeats; only the first ``n`` ids are valid).
    """
    if lm_table is None:
        return _search_batched_plain(
            log_probs, lengths, beam_size, topk, blank
        )
    table = jnp.asarray(lm_table)
    # the table's blank column is -inf by construction; extensions
    # never gather it, but clamp for safety under f32 arithmetic
    table = jnp.maximum(table, _NEG_INF)
    return _search_batched_fused(
        log_probs, lengths, table,
        jnp.float32(lm_weight), jnp.float32(lm_bonus),
        beam_size, topk, blank,
    )
