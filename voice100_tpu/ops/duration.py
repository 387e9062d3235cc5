"""Duration expansion: text + per-token durations -> aligned text.

The reference expands one utterance at a time with a Python loop
(voice100/models/_align_v2.py:48-75, and the v1 variant
voice100/models/tts.py:89-110). Here the sequential cursor becomes a tiny
``lax.scan`` over tokens producing (start, end) spans, and the expansion
itself is a vectorized searchsorted over output positions — so a whole
padded batch expands on-device in one call (``vmap`` over utterances).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["expand_alignment", "expand_alignment_batch", "aligntext_length"]


def _spans_v2(align: jnp.ndarray, head: int):
    """Reference cursor recurrence (_align_v2.py:59-72): returns
    per-token [start, end) spans with the monotone non-overlap rule."""

    def step(carry, a):
        t, u, first = carry
        t = t + jnp.where(first, 0.0, a[0])
        s = jnp.maximum(jnp.floor(t).astype(jnp.int32), u)
        u2 = s + 1
        t = t + a[1]
        e = jnp.maximum(jnp.floor(t).astype(jnp.int32), u2)
        return (t, e, jnp.zeros_like(first)), (s, e)

    init = (jnp.asarray(float(head)), jnp.asarray(0, jnp.int32),
            jnp.asarray(True))
    _, (starts, ends) = jax.lax.scan(step, init, align)
    return starts, ends


def aligntext_length(align: jnp.ndarray, head: int = 5, tail: int = 5) -> jnp.ndarray:
    """Output length: head + sum(align) - align[0, 0] + tail
    (_align_v2.py:57)."""
    total = jnp.sum(align) - align[0, 0]
    return (head + tail + total.astype(jnp.int32)).astype(jnp.int32)


def expand_alignment(
    text: jnp.ndarray,
    align: jnp.ndarray,
    text_len: jnp.ndarray,
    out_len: int,
    head: int = 5,
    tail: int = 5,
    blank: int = 0,
) -> jnp.ndarray:
    """Expand one utterance to a fixed-capacity aligned text.

    Args:
        text: ``[L]`` token ids (padded).
        align: ``[L, 2]`` (frames-before, frames-during) durations.
        text_len: scalar valid token count.
        out_len: static output capacity (>= the true aligned length).

    Returns:
        ``[out_len]`` aligned token ids, blank between/after spans.
    """
    del tail  # capacity is static; the true tail is implicit padding
    length = text.shape[0]
    starts, ends = _spans_v2(align, head)
    token_valid = jnp.arange(length) < text_len
    # Invalidate padded tokens: give them empty spans beyond the output.
    big = jnp.int32(out_len + 1)
    starts = jnp.where(token_valid, starts, big)
    ends = jnp.where(token_valid, ends, big)

    pos = jnp.arange(out_len, dtype=jnp.int32)
    # Spans are ordered and non-overlapping; find the covering token.
    idx = jnp.searchsorted(starts, pos, side="right") - 1
    idx = jnp.clip(idx, 0, length - 1)
    covered = (pos >= jnp.take(starts, idx)) & (pos < jnp.take(ends, idx))
    return jnp.where(covered, jnp.take(text, idx), blank)


def expand_alignment_batch(
    text: jnp.ndarray,
    align: jnp.ndarray,
    text_len: jnp.ndarray,
    out_len: int,
    head: int = 5,
    tail: int = 5,
    blank: int = 0,
):
    """Batched expansion: ``[B, L]``, ``[B, L, 2]`` -> ``[B, out_len]``
    plus the per-sample aligned lengths."""
    expanded = jax.vmap(
        lambda t, a, n: expand_alignment(t, a, n, out_len, head, tail, blank)
    )(text, align, text_len)
    token_mask = (
        jnp.arange(text.shape[1])[None, :] < text_len[:, None]
    ).astype(align.dtype)
    totals = jnp.sum(align * token_mask[:, :, None], axis=(1, 2)) - align[:, 0, 0]
    lengths = jnp.minimum(
        head + tail + totals.astype(jnp.int32), out_len
    ).astype(jnp.int32)
    return expanded, lengths
