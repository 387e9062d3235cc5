"""Batch collation with bucketed padding (static shapes for XLA).

Same batch layouts as the reference collate functions
(voice100/data_modules.py:446-496,673-682):

* mel:        ((audio [B,T,D], audio_len), (text [B,L], text_len))
* world:      ((f0 [B,T], f0_len, logspc [B,T,S], codeap [B,T,C]),
               (aligntext [B,L], aligntext_len))
* world+tgt:  adds (targettext, targettext_len)
* text-align: ((text, text_len), (align [B,A], align_len))

Padding values match the reference: audio pad = log(1e-6), token pad =
blank 0, WORLD streams pad = 0.

TPU-first addition: padded lengths round up to bucket multiples so a
training run compiles a handful of programs instead of one per batch
shape.
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import numpy as np

from ..ops.augment import BLANK_AUDIO

__all__ = [
    "pad_stack",
    "bucket_extent",
    "collate_audio_text",
    "collate_world_text",
    "collate_world_text_target",
    "collate_text_align",
    "get_collate_fn",
    "TIME_BUCKET",
    "TEXT_BUCKET",
]

BLANK_IDX = 0
TIME_BUCKET = 64   # frames (mel 10ms hop: 0.64 s granularity)
TEXT_BUCKET = 16   # tokens


def _env_bucket(name: str, default: int) -> int:
    """Bucket granularity trades padding waste against the number of
    distinct batch shapes XLA compiles (one train step per shape). The
    env overrides let small-corpus runs (tests, smoke fits) collapse
    every batch into a single shape so a whole fit compiles exactly one
    train step. Read at call time so setting the env after import works.
    """
    raw = os.environ.get(name)
    if raw is None:
        return default
    try:
        value = int(raw)
    except ValueError:
        raise ValueError(f"{name} must be a positive integer, got {raw!r}")
    if value <= 0:
        raise ValueError(f"{name} must be a positive integer, got {raw!r}")
    return value


def _time_bucket(override: int = None) -> int:
    if override is not None:
        return override
    return _env_bucket("VOICE100_TPU_TIME_BUCKET", TIME_BUCKET)


def _text_bucket(override: int = None) -> int:
    if override is not None:
        return override
    return _env_bucket("VOICE100_TPU_TEXT_BUCKET", TEXT_BUCKET)


def _bucket(n: int, bucket: int) -> int:
    return max(bucket, -(-n // bucket) * bucket)


def pad_stack(
    items: Sequence[np.ndarray],
    pad_value: float,
    bucket: int,
    dtype=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack variable-length arrays, padded to a bucketed max length."""
    lengths = np.asarray([len(x) for x in items], dtype=np.int32)
    max_len = _bucket(int(lengths.max()), bucket)
    first = np.asarray(items[0])
    shape = (len(items), max_len) + first.shape[1:]
    # np.empty + per-row tail fill instead of np.full: writes each
    # byte of the batch buffer once (data copy OR pad fill), halving
    # collate memory traffic on big audio batches — this runs on the
    # GIL-held loader thread, so it is on the training critical path
    out = np.empty(shape, dtype=dtype or first.dtype)
    for i, x in enumerate(items):
        n = len(x)
        out[i, :n] = x
        out[i, n:] = pad_value
    return out, lengths


def bucket_extent(kind: str, n: int) -> int:
    """The padded length a batch whose longest row is ``n`` collates to,
    per bucket kind — the device feature cache uses this to predict each
    regrouped batch's bucket from tracked true lengths (so scan-dispatch
    gathers slice to the SAME extents host collation would produce)."""
    if kind == "time":
        return _bucket(n, _time_bucket())
    if kind == "text":
        return _bucket(n, _text_bucket())
    if kind == "align":
        return _bucket(n, 2 * _text_bucket())
    raise ValueError(f"unknown bucket kind {kind!r}")


def collate_audio_text(batch, time_bucket: int = None,
                       text_bucket: int = None):
    """Mel-mode batches (reference generate_audio_text_batch,
    data_modules.py:446-455)."""
    time_bucket = _time_bucket(time_bucket)
    text_bucket = _text_bucket(text_bucket)
    audio_items = [b[0] for b in batch]
    text_items = [b[1] for b in batch]
    audio, audio_len = pad_stack(audio_items, BLANK_AUDIO, time_bucket)
    text, text_len = pad_stack(text_items, BLANK_IDX, text_bucket)
    return (audio, audio_len), (text, text_len)


# per-leaf pad values, matching the batch structure: consumed by the
# HBM-resident feature cache (data/device_cache.py), whose store must
# pad rows with the SAME value the collate uses so device-gathered
# batches are byte-identical to host-collated ones at any bucket.
# Length leaves ([B] arrays) never pad; 0 is a placeholder.
collate_audio_text.pad_values = ((BLANK_AUDIO, 0), (BLANK_IDX, 0))
# variable-length leaf map (flattened leaf order): feature-leaf index ->
# (index of the [B] length leaf holding its rows' TRUE lengths, bucket
# kind for bucket_extent). Length leaves and fixed-shape leaves are
# absent. Consumed by data/device_cache.py to group an epoch's batches
# by collate bucket for per-bucket scan dispatch.
collate_audio_text.var_specs = {0: (1, "time"), 2: (3, "text")}


def collate_world_text(batch, time_bucket: int = None,
                       text_bucket: int = None):
    """WORLD-mode batches (reference generate_audio_text_align_batch,
    data_modules.py:458-474)."""
    time_bucket = _time_bucket(time_bucket)
    text_bucket = _text_bucket(text_bucket)
    f0s = [b[0][0] for b in batch]
    spcs = [b[0][1] for b in batch]
    codeaps = [b[0][2] for b in batch]
    texts = [b[1] for b in batch]
    f0, f0_len = pad_stack(f0s, 0.0, time_bucket)
    spc, _ = pad_stack(spcs, 0.0, time_bucket)
    codeap, _ = pad_stack(codeaps, 0.0, time_bucket)
    text, text_len = pad_stack(texts, BLANK_IDX, text_bucket)
    return (f0, f0_len, spc, codeap), (text, text_len)


collate_world_text.pad_values = (
    (0.0, 0, 0.0, 0.0), (BLANK_IDX, 0))
collate_world_text.var_specs = {
    0: (1, "time"), 2: (1, "time"), 3: (1, "time"), 4: (5, "text")}


def collate_world_text_target(batch, time_bucket: int = None,
                              text_bucket: int = None):
    """Multi-task batches (reference
    generate_audio_text_align_target_batch, data_modules.py:477-496)."""
    time_bucket = _time_bucket(time_bucket)
    text_bucket = _text_bucket(text_bucket)
    (features, texts), targets = (
        ([b[0] for b in batch], [b[1] for b in batch]),
        [b[2] for b in batch],
    )
    f0, f0_len = pad_stack([f[0] for f in features], 0.0, time_bucket)
    spc, _ = pad_stack([f[1] for f in features], 0.0, time_bucket)
    codeap, _ = pad_stack([f[2] for f in features], 0.0, time_bucket)
    text, text_len = pad_stack(texts, BLANK_IDX, text_bucket)
    target, target_len = pad_stack(targets, BLANK_IDX, text_bucket)
    return (f0, f0_len, spc, codeap), (text, text_len), (target, target_len)


collate_world_text_target.pad_values = (
    (0.0, 0, 0.0, 0.0), (BLANK_IDX, 0), (BLANK_IDX, 0))
collate_world_text_target.var_specs = {
    0: (1, "time"), 2: (1, "time"), 3: (1, "time"), 4: (5, "text"),
    6: (7, "text")}


def collate_text_align(batch, text_bucket: int = None):
    """Duration-model batches (reference generate_text_align_batch,
    data_modules.py:673-682)."""
    text_bucket = _text_bucket(text_bucket)
    texts = [b[0] for b in batch]
    aligns = [b[1] for b in batch]
    text, text_len = pad_stack(texts, BLANK_IDX, text_bucket)
    align, align_len = pad_stack(aligns, 0, 2 * text_bucket)
    return (text, text_len), (align, align_len)


collate_text_align.pad_values = ((BLANK_IDX, 0), (0, 0))
collate_text_align.var_specs = {0: (1, "text"), 2: (3, "align")}


def get_collate_fn(vocoder: str, use_target: bool):
    """Factory (reference voice100/data_modules.py:433-443)."""
    if vocoder == "mel":
        return collate_audio_text
    if vocoder in ("world", "world_mcep"):
        return collate_world_text_target if use_target else collate_world_text
    raise ValueError(f"Unknown vocoder {vocoder!r}")
