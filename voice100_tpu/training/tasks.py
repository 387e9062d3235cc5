"""Task adapters: map (model, batch layout) -> init/loss/metrics.

The reference couples this logic into LightningModule methods
(training_step/_calc_batch_loss per model). Here each model family gets
a small adapter so one generic jitted train step serves every model:
``extract_args`` turns a collated batch into ``compute_loss`` arguments,
``postprocess`` turns the model's loss values into (total, metrics).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from ..models import (
    AudioToAlignText,
    TextToAlignText,
    AlignTextToAudio,
    AudioToTextCTC,
    AudioAlignCTC,
    TextToAlignTextModel,
    AlignTextToAudioModel,
    AlignTextToAudioMultiTaskModel,
)

__all__ = ["Task", "make_task"]

Metrics = Dict[str, Any]


def _pair_args(batch):
    (a, a_len), (b, b_len) = batch
    return (a, a_len, b, b_len)


def _world_args(batch):
    (f0, f0_len, logspc, codeap), (text, text_len) = batch
    return (f0, f0_len, logspc, codeap, text, text_len)


def _world_target_args(batch):
    (f0, f0_len, logspc, codeap), (t, t_len), (g, g_len) = batch
    return (f0, f0_len, logspc, codeap, t, t_len, g, g_len)


def _pair_upload_cast(batch, cast):
    """bf16-upload policy for ``_pair_args`` layouts: only the first
    pair's array is a model INPUT (audio features, or int text ids the
    cast ignores); the second pair is supervision and must upload
    exactly as collated."""
    (a, a_len), (b, b_len) = batch
    return ((cast(a), a_len), (b, b_len))


def _no_upload_cast(batch, cast):
    """World-feature layouts carry float32 supervision targets
    (f0/logspc/codeap) and integer text inputs — nothing is safe to
    quantize on upload."""
    return batch


def upcast_float_inputs(batch):
    """Upcast half-precision batch leaves to float32 on device.

    Batches may arrive quantized two ways: bf16-quantized on the
    prefetch thread (TrainerConfig.upload_dtype) or float16 straight
    from the feature cache (AudioTextDataModule cache_dtype) — both
    halve the host->device bytes. Losses and augmentation then run in
    f32 exactly as with f32 uploads."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if a.dtype in (jnp.bfloat16, jnp.float16) else a,
        batch,
    )


def _scalar_post(model, values):
    return values, {"loss": values}


def _tts_v2_post(model, values):
    loss = AlignTextToAudio.total_loss(values, model.logspc_weight)
    return loss, {
        "loss": loss,
        "hasf0_loss": values.hasf0,
        "f0_loss": values.f0,
        "logspc_loss": values.logspc,
        "hascodeap_loss": values.hascodeap,
        "codeap_loss": values.codeap,
    }


def _tts_v1_post(model, values):
    hasf0_loss, f0_loss, logspc_loss, codeap_loss = values
    loss = hasf0_loss + f0_loss + logspc_loss + codeap_loss
    return loss, {
        "loss": loss,
        "hasf0_loss": hasf0_loss,
        "f0_loss": f0_loss,
        "logspc_loss": logspc_loss,
        "codeap_loss": codeap_loss,
    }


def _tts_mt_post(model, values):
    loss = sum(values)
    names = ("hasf0_loss", "f0_loss", "logspc_loss", "codeap_loss",
             "phone_loss")
    metrics = {"loss": loss}
    metrics.update(dict(zip(names, values)))
    return loss, metrics


class Task:
    """Uniform init/loss interface over a flax model."""

    def __init__(self, model, extract_args, postprocess,
                 mutable_collections=()):
        self.model = model
        self.extract_args = extract_args
        self.postprocess = postprocess
        self.mutable = tuple(mutable_collections)
        # which batch leaves may quantize on bf16 upload
        # (TrainerConfig.upload_dtype): inputs only, never targets
        self.upload_cast = (
            _pair_upload_cast if extract_args is _pair_args
            else _no_upload_cast
        )

    def init(self, rng, batch):
        """Initialize all variable collections from an example batch."""
        k1, k2, k3 = jax.random.split(rng, 3)
        args = self.extract_args(upcast_float_inputs(batch))
        return self.model.init(
            {"params": k1, "dropout": k2, "augment": k3},
            *args,
            False,  # deterministic=False exercises every code path
            method=type(self.model).compute_loss,
        )

    def loss(self, params, extra, batch, rng, train: bool):
        """Returns (loss, metrics, new_extra)."""
        variables = {"params": params, **extra}
        args = self.extract_args(upcast_float_inputs(batch))
        kwargs: Dict[str, Any] = dict(method=type(self.model).compute_loss)
        if train and rng is not None:
            k1, k2 = jax.random.split(rng)
            kwargs["rngs"] = {"augment": k1, "dropout": k2}
        mutated = {}
        if train and self.mutable:
            values, mutated_vars = self.model.apply(
                variables, *args, not train,
                mutable=list(self.mutable), **kwargs
            )
            mutated = dict(mutated_vars)
        else:
            values = self.model.apply(variables, *args, not train, **kwargs)
        loss, metrics = self.postprocess(self.model, values)
        new_extra = dict(extra)
        new_extra.update(mutated)
        return loss, metrics, new_extra

    def make_optimizer(self, steps_per_epoch: int) -> optax.GradientTransformation:
        lr = getattr(self.model, "learning_rate", 1e-3)
        if isinstance(self.model, AudioToTextCTC):
            # Adam + weight decay + StepLR(gamma=0.98 per epoch)
            # (reference voice100/models/asr.py:172-178)
            schedule = optax.exponential_decay(
                lr, transition_steps=max(steps_per_epoch, 1),
                decay_rate=0.98, staircase=True,
            )
            # exposed so the trainer can log the LR each epoch (the
            # reference uses Lightning's LearningRateMonitor,
            # voice100/train_asr.py:34)
            self.lr_schedule = schedule
            return optax.adamw(schedule, weight_decay=self.model.weight_decay)
        self.lr_schedule = lambda step: lr
        return optax.adam(lr)


def make_task(model) -> Task:
    if isinstance(model, (AudioToAlignText, AudioAlignCTC)):
        return Task(model, _pair_args, _scalar_post)
    if isinstance(model, AudioToTextCTC):
        return Task(model, _pair_args, _scalar_post,
                    mutable_collections=("batch_stats",))
    if isinstance(model, TextToAlignText):
        return Task(model, _pair_args, _scalar_post)
    if isinstance(model, TextToAlignTextModel):
        return Task(model, _pair_args, _scalar_post,
                    mutable_collections=("batch_stats",))
    if isinstance(model, AlignTextToAudio):
        return Task(model, _world_args, _tts_v2_post)
    if isinstance(model, AlignTextToAudioModel):
        return Task(model, _world_args, _tts_v1_post,
                    mutable_collections=("batch_stats",))
    if isinstance(model, AlignTextToAudioMultiTaskModel):
        return Task(model, _world_target_args, _tts_mt_post,
                    mutable_collections=("batch_stats",))
    raise ValueError(f"No task adapter for {type(model).__name__}")
