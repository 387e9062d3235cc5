"""Data modules: the stage-aware dataset/loader assembly.

Same responsibilities and configuration surface as the reference
AudioTextDataModule / AlignTextDataModule
(voice100/data_modules.py:503-670,685-742): pick vocoder + tokenizer +
collate from flags, build the corpus from the registry, 90/10 random
split (librispeech uses its explicit dev-clean), wrap in the feature
cache, and expose stage dataloaders.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..text import get_tokenizer
from .collate import get_collate_fn, collate_text_align
from .datasets import AlignTextDataset, SubsetDataset
from .loader import DataLoader
from .registry import get_dataset
from .transforms import EncodedCacheDataset, get_audio_transform

__all__ = ["AudioTextDataModule", "AlignTextDataModule"]


class AudioTextDataModule:
    """Audio+text pairs, optionally with aligned text
    (reference voice100/data_modules.py:503-670)."""

    def __init__(
        self,
        vocoder: str,
        dataset: str = "ljspeech",
        sample_rate: int = 16000,
        language: str = "en",
        use_align: bool = False,
        use_phone: bool = False,
        use_target: bool = False,
        data_dir: str = "./data",
        cache_dir: str = "./cache",
        batch_size: int = 128,
        num_workers: int = 0,
        valid_ratio: float = 0.1,
        seed: int = 1234,
        cache_dtype: Optional[str] = "auto",
        bucket_by_length: bool = False,
    ) -> None:
        self.vocoder = vocoder
        self.dataset = dataset
        self.split_dataset = dataset != "librispeech"
        self.valid_ratio = valid_ratio
        self.sample_rate = sample_rate
        self.language = language
        self.use_align = use_align
        self.use_phone = use_phone
        self.use_target = use_target
        self.data_dir = data_dir
        self.cache_dir = cache_dir
        # world and world_mcep share one (mcep-form) cache
        # (reference data_modules.py:545). Non-default sample rates get
        # their own salt so a 22.05 kHz run over a cache dir populated at
        # 16 kHz can't silently read back stale 16 kHz features (the
        # reference keys on vocoder alone and has this footgun).
        self.cache_salt = (
            "world" if vocoder == "world_mcep" else vocoder
        ).encode("utf-8")
        if sample_rate != 16000:
            self.cache_salt += f"@{sample_rate}".encode("utf-8")
        if vocoder in ("world", "world_mcep"):
            # estimator-version token: an analysis-algorithm change
            # (dsp.world.FEATURE_VERSION bump) must recompute cached
            # WORLD features, not silently mix old and new supervision
            # targets in one cache dir
            from ..dsp.world import FEATURE_VERSION

            self.cache_salt += f"@{FEATURE_VERSION}".encode("utf-8")
        # mel features are model INPUTS only, so they cache (and
        # upload) as float16 by default: half the cache-read bytes and
        # half the host->device bytes per batch; the train step upcasts
        # on device. WORLD features are supervision targets — they stay
        # float32 so the training objective is cache-dtype-independent.
        if cache_dtype == "auto":
            cache_dtype = "float16" if vocoder == "mel" else None
        self.cache_dtype = cache_dtype
        if cache_dtype is not None:
            # dtype-keyed salt: a run with a different cache dtype must
            # not read back entries quantized differently
            self.cache_salt += f"@{cache_dtype}".encode("utf-8")
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.seed = seed
        # length-bucketed TRAIN batches (loader.py length_hint): with a
        # uniform sampler + pad-to-batch-max collate, one long clip
        # drags every batch it lands in to the top time bucket, so on
        # wide-length corpora most compute is padding. Opt-in because
        # it correlates batch composition with clip length (standard
        # bucket-sampler tradeoff; the reference's uniform sampler has
        # the padding cost instead). Item lengths come from feature
        # cache file headers, so cold-cache epochs batch unbucketed and
        # bucketing engages once the cache is warm.
        self.bucket_by_length = bucket_by_length
        self.collate_fn = get_collate_fn(vocoder, use_target)
        self.audio_transform = get_audio_transform(vocoder, sample_rate)
        self.text_transform = get_tokenizer(language, use_phone)
        self.targettext_transform = (
            get_tokenizer(language, True) if use_target else None
        )
        self.train_ds = None
        self.valid_ds = None
        self.test_ds = None
        self.predict_ds = None

    @property
    def audio_size(self) -> int:
        return self.audio_transform.audio_size

    @property
    def vocab_size(self) -> int:
        return self.text_transform.vocab_size

    @property
    def target_vocab_size(self) -> int:
        return self.targettext_transform.vocab_size

    def _wrap_cache(self, ds):
        return EncodedCacheDataset(
            ds,
            audio_transform=self.audio_transform,
            text_transform=self.text_transform,
            targettext_transform=self.targettext_transform,
            cachedir=self.cache_dir,
            salt=self.cache_salt,
            cache_dtype=self.cache_dtype,
        )

    def setup(self, stage: Optional[str] = None) -> None:
        ds = get_dataset(
            self.data_dir,
            self.dataset,
            split="train",
            use_align=self.use_align,
            use_phone=self.use_phone,
            use_target=self.use_target,
        )
        os.makedirs(self.cache_dir, exist_ok=True)

        if stage == "predict":
            self.predict_ds = self._wrap_cache(ds)
        elif stage == "test":
            self.test_ds = self._wrap_cache(ds)
        else:
            if self.split_dataset:
                total = len(ds)
                valid_len = int(total * self.valid_ratio)
                order = np.random.default_rng(self.seed).permutation(total)
                train_ds = SubsetDataset(ds, order[valid_len:])
                valid_ds = SubsetDataset(ds, order[:valid_len])
            else:
                train_ds = ds
                valid_ds = get_dataset(
                    self.data_dir,
                    self.dataset,
                    split="valid",
                    use_align=self.use_align,
                    use_phone=self.use_phone,
                    use_target=self.use_target,
                )
            self.train_ds = self._wrap_cache(train_ds)
            self.valid_ds = self._wrap_cache(valid_ds)

    def _loader(self, ds, shuffle: bool) -> Optional[DataLoader]:
        if ds is None:
            return None
        import jax

        return DataLoader(
            ds,
            batch_size=self.batch_size,
            collate_fn=self.collate_fn,
            shuffle=shuffle,
            seed=self.seed,
            # multi-host DP: each host loads its stride of the corpus
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            num_workers=self.num_workers,
            length_hint=(
                ds.audio_frames
                if self.bucket_by_length and shuffle
                and hasattr(ds, "audio_frames") else None
            ),
        )

    def train_dataloader(self):
        return self._loader(self.train_ds, shuffle=True)

    def val_dataloader(self):
        return self._loader(self.valid_ds, shuffle=False)

    def test_dataloader(self):
        return self._loader(self.test_ds, shuffle=False)

    def predict_dataloader(self):
        return self._loader(self.predict_ds, shuffle=False)


class AlignTextDataModule:
    """Text + frame-count pairs for the duration model
    (reference voice100/data_modules.py:685-742)."""

    def __init__(
        self,
        data_dir: str = "./data",
        dataset: str = "ljspeech",
        language: str = "en",
        use_phone: bool = False,
        valid_ratio: float = 0.1,
        batch_size: int = 256,
        seed: int = 1234,
    ) -> None:
        self.data_dir = data_dir
        self.dataset = dataset
        self.language = language
        self.use_phone = use_phone
        self.valid_ratio = valid_ratio
        self.batch_size = batch_size
        self.seed = seed
        self.collate_fn = collate_text_align
        self.encoder = get_tokenizer(language, use_phone)
        self.train_ds = None
        self.valid_ds = None

    @property
    def vocab_size(self) -> int:
        return self.encoder.vocab_size

    def setup(self, stage: Optional[str] = None) -> None:
        infix = "phone-align" if self.use_phone else "align"
        file = os.path.join(
            self.data_dir, f"{self.dataset}-{infix}-train.txt"
        )
        ds = AlignTextDataset(file, tokenizer=self.encoder)
        if stage == "predict":
            self.predict_ds = ds
            return
        total = len(ds)
        valid_len = int(total * self.valid_ratio)
        order = np.random.default_rng(self.seed).permutation(total)
        self.train_ds = SubsetDataset(ds, order[valid_len:])
        self.valid_ds = SubsetDataset(ds, order[:valid_len])

    def train_dataloader(self):
        return DataLoader(
            self.train_ds, self.batch_size, self.collate_fn,
            shuffle=True, seed=self.seed,
        )

    def val_dataloader(self):
        return DataLoader(
            self.valid_ds, self.batch_size, self.collate_fn,
            shuffle=False, seed=self.seed,
        )

    def predict_dataloader(self):
        return DataLoader(
            self.predict_ds, self.batch_size, self.collate_fn,
            shuffle=False, seed=self.seed,
        )
