"""Data layer: corpus readers, registry, feature cache, loaders."""

from .datasets import (
    MetafileDataset,
    LibriSpeechDataset,
    TextDataset,
    MergeDataset,
    ConcatDataset,
    SubsetDataset,
    AlignTextDataset,
)
from .registry import get_dataset, get_base_dataset
from .transforms import (
    MelSpectrogramAudioTransform,
    WORLDAudioProcessor,
    EncodedCacheDataset,
    get_audio_transform,
)
from .collate import get_collate_fn
from .loader import DataLoader
from .datamodule import AudioTextDataModule, AlignTextDataModule

__all__ = [
    "MetafileDataset",
    "LibriSpeechDataset",
    "TextDataset",
    "MergeDataset",
    "ConcatDataset",
    "SubsetDataset",
    "AlignTextDataset",
    "get_dataset",
    "get_base_dataset",
    "MelSpectrogramAudioTransform",
    "WORLDAudioProcessor",
    "EncodedCacheDataset",
    "get_audio_transform",
    "get_collate_fn",
    "DataLoader",
    "AudioTextDataModule",
    "AlignTextDataModule",
]
