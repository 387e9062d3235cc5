"""On-device compute ops: audio front-end, recurrence, CTC, augmentation."""

from .melspec import log_mel_spectrogram, MelSpectrogram, MELSPEC_DIM, LOG_OFFSET
from .mask import sequence_mask
from .ctc import ctc_loss, ctc_viterbi_align, ViterbiResult
from .augment import batch_spectrogram_augment, BLANK_AUDIO
from .duration import expand_alignment, expand_alignment_batch

__all__ = [
    "log_mel_spectrogram",
    "MelSpectrogram",
    "MELSPEC_DIM",
    "LOG_OFFSET",
    "sequence_mask",
    "ctc_loss",
    "ctc_viterbi_align",
    "ViterbiResult",
    "batch_spectrogram_augment",
    "BLANK_AUDIO",
    "expand_alignment",
    "expand_alignment_batch",
]
