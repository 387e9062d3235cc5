"""Model catalog (reference voice100/models/__init__.py).

v2 (current): AudioToAlignText (ASR/alignment), TextToAlignText
(TTS duration), AlignTextToAudio (TTS acoustic).
v1 (deprecated but supported): AudioToTextCTC, AudioAlignCTC,
TextToAlignTextModel, AlignTextToAudioModel,
AlignTextToAudioMultiTaskModel.
"""

from .asr_v2 import AudioToAlignText
from .align_v2 import TextToAlignText
from .tts_v2 import AlignTextToAudio
from .asr_v1 import AudioToTextCTC
from .align_v1 import AudioAlignCTC
from .tts_v1 import (
    TextToAlignTextModel,
    AlignTextToAudioModel,
    AlignTextToAudioMultiTaskModel,
)

__all__ = [
    "AudioToAlignText",
    "TextToAlignText",
    "AlignTextToAudio",
    "AudioToTextCTC",
    "AudioAlignCTC",
    "TextToAlignTextModel",
    "AlignTextToAudioModel",
    "AlignTextToAudioMultiTaskModel",
]
