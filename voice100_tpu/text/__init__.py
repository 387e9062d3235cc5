"""Text front-end: tokenizers and phonemizers (host-side, pure Python)."""

from .tokenizers import (
    DEFAULT_CHARACTERS,
    CMU_VOCAB,
    JA_VOCAB,
    CharTokenizer,
    BasicTokenizer,
    get_tokenizer,
)
from .phonemizers import BasicPhonemizer, CMUPhonemizer, get_phonemizer

__all__ = [
    "DEFAULT_CHARACTERS",
    "CMU_VOCAB",
    "JA_VOCAB",
    "CharTokenizer",
    "BasicTokenizer",
    "get_tokenizer",
    "BasicPhonemizer",
    "CMUPhonemizer",
    "get_phonemizer",
]
