"""Text front-end tests.

Golden strings match the reference test suite
(/root/reference/tests/test_text.py) so tokenizer/phonemizer behavior is
checked for parity, plus extra coverage for merge_repeated and vocab
invariants.
"""

import numpy as np


def test_vocab_sizes():
    from voice100_tpu.text import DEFAULT_CHARACTERS, CMU_VOCAB, JA_VOCAB

    assert len(DEFAULT_CHARACTERS) == 29
    assert len(CMU_VOCAB) == 71
    assert len(JA_VOCAB) == 44
    # blank at index 0
    assert DEFAULT_CHARACTERS[0] == "_"
    assert CMU_VOCAB[0] == "_"
    assert JA_VOCAB[0] == "-"


def test_text_en():
    from voice100_tpu.text import BasicPhonemizer, CharTokenizer

    phonemizer = BasicPhonemizer()
    tokenizer = CharTokenizer()

    phoneme = phonemizer("Hello World!")
    assert phoneme == "hello world"
    encoded = tokenizer(phoneme)
    assert encoded.shape == (11,)
    assert encoded.dtype == np.int32
    assert tokenizer.decode(encoded) == "hello world"


def test_text_en_merge_repeated():
    from voice100_tpu.text import CharTokenizer

    tokenizer = CharTokenizer()
    assert tokenizer.merge_repeated("yya'__pparri_") == "ya'pari"
    assert tokenizer.merge_repeated(" ") == ""
    assert tokenizer.merge_repeated("__") == ""


def test_text_en_phone():
    from voice100_tpu.text import CMUPhonemizer, BasicTokenizer

    phonemizer = CMUPhonemizer()
    tokenizer = BasicTokenizer(language="en")

    phoneme = phonemizer("Hello World!")
    assert phoneme == "HH/AH0/L/OW1/ /W/ER1/L/D/ /!"
    encoded = tokenizer(phoneme)
    assert encoded.shape == (8,)
    assert tokenizer.decode(encoded) == "HH/AH0/L/OW1/W/ER1/L/D"


def test_text_en_phone_oov():
    from voice100_tpu.text import CMUPhonemizer, BasicTokenizer

    phonemizer = CMUPhonemizer()
    tokenizer = BasicTokenizer(language="en")
    # rule-based fallback still yields encodable CMU phones
    phoneme = phonemizer("zyzzyva micro")
    encoded = tokenizer(phoneme)
    assert encoded.shape[0] > 0
    decoded = tokenizer.decode(encoded)
    for tok in decoded.split("/"):
        assert tok in set(tokenizer._vocab)


def test_text_en_numbers():
    from voice100_tpu.text import CMUPhonemizer

    phonemizer = CMUPhonemizer()
    out = phonemizer("in 1942")
    # numbers are spelled out before G2P, in g2p_en's year style
    # (nineteen forty two, voice100/text.py:64-71 via normalize_numbers)
    assert out == "IH0/N/ /N/AY1/N/T/IY1/N/ /F/AO1/R/T/IY0/ /T/UW1"


def test_text_ja():
    from voice100_tpu.text import CharTokenizer
    from voice100_tpu.text.japanese import JapanesePhonemizer

    phonemizer = JapanesePhonemizer()
    tokenizer = CharTokenizer()

    phoneme = phonemizer("こんにちは世界！")
    assert phoneme == "kon'nichiwasekai"
    encoded = tokenizer(phoneme)
    assert encoded.shape == (16,)
    assert tokenizer.decode(encoded) == "kon'nichiwasekai"

    phoneme = phonemizer("やっぱりヴォイス？")
    assert phoneme == "ya'pariboisu"
    encoded = tokenizer(phoneme)
    assert encoded.shape == (12,)
    assert tokenizer.decode(encoded) == "ya'pariboisu"

    merged = tokenizer.merge_repeated("yya'__pparri_")
    assert merged == "ya'pari"


def test_text_ja_phone():
    from voice100_tpu.text import BasicTokenizer
    from voice100_tpu.text.japanese import JapanesePhonemizer

    phonemizer = JapanesePhonemizer(use_phone=True)
    tokenizer = BasicTokenizer(language="ja")

    phoneme = phonemizer("こんにちは世界！")
    assert phoneme == "k o N n i ch i w a s e k a i !"
    encoded = tokenizer(phoneme)
    assert encoded.shape == (15,)
    assert tokenizer.decode(encoded) == "k o N n i ch i w a s e k a i !"

    phoneme = phonemizer("やっぱりヴォイス？")
    assert phoneme == "y a q p a r i b o i s u ?"
    encoded = tokenizer(phoneme)
    assert encoded.shape == (13,)
    assert tokenizer.decode(encoded) == "y a q p a r i b o i s u ?"

    phoneme = phonemizer("「やっぱり」は★-Voice?")
    assert phoneme == "y a q p a r i w a ★ b o i k e ?"
    encoded = tokenizer(phoneme)
    assert encoded.shape == (15,)
    assert tokenizer.decode(encoded) == "y a q p a r i w a b o i k e ?"

    # robustness to garbage in phone strings
    encoded = tokenizer("k o N n i - ch i あ w a C a v u")
    assert encoded.shape == (12,)
    assert tokenizer.decode(encoded) == "k o N n i - ch i w a a u"

    merged = tokenizer.merge_repeated(
        "- - k o o N - n - - i - ch - i i w a - a -"
    )
    assert merged == "k o N n i ch i w a a"


def test_kata2phoneme_long_vowel():
    from voice100_tpu.text.japanese import kata2phoneme

    assert kata2phoneme("コーヒー") == "k o: h i:"
    assert kata2phoneme("スープ") == "s u: p u"
