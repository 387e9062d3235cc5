"""Japanese text -> katakana reading (yomi).

The reference obtains readings from MeCab via fugashi
(voice100/japanese/phonemizer.py:355-380). This module keeps the same
token-level policy but makes the reading source pluggable:

* ``MecabReader`` — used automatically when ``fugashi`` is importable
  (full coverage, identical to the reference).
* ``LexiconReader`` — hermetic fallback: kana passes through, a
  longest-match embedded lexicon covers common words/phrases, and a
  single-kanji reading table catches the rest. Unknown tokens pass
  through unchanged (the reference does the same for words MeCab cannot
  read), and downstream cleanup drops what the vocabulary cannot encode.

For production-quality Japanese corpora install ``fugashi`` + a dictionary.
"""

from __future__ import annotations

import re
from typing import List, Tuple

from .kana import hira2kata
from .readings import COMPOUNDS, KUN, ON

__all__ = ["text2kata"]

_SYMBOL_TOKENS = set("・、。？！")
_NO_YOMI_TOKENS = set("「」『』―（）［］[]　…")

_HIRA_RX = re.compile(r"[ぁ-んー]+")
_KATA_RX = re.compile(r"[ァ-ヶー]+")
_ASCII_RX = re.compile(r"[0-9A-Za-z]+")
_KANJI_RX = re.compile(r"[一-龯々]+")

# Compound keys bucketed by first char, longest first, so the scanner
# tries only plausible matches at each position.
_BY_FIRST: dict = {}
for _surface, _reading in COMPOUNDS.items():
    _BY_FIRST.setdefault(_surface[0], []).append((_surface, _reading))
for _lst in _BY_FIRST.values():
    _lst.sort(key=lambda kv: -len(kv[0]))


class LexiconReader:
    """Dictionary-free segmentation with embedded readings.

    Policy (tables in ``readings.py``): longest-match ``COMPOUNDS``
    first at every position; an unmatched single kanji — standing alone
    or followed by okurigana — takes its ``KUN`` reading; unmatched
    kanji inside a multi-kanji run take ``ON`` (the dominant jukugo
    reading). Kana passes through; a lone は between tokens is the
    topic particle (ワ). Unknown tokens pass through unchanged, as the
    reference does for words MeCab cannot read."""

    def tokens(self, text: str) -> List[Tuple[str, str]]:
        out: List[Tuple[str, str]] = []
        i = 0
        n = len(text)
        while i < n:
            surface_reading = self._match_compound(text, i)
            if surface_reading is not None:
                out.append(surface_reading)
                i += len(surface_reading[0])
                continue
            ch = text[i]
            m = _HIRA_RX.match(text, i)
            if m:
                run = m.group(0)
                if run == "へ":
                    # a lone へ between non-hiragana is the directional
                    # particle, pronounced エ
                    yomi = "エ"
                elif run == "は":
                    # a lone は between non-hiragana is the topic
                    # particle regardless of what precedes (brackets,
                    # symbols): ワ
                    yomi = "ワ"
                elif run.startswith("は") and out and out[-1][1]:
                    # は opening a hiragana run right after a read word
                    # is (almost always) the topic particle: ワ
                    yomi = "ワ" + hira2kata(run[1:])
                elif len(run) >= 2 and run.endswith("は"):
                    # ... as is a run-final は before kanji/punctuation
                    # (子供たちは公園で, それでは。)
                    yomi = hira2kata(run[:-1]) + "ワ"
                else:
                    yomi = hira2kata(run)
                out.append((run, yomi))
                i = m.end()
                continue
            m = _KATA_RX.match(text, i)
            if m:
                out.append((m.group(0), m.group(0)))
                i = m.end()
                continue
            m = _ASCII_RX.match(text, i)
            if m:
                out.append((m.group(0), ""))  # no reading: pass through
                i = m.end()
                continue
            m = _KANJI_RX.match(text, i)
            if m:
                i = self._kanji_run(text, i, m.end(), out)
                continue
            out.append((ch, ""))
            i += 1
        return out

    @staticmethod
    def _match_compound(text: str, i: int):
        for surface, reading in _BY_FIRST.get(text[i], ()):
            if text.startswith(surface, i):
                return surface, reading
        return None

    def _kanji_run(self, text: str, i: int, end: int,
                   out: List[Tuple[str, str]]) -> int:
        """Consume one maximal kanji run [i, end) with compound-first,
        then KUN (isolated / okurigana-final) or ON (inside-run)."""
        run_len = end - i
        pos = i
        while pos < end:
            hit = self._match_compound(text, pos)
            if hit is not None and pos + len(hit[0]) <= end:
                out.append(hit)
                pos += len(hit[0])
                continue
            ch = text[pos]
            if ch == "々" and out and out[-1][1]:
                # iteration mark: repeat the previous reading with the
                # common voicing left alone (人々 is in COMPOUNDS)
                out.append((ch, out[-1][1]))
                pos += 1
                continue
            # a run-final kanji right before hiragana is a verb/adj stem
            # with okurigana (kun); inside a jukugo run it's on
            isolated = run_len == 1 or (
                pos == end - 1 and _HIRA_RX.match(text, end) is not None
            )
            if isolated:
                yomi = KUN.get(ch) or ON.get(ch) or ""
            else:
                yomi = ON.get(ch) or KUN.get(ch) or ""
            out.append((ch, yomi))
            pos += 1
        return end


class MecabReader:
    """MeCab-backed reader, equivalent to the reference tagger usage."""

    def __init__(self) -> None:
        import fugashi  # type: ignore

        self._tagger = fugashi.Tagger()

    def tokens(self, text: str) -> List[Tuple[str, str]]:
        out: List[Tuple[str, str]] = []
        for line in self._tagger.parse(text).split("\n"):
            if line == "EOS":
                break
            parts = line.split("\t")
            word = parts[0]
            yomi = parts[1] if len(parts) > 1 else ""
            out.append((word, yomi))
        return out


def _make_reader():
    try:
        return MecabReader()
    except Exception:
        return LexiconReader()


_READER = None


def text2kata(text: str) -> str:
    """Japanese text -> katakana string.

    Token policy mirrors voice100/japanese/phonemizer.py:360-380: use the
    reading when available; symbols and small-tsu pass through; bracket
    tokens are dropped; unreadable words pass through unchanged.
    """
    global _READER
    if _READER is None:
        _READER = _make_reader()
    res: List[str] = []
    for word, yomi in _READER.tokens(text):
        if yomi:
            res.append(yomi)
        elif word in _SYMBOL_TOKENS:
            res.append(word)
        elif word in ("っ", "ッ"):
            res.append("ッ")
        elif word in _NO_YOMI_TOKENS:
            pass
        else:
            res.append(word)
    return hira2kata("".join(res))
