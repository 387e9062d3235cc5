"""English grapheme-to-phoneme (CMU phone set).

The reference delegates English G2P to the ``g2p_en`` package
(voice100/text.py:59-71), which combines a CMUdict lookup with a neural
fallback. This environment has neither the package nor the dictionary
data, so this module provides a self-contained replacement with the same
output contract (a list of CMU phone tokens, words separated by ``' '``
tokens, punctuation passed through):

1. an embedded exception lexicon of common words (accurate CMUdict
   pronunciations),
2. a deterministic rule-based letter-to-sound engine for everything else,
3. optional upgrades: an external CMUdict-format lexicon file
   (``G2P(lexicon_path=...)``) or the real ``g2p_en`` package when
   importable.

The fallback rules favor consistency over perfection; for production
phone-mode corpora, point ``lexicon_path`` at a full CMUdict.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

__all__ = ["G2P"]

# Accurate CMUdict pronunciations for frequent words (function words and
# words appearing in the project's demo texts / tests).
_LEXICON: Dict[str, str] = {
    "a": "AH0", "an": "AE1 N", "the": "DH AH0", "and": "AH0 N D",
    "of": "AH1 V", "to": "T UW1", "in": "IH0 N", "is": "IH1 Z",
    "it": "IH1 T", "that": "DH AE1 T", "was": "W AA1 Z", "he": "HH IY1",
    "she": "SH IY1", "for": "F AO1 R", "on": "AA1 N", "are": "AA1 R",
    "as": "AE1 Z", "with": "W IH1 DH", "his": "HH IH1 Z", "her": "HH ER0",
    "they": "DH EY1", "i": "AY1", "at": "AE1 T", "be": "B IY1",
    "this": "DH IH1 S", "have": "HH AE1 V", "had": "HH AE1 D",
    "has": "HH AE1 Z", "from": "F R AH1 M", "or": "AO1 R",
    "one": "W AH1 N", "by": "B AY1", "word": "W ER1 D", "but": "B AH1 T",
    "not": "N AA1 T", "what": "W AH1 T", "all": "AO1 L",
    "were": "W ER1", "we": "W IY1", "when": "W EH1 N", "your": "Y AO1 R",
    "can": "K AE1 N", "said": "S EH1 D", "there": "DH EH1 R",
    "use": "Y UW1 S", "each": "IY1 CH", "which": "W IH1 CH",
    "do": "D UW1", "how": "HH AW1", "their": "DH EH1 R",
    "if": "IH1 F", "will": "W IH1 L", "up": "AH1 P", "other": "AH1 DH ER0",
    "about": "AH0 B AW1 T", "out": "AW1 T", "many": "M EH1 N IY0",
    "then": "DH EH1 N", "them": "DH EH1 M", "these": "DH IY1 Z",
    "so": "S OW1", "some": "S AH1 M", "would": "W UH1 D",
    "into": "IH0 N T UW1", "who": "HH UW1", "you": "Y UW1",
    "has'nt": "HH AE1 Z AH0 N T",
    "no": "N OW1", "two": "T UW1", "more": "M AO1 R",
    "could": "K UH1 D", "been": "B IH1 N", "now": "N AW1",
    "than": "DH AE1 N", "its": "IH1 T S", "only": "OW1 N L IY0",
    "very": "V EH1 R IY0", "after": "AE1 F T ER0", "any": "EH1 N IY0",
    "our": "AW1 ER0", "over": "OW1 V ER0", "also": "AO1 L S OW0",
    "again": "AH0 G EH1 N", "before": "B IH0 F AO1 R",
    "through": "TH R UW1", "where": "W EH1 R", "being": "B IY1 IH0 NG",
    "because": "B IH0 K AO1 Z", "does": "D AH1 Z", "ever": "EH1 V ER0",
    "once": "W AH1 N S", "down": "D AW1 N", "should": "SH UH1 D",
    "people": "P IY1 P AH0 L", "world": "W ER1 L D",
    "hello": "HH AH0 L OW1", "voice": "V OY1 S",
    "water": "W AO1 T ER0", "first": "F ER1 S T", "time": "T AY1 M",
    "year": "Y IH1 R", "day": "D EY1", "good": "G UH1 D",
    "great": "G R EY1 T", "little": "L IH1 T AH0 L",
    "own": "OW1 N", "say": "S EY1", "says": "S EH1 Z",
    "mr": "M IH1 S T ER0", "mrs": "M IH1 S IH0 Z",
    "new": "N UW1", "old": "OW1 L D", "see": "S IY1",
    "way": "W EY1", "may": "M EY1", "come": "K AH1 M",
    "work": "W ER1 K", "made": "M EY1 D", "live": "L IH1 V",
    "give": "G IH1 V", "most": "M OW1 S T", "us": "AH1 S",
    # words from the reference demo texts (update_samples.py:98-101)
    "beginnings": "B IH0 G IH1 N IH0 NG Z",
    "apt": "AE1 P T",
    "determinative": "D IH0 T ER1 M IH0 N AH0 T IH0 V",
    "reinforced": "R IY2 IH0 N F AO1 R S T",
    "continuous": "K AH0 N T IH1 N Y UW0 AH0 S",
    "applications": "AE2 P L AH0 K EY1 SH AH0 N Z",
    "similar": "S IH1 M AH0 L ER0",
    "influence": "IH1 N F L UW0 AH0 N S",
    "restored": "R IH0 S T AO1 R D",
    "courage": "K ER1 IH0 JH",
    "since": "S IH1 N S",
    "conversed": "K AH0 N V ER1 S T",
    "priest": "P R IY1 S T",
    "violent": "V AY1 AH0 L AH0 N T",
    "despair": "D IH0 S P EH1 R",
    "yielded": "Y IY1 L D IH0 D",
    "calm": "K AA1 M",
    "resignation": "R EH2 Z IH0 G N EY1 SH AH0 N",
    "surprised": "S ER0 P R AY1 Z D",
    "knew": "N UW1",
    "excessive": "IH0 K S EH1 S IH0 V",
    "affection": "AH0 F EH1 K SH AH0 N",
    # numbers (feeds the digit expansion)
    "zero": "Z IH1 R OW0", "three": "TH R IY1", "four": "F AO1 R",
    "five": "F AY1 V", "six": "S IH1 K S", "seven": "S EH1 V AH0 N",
    "eight": "EY1 T", "nine": "N AY1 N", "ten": "T EH1 N",
    "eleven": "IH0 L EH1 V AH0 N", "twelve": "T W EH1 L V",
    "thirteen": "TH ER1 T IY1 N", "fourteen": "F AO1 R T IY1 N",
    "fifteen": "F IH1 F T IY1 N", "sixteen": "S IH0 K S T IY1 N",
    "seventeen": "S EH1 V AH0 N T IY1 N",
    "eighteen": "EY0 T IY1 N", "nineteen": "N AY1 N T IY1 N",
    "twenty": "T W EH1 N T IY0", "thirty": "TH ER1 T IY0",
    "forty": "F AO1 R T IY0", "fifty": "F IH1 F T IY0",
    "sixty": "S IH1 K S T IY0", "seventy": "S EH1 V AH0 N T IY0",
    "eighty": "EY1 T IY0", "ninety": "N AY1 N T IY0",
    "hundred": "HH AH1 N D R AH0 D",
    "thousand": "TH AW1 Z AH0 N D",
    "million": "M IH1 L Y AH0 N",
    # common verbs/nouns/adjectives
    "make": "M EY1 K", "made": "M EY1 D", "take": "T EY1 K",
    "took": "T UH1 K", "get": "G EH1 T", "got": "G AA1 T",
    "go": "G OW1", "went": "W EH1 N T", "gone": "G AO1 N",
    "know": "N OW1", "known": "N OW1 N", "think": "TH IH1 NG K",
    "thought": "TH AO1 T", "come": "K AH1 M", "came": "K EY1 M",
    "look": "L UH1 K", "want": "W AA1 N T", "give": "G IH1 V",
    "gave": "G EY1 V", "find": "F AY1 N D", "found": "F AW1 N D",
    "tell": "T EH1 L", "told": "T OW1 L D", "ask": "AE1 S K",
    "seem": "S IY1 M", "feel": "F IY1 L", "felt": "F EH1 L T",
    "leave": "L IY1 V", "left": "L EH1 F T", "call": "K AO1 L",
    "put": "P UH1 T", "mean": "M IY1 N", "keep": "K IY1 P",
    "kept": "K EH1 P T", "let": "L EH1 T", "begin": "B IH0 G IH1 N",
    "began": "B IH0 G AE1 N", "show": "SH OW1", "hear": "HH IY1 R",
    "heard": "HH ER1 D", "play": "P L EY1", "run": "R AH1 N",
    "move": "M UW1 V", "like": "L AY1 K", "believe": "B IH0 L IY1 V",
    "hold": "HH OW1 L D", "held": "HH EH1 L D", "bring": "B R IH1 NG",
    "brought": "B R AO1 T", "happen": "HH AE1 P AH0 N",
    "write": "R AY1 T", "written": "R IH1 T AH0 N",
    "wrote": "R OW1 T", "read": "R IY1 D", "sit": "S IH1 T",
    "sat": "S AE1 T", "stand": "S T AE1 N D", "stood": "S T UH1 D",
    "lose": "L UW1 Z", "lost": "L AO1 S T", "pay": "P EY1",
    "meet": "M IY1 T", "met": "M EH1 T",
    "include": "IH0 N K L UW1 D", "continue": "K AH0 N T IH1 N Y UW0",
    "set": "S EH1 T", "learn": "L ER1 N", "change": "CH EY1 N JH",
    "lead": "L IY1 D", "understand": "AH2 N D ER0 S T AE1 N D",
    "watch": "W AA1 CH", "follow": "F AA1 L OW0",
    "stop": "S T AA1 P", "create": "K R IY0 EY1 T",
    "speak": "S P IY1 K", "spoke": "S P OW1 K",
    "spend": "S P EH1 N D", "spent": "S P EH1 N T",
    "grow": "G R OW1", "grew": "G R UW1", "open": "OW1 P AH0 N",
    "walk": "W AO1 K", "win": "W IH1 N", "won": "W AH1 N",
    "offer": "AO1 F ER0", "remember": "R IH0 M EH1 M B ER0",
    "love": "L AH1 V", "consider": "K AH0 N S IH1 D ER0",
    "appear": "AH0 P IH1 R", "buy": "B AY1", "bought": "B AO1 T",
    "wait": "W EY1 T", "serve": "S ER1 V", "die": "D AY1",
    "send": "S EH1 N D", "sent": "S EH1 N T", "expect": "IH0 K S P EH1 K T",
    "build": "B IH1 L D", "built": "B IH1 L T", "stay": "S T EY1",
    "fall": "F AO1 L", "fell": "F EH1 L", "cut": "K AH1 T",
    "reach": "R IY1 CH", "kill": "K IH1 L", "remain": "R IH0 M EY1 N",
    "man": "M AE1 N", "men": "M EH1 N", "woman": "W UH1 M AH0 N",
    "women": "W IH1 M AH0 N", "child": "CH AY1 L D",
    "children": "CH IH1 L D R AH0 N", "life": "L AY1 F",
    "hand": "HH AE1 N D", "part": "P AA1 R T", "eye": "AY1",
    "eyes": "AY1 Z", "place": "P L EY1 S", "case": "K EY1 S",
    "week": "W IY1 K", "company": "K AH1 M P AH0 N IY0",
    "system": "S IH1 S T AH0 M", "program": "P R OW1 G R AE2 M",
    "question": "K W EH1 S CH AH0 N", "government": "G AH1 V ER0 M AH0 N T",
    "number": "N AH1 M B ER0", "night": "N AY1 T", "point": "P OY1 N T",
    "home": "HH OW1 M", "room": "R UW1 M", "mother": "M AH1 DH ER0",
    "father": "F AA1 DH ER0", "money": "M AH1 N IY0", "story": "S T AO1 R IY0",
    "fact": "F AE1 K T", "month": "M AH1 N TH", "lot": "L AA1 T",
    "right": "R AY1 T", "study": "S T AH1 D IY0", "book": "B UH1 K",
    "word": "W ER1 D", "business": "B IH1 Z N AH0 S",
    "issue": "IH1 SH UW0", "side": "S AY1 D", "kind": "K AY1 N D",
    "head": "HH EH1 D", "house": "HH AW1 S", "friend": "F R EH1 N D",
    "hour": "AW1 ER0", "game": "G EY1 M", "line": "L AY1 N",
    "end": "EH1 N D", "member": "M EH1 M B ER0", "law": "L AO1",
    "car": "K AA1 R", "city": "S IH1 T IY0", "name": "N EY1 M",
    "team": "T IY1 M", "minute": "M IH1 N AH0 T", "idea": "AY0 D IY1 AH0",
    "body": "B AA1 D IY0", "face": "F EY1 S", "others": "AH1 DH ER0 Z",
    "level": "L EH1 V AH0 L", "door": "D AO1 R", "health": "HH EH1 L TH",
    "person": "P ER1 S AH0 N", "art": "AA1 R T", "war": "W AO1 R",
    "history": "HH IH1 S T ER0 IY0", "party": "P AA1 R T IY0",
    "result": "R IH0 Z AH1 L T", "morning": "M AO1 R N IH0 NG",
    "reason": "R IY1 Z AH0 N", "research": "R IY1 S ER0 CH",
    "moment": "M OW1 M AH0 N T", "air": "EH1 R", "force": "F AO1 R S",
    "state": "S T EY1 T", "area": "EH1 R IY0 AH0",
    "music": "M Y UW1 Z IH0 K", "mind": "M AY1 N D",
    "good": "G UH1 D", "high": "HH AY1", "small": "S M AO1 L",
    "large": "L AA1 R JH", "big": "B IH1 G", "long": "L AO1 NG",
    "young": "Y AH1 NG", "different": "D IH1 F ER0 AH0 N T",
    "important": "IH0 M P AO1 R T AH0 N T", "few": "F Y UW1",
    "public": "P AH1 B L IH0 K", "bad": "B AE1 D",
    "same": "S EY1 M", "able": "EY1 B AH0 L", "last": "L AE1 S T",
    "early": "ER1 L IY0", "possible": "P AA1 S AH0 B AH0 L",
    "late": "L EY1 T", "hard": "HH AA1 R D", "far": "F AA1 R",
    "real": "R IY1 L", "best": "B EH1 S T", "sure": "SH UH1 R",
    "better": "B EH1 T ER0", "true": "T R UW1", "whole": "HH OW1 L",
    "certain": "S ER1 T AH0 N", "free": "F R IY1", "full": "F UH1 L",
    "special": "S P EH1 SH AH0 L", "easy": "IY1 Z IY0",
    "clear": "K L IH1 R", "strong": "S T R AO1 NG",
    "never": "N EH1 V ER0", "here": "HH IY1 R", "still": "S T IH1 L",
    "well": "W EH1 L", "just": "JH AH1 S T", "even": "IY1 V AH0 N",
    "back": "B AE1 K", "much": "M AH1 CH", "today": "T AH0 D EY1",
    "however": "HH AW2 EH1 V ER0", "almost": "AO1 L M OW2 S T",
    "enough": "IH0 N AH1 F", "both": "B OW1 TH",
    "between": "B IH0 T W IY1 N", "under": "AH1 N D ER0",
    "against": "AH0 G EH1 N S T", "during": "D UH1 R IH0 NG",
    "without": "W IH0 TH AW1 T", "around": "ER0 AW1 N D",
    "among": "AH0 M AH1 NG", "within": "W IH0 DH IH1 N",
    "upon": "AH0 P AA1 N", "toward": "T AH0 W AO1 R D",
    "voice": "V OY1 S", "sound": "S AW1 N D", "speech": "S P IY1 CH",
    "language": "L AE1 NG G W AH0 JH",
}

_UNITS = "zero one two three four five six seven eight nine".split()
_TEENS = ("ten eleven twelve thirteen fourteen fifteen sixteen "
          "seventeen eighteen nineteen").split()
_TENS = ("twenty thirty forty fifty sixty seventy eighty ninety").split()

_VOWELS = set("aeiouy")

# Letter-to-sound rules. Each entry: (grapheme, condition, phones).
# Conditions: "" always; "V" next letter is a vowel letter; "C" next is a
# consonant/end; "^" word start; "$" word end; "eI" next letter in e/i/y.
# Rules are tried longest-grapheme-first at each position.
_LTS_RULES = [
    # multi-letter consonants
    ("tch", "", "CH"), ("sch", "", "S K"), ("dge", "", "JH"),
    ("ough", "$", "OW"), ("augh", "", "AO"), ("eigh", "", "EY"),
    ("igh", "", "AY"),
    ("tion", "", "SH AH0 N"), ("sion", "", "ZH AH0 N"),
    ("cial", "", "SH AH0 L"), ("tial", "", "SH AH0 L"),
    ("ture", "$", "CH ER0"), ("sure", "$", "ZH ER0"),
    ("ph", "", "F"), ("gh", "^", "G"), ("gh", "", ""),
    ("ch", "", "CH"), ("sh", "", "SH"), ("th", "", "TH"),
    ("wh", "^", "W"), ("ck", "", "K"), ("ng", "$", "NG"),
    ("ng", "", "NG G"), ("qu", "", "K W"), ("wr", "^", "R"),
    ("kn", "^", "N"), ("gn", "^", "N"), ("ps", "^", "S"),
    ("mb", "$", "M"), ("sc", "eI", "S"),
    # vowel teams
    ("eau", "", "OW"), ("iou", "", "IY AH0"),
    ("ee", "", "IY"), ("ea", "", "IY"), ("ai", "", "EY"), ("ay", "", "EY"),
    ("oa", "", "OW"), ("oo", "", "UW"), ("ou", "", "AW"), ("ow", "$", "OW"),
    ("ow", "", "AW"), ("au", "", "AO"), ("aw", "", "AO"), ("oi", "", "OY"),
    ("oy", "", "OY"), ("ie", "$", "AY"), ("ie", "", "IY"), ("ei", "", "IY"),
    ("ey", "", "IY"), ("ue", "", "UW"), ("ui", "", "UW"), ("eu", "", "UW"),
    ("ew", "", "UW"),
    # r-controlled vowels
    ("air", "", "EH R"), ("are", "$", "EH R"), ("ear", "", "IH R"),
    ("eer", "", "IH R"), ("ar", "", "AA R"), ("er", "$", "ER0"),
    ("er", "", "ER"), ("ir", "", "ER"), ("or", "", "AO R"),
    ("ur", "", "ER"), ("yr", "", "ER"),
    # single vowels (short defaults; magic-e handled by caller)
    ("a", "", "AE"), ("e", "$", ""), ("e", "", "EH"), ("i", "", "IH"),
    ("o", "", "AA"), ("u", "", "AH"), ("y", "^", "Y"), ("y", "$", "IY"),
    ("y", "", "IH"),
    # consonants
    ("b", "", "B"), ("c", "eI", "S"), ("c", "", "K"), ("d", "", "D"),
    ("f", "", "F"), ("g", "eI", "JH"), ("g", "", "G"), ("h", "", "HH"),
    ("j", "", "JH"), ("k", "", "K"), ("l", "", "L"), ("m", "", "M"),
    ("n", "", "N"), ("p", "", "P"), ("r", "", "R"), ("s", "", "S"),
    ("t", "", "T"), ("v", "", "V"), ("w", "", "W"), ("x", "", "K S"),
    ("z", "", "Z"), ("'", "", ""),
]

# Long (magic-e) vowel values used when a vowel is followed by a single
# consonant + "e" at the end of the word.
_LONG_VOWEL = {"a": "EY", "e": "IY", "i": "AY", "o": "OW", "u": "Y UW"}

_STRESSABLE = {
    "AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY",
    "IH", "IY", "OW", "OY", "UH", "UW",
}

_WORD_RX = re.compile(r"[a-z']+|[0-9]+|[^\sa-z0-9']")


def _number_to_words(num: str) -> List[str]:
    """Spell out a non-negative integer (small-scale; digits fall back
    to digit-by-digit for very large values)."""
    n = int(num)
    if n >= 1_000_000_000:
        return [_UNITS[int(d)] for d in num]
    words: List[str] = []

    def under_thousand(k: int) -> List[str]:
        out = []
        if k >= 100:
            out += [_UNITS[k // 100], "hundred"]
            k %= 100
        if k >= 20:
            out.append(_TENS[k // 10 - 2])
            k %= 10
            if k:
                out.append(_UNITS[k])
        elif k >= 10:
            out.append(_TEENS[k - 10])
        elif k > 0 or not out:
            out.append(_UNITS[k])
        return out

    if n >= 1_000_000:
        words += under_thousand(n // 1_000_000) + ["million"]
        n %= 1_000_000
    if n >= 1000:
        words += under_thousand(n // 1000) + ["thousand"]
        n %= 1000
    if n or not words:
        words += under_thousand(n)
    return words


class G2P:
    """English text -> CMU phone token list.

    Output contract matches ``g2p_en.G2p`` as consumed by the reference
    CMUPhonemizer (voice100/text.py:69-71): per-word phone tokens with a
    ``' '`` token between words, punctuation preserved as tokens.
    """

    def __init__(self, lexicon_path: Optional[str] = None) -> None:
        self._lexicon = dict(_LEXICON)
        env_path = lexicon_path or os.environ.get("VOICE100_TPU_CMUDICT")
        if env_path and os.path.exists(env_path):
            self._load_cmudict(env_path)
        self._g2p_en = None
        try:  # upgrade to the reference G2P when present
            from g2p_en import G2p  # type: ignore

            self._g2p_en = G2p()
        except Exception:
            pass

    def _load_cmudict(self, path: str) -> None:
        with open(path, encoding="latin-1") as f:
            for line in f:
                if not line or line.startswith(";;;"):
                    continue
                parts = line.split()
                if len(parts) < 2 or "(" in parts[0]:
                    continue
                self._lexicon[parts[0].lower()] = " ".join(parts[1:])

    def __call__(self, text: str) -> List[str]:
        if self._g2p_en is not None:
            return list(self._g2p_en(text))
        tokens = _WORD_RX.findall(text.lower())
        words: List[str] = []
        for tok in tokens:
            if tok.isdigit():
                words.extend(_number_to_words(tok))
            else:
                words.append(tok)
        out: List[str] = []
        for i, word in enumerate(words):
            if i > 0:
                out.append(" ")
            if word[0].isalpha() or word[0] == "'":
                out.extend(self._word_phones(word))
            else:
                out.append(word)
        return out

    def _word_phones(self, word: str) -> List[str]:
        if word in self._lexicon:
            return self._lexicon[word].split()
        # strip simple suffixes and retry the lexicon
        for suffix, extra in (("'s", ["Z"]), ("s", ["Z"]), ("ing", ["IH0", "NG"]),
                              ("ed", ["D"]), ("ly", ["L", "IY0"])):
            if word.endswith(suffix) and word[: -len(suffix)] in self._lexicon:
                return self._lexicon[word[: -len(suffix)]].split() + extra
        return self._lts(word)

    def _lts(self, word: str) -> List[str]:
        phones: List[str] = []
        i, n = 0, len(word)
        while i < n:
            # magic-e: vowel + single consonant + final e
            ch = word[i]
            if (
                ch in _LONG_VOWEL
                and i + 2 < n
                and word[i + 1] not in _VOWELS
                and word[i + 2] == "e"
                and i + 3 == n
            ):
                phones.extend(_LONG_VOWEL[ch].split())
                i += 1
                continue
            matched = False
            for g, cond, ph in _LTS_RULES:
                if not word.startswith(g, i):
                    continue
                j = i + len(g)
                if cond == "^" and i != 0:
                    continue
                if cond == "$" and j != n:
                    continue
                if cond == "V" and (j >= n or word[j] not in _VOWELS):
                    continue
                if cond == "C" and j < n and word[j] in _VOWELS:
                    continue
                if cond == "eI" and (j >= n or word[j] not in "eiy"):
                    continue
                if ph:
                    phones.extend(ph.split())
                i = j
                matched = True
                break
            if not matched:
                i += 1
        return self._apply_stress(phones)

    @staticmethod
    def _apply_stress(phones: List[str]) -> List[str]:
        """Primary stress on the first vowel, no stress elsewhere."""
        out: List[str] = []
        stressed = False
        for p in phones:
            if p in _STRESSABLE:
                out.append(p + ("1" if not stressed else "0"))
                stressed = True
            elif p and p[-1] in "012":
                if not stressed and p[-1] == "1":
                    stressed = True
                out.append(p)
            else:
                out.append(p)
        return out
