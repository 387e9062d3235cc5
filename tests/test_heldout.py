"""Held-out blind accuracy (tests/heldout_sets.py) — the persistent
measurement round-3 verdict item 6 asked for.

The floors here are CATASTROPHIC-REGRESSION bounds only, pinned well
below the blind measurement at composition time (2026-08-19: EN 0.665
stripped word-exact full-pipeline, 16/200 words in the lexicon; JA
0.577 sentence-exact, 0.947 char accuracy). The measured values are
published in docs/text_frontend.md by tools/gen_frontend_stats.py.
Per the discipline note in heldout_sets.py, NEVER fix a failure from
this set by pinning the failing item — these numbers may only move as
a side effect of fixes motivated by other data.
"""

import difflib

import heldout_sets as hs

from voice100_tpu.text.g2p import G2P
from voice100_tpu.text.japanese.kana import hira2kata
from voice100_tpu.text.japanese.yomi import LexiconReader


def _strip(phones):
    return [p.rstrip("012") for p in phones]


def test_heldout_en_blind_floor():
    g = G2P()
    g._g2p_en = None
    total = exact = 0
    for _reg, word, gold in hs.en_items():
        got = [p for p in g(word) if p.strip()]
        total += 1
        exact += int(_strip(got) == _strip(gold.split()))
    assert total >= 200
    assert exact / total >= 0.5, f"blind EN word-exact {exact}/{total}"


def test_heldout_ja_blind_floor():
    reader = LexiconReader()
    total = exact = hit = denom = 0
    for _reg, text, gold in hs.ja_items():
        got = hira2kata(
            "".join(y or w for w, y in reader.tokens(text)))
        total += 1
        exact += int(got == gold)
        sm = difflib.SequenceMatcher(a=gold, b=got)
        hit += sum(b.size for b in sm.get_matching_blocks())
        denom += max(len(gold), len(got))
    assert total >= 50
    assert exact / total >= 0.4, f"blind JA sentence-exact {exact}/{total}"
    assert hit / denom >= 0.9, f"blind JA char accuracy {hit / denom:.3f}"


def test_heldout_never_folded_into_gold():
    """The discipline check: no held-out EN word may appear in the
    gold lexicon beyond the count frozen at composition time (16/200
    happened to be covered already), and no held-out JA sentence may
    appear in the pinned gold set."""
    import test_japanese_gold as tg

    from voice100_tpu.text.g2p import _LEXICON

    in_lex = sum(1 for _r, w, _p in hs.en_items() if w in _LEXICON)
    assert in_lex <= 16, (
        f"{in_lex} held-out words now in the gold lexicon — held-out "
        "items must never be folded in (heldout_sets.py discipline)"
    )
    gold_texts = {t for t, _ in tg.GOLD_SENTENCES}
    folded = [t for _r, t, _k in hs.ja_items() if t in gold_texts]
    assert not folded, f"held-out JA sentences folded into gold: {folded}"
