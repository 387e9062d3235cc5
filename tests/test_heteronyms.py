"""Heteronym (homograph) disambiguation in the hermetic G2P.

The reference inherits homograph handling from g2p_en's POS-tagged
homograph table (voice100/text.py:64-71); our context-rule equivalent
lives in voice100_tpu/text/heteronyms.py.
"""

from voice100_tpu.text.g2p import G2P
from voice100_tpu.text import heteronyms


def _words(g, text):
    """Split G2P output back into per-word phone lists."""
    out, cur = [], []
    for tok in g(text):
        if tok == " ":
            out.append(cur)
            cur = []
        else:
            cur.append(tok)
    out.append(cur)
    return out


def test_noun_verb_stress_pairs():
    g = G2P()
    sent = _words(g, "they will record a record")
    assert sent[2] == "R IH0 K AO1 R D".split()
    assert sent[4] == "R EH1 K ER0 D".split()
    sent = _words(g, "we present a present")
    assert sent[1] == "P R IY0 Z EH1 N T".split()
    assert sent[3] == "P R EH1 Z AH0 N T".split()
    sent = _words(g, "i object to the object")
    assert sent[1] == "AH0 B JH EH1 K T".split()
    assert sent[4] == "AA1 B JH EH0 K T".split()


def test_vowel_quality_pairs():
    g = G2P()
    assert _words(g, "the wind blows")[1] == "W IH1 N D".split()
    assert _words(g, "to wind the clock")[1] == "W AY1 N D".split()
    assert _words(g, "a live concert")[1] == "L AY1 V".split()
    assert _words(g, "they live here")[1] == "L IH1 V".split()
    assert _words(g, "their lives")[1] == "L AY1 V Z".split()
    assert _words(g, "he lives here")[1] == "L IH1 V Z".split()


def test_read_past_vs_present():
    g = G2P()
    assert _words(g, "i have read the book")[2] == ["R", "EH1", "D"]
    assert _words(g, "it was read aloud")[2] == ["R", "EH1", "D"]
    assert _words(g, "i will read the book")[2] == ["R", "IY1", "D"]
    assert _words(g, "read the book")[0] == ["R", "IY1", "D"]


def test_voicing_pairs():
    g = G2P()
    assert _words(g, "she uses it")[1] == "Y UW1 Z IH0 Z".split()
    assert _words(g, "the uses of it")[1] == "Y UW1 S IH0 Z".split()
    assert _words(g, "it was close to here")[2] == ["K", "L", "OW1", "S"]
    assert _words(g, "please close the door")[1] == ["K", "L", "OW1", "Z"]


def test_ate_noun_verb():
    g = G2P()
    sent = _words(g, "an estimate to estimate")
    assert sent[1] == "EH1 S T AH0 M AH0 T".split()
    assert sent[3] == "EH1 S T AH0 M EY2 T".split()
    assert _words(g, "a separate room")[1] == "S EH1 P ER0 AH0 T".split()
    assert _words(g, "to separate them")[1] == "S EH1 P ER0 EY2 T".split()


def test_isolated_words_keep_lexicon_pronunciation():
    # the default slot must agree with the gold lexicon so that
    # isolated words (and the gold floors) are unchanged
    g = G2P()
    for word in ("use", "read", "live", "house", "desert", "present"):
        assert g(word) == g._lexicon[word].split(), word


def test_inflected_verb_forms_in_lexicon():
    g = G2P()
    assert g._lexicon["recorded"] == "R IH0 K AO1 R D IH0 D"
    assert g._lexicon["using"] == "Y UW1 Z IH0 NG"
    assert g._lexicon["permitted"] == "P ER0 M IH1 T IH0 D"
    assert g._lexicon["transferred"] == "T R AE0 N S F ER1 D"
    assert g._lexicon["separated"] == "S EH1 P ER0 EY2 T IH0 D"
    assert _words(g, "the project was recorded")[3] == \
        "R IH0 K AO1 R D IH0 D".split()


def test_plural_forms_context():
    g = G2P()
    assert _words(g, "he records a song")[1] == "R IH0 K AO1 R D Z".split()
    assert _words(g, "the records show")[1] == "R EH1 K ER0 D Z".split()


def test_table_wellformed():
    # every slot parses as CMU phones with a stress digit on vowels
    vowels = set("AA AE AH AO AW AY EH ER EY IH IY OW OY UH UW".split())
    for word, (noun, verb, adj, default) in heteronyms.TABLE.items():
        assert default in ("N", "V", "ADJ"), word
        for pron in (noun, verb, adj):
            if pron is None:
                continue
            assert any(p.rstrip("012") in vowels and p[-1].isdigit()
                       for p in pron.split()), (word, pron)
