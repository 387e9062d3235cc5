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
    # verb-particle cue: no left context marks the verb here
    assert _words(g, "wind up the string")[0] == "W AY1 N D".split()
    assert _words(g, "wind down after work")[0] == "W AY1 N D".split()
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


def test_probe_sentences():
    """Out-of-gold probe round folded in: cue-walk transparency,
    coordination, plural subjects, clause boundaries."""
    g = G2P()
    cases = [
        ("the suspect refused to answer", 1, "S AH1 S P EH2 K T"),
        ("police suspect foul play", 1, "S AH0 S P EH1 K T"),
        ("exports increased last year", 0, "EH1 K S P AO2 R T S"),
        ("the content of the book", 1, "K AA1 N T EH0 N T"),
        ("she was content with it", 2, "K AH0 N T EH1 N T"),
        ("he wound the clock", 1, "W AW1 N D"),
        ("the wound healed slowly", 1, "W UW1 N D"),
        ("do not subject them to this", 2, "S AH0 B JH EH1 K T"),
        ("the subject of the essay", 1, "S AH1 B JH IH0 K T"),
        ("this permit expires soon", 1, "P ER1 M IH0 T"),
        ("we permit smoking", 1, "P ER0 M IH1 T"),
        ("they export rice and import oil", 1, "IH0 K S P AO1 R T"),
        ("they export rice and import oil", 4, "IH0 M P AO1 R T"),
        ("a graduate student", 1, "G R AE1 JH AH0 W AH0 T"),
        ("students graduate in june", 1, "G R AE1 JH AH0 W EY2 T"),
        ("he read the letter yesterday", 1, "R IY1 D"),
        ("the book was read twice", 3, "R EH1 D"),
        ("i have never read it", 3, "R EH1 D"),
        ("a bow and arrow", 1, "B OW1"),
        ("the associate director", 1, "AH0 S OW1 S IY0 AH0 T"),
        ("we associate it with rain", 1, "AH0 S OW1 S IY0 EY2 T"),
        ("his conduct was poor", 1, "K AA1 N D AH0 K T"),
        ("they conduct experiments", 1, "K AH0 N D AH1 K T"),
        ("what is your address", 3, "AE1 D R EH2 S"),
        ("address the crowd", 0, "AH0 D R EH1 S"),
        ("a moderate increase in prices", 2, "IH1 N K R IY2 S"),
        ("prices increase every year", 1, "IH0 N K R IY1 S"),
        ("a record number of people", 1, "R EH1 K ER0 D"),
        ("it will upset him", 2, "AH0 P S EH1 T"),
        ("a house in the desert", 4, "D EH1 Z ER0 T"),
        ("do not desert me", 2, "D IH0 Z ER1 T"),
        ("an invalid argument", 1, "IH0 N V AE1 L AH0 D"),
        ("the refuse was collected", 1, "R EH1 F Y UW2 S"),
        ("i refuse to go", 1, "R IH0 F Y UW1 Z"),
        ("the sports record was broken", 2, "R EH1 K ER0 D"),
        ("they never record anything", 2, "R IH0 K AO1 R D"),
        ("sales increase when prices decrease", 1, "IH0 N K R IY1 S"),
        ("he bought rice and produce", 4, "P R OW1 D UW0 S"),
        ("imports and exports", 2, "EH1 K S P AO2 R T S"),
    ]
    misses = []
    for text, i, want in cases:
        got = " ".join(_words(g, text)[i])
        if got != want:
            misses.append((text, got, want))
    assert not misses, misses


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
