"""G2P rule-engine quality tests.

The reference delegates to g2p_en (CMUdict + neural OOV model,
voice100/text.py:59-71); this environment has neither, so the
framework's G2P is lexicon + NRL-style letter-to-sound rules
(voice100_tpu/text/lts_rules.py). These tests pin the rule engine's
accuracy against the embedded gold lexicon so rule edits can't
silently regress it, and check the morphological suffix layer's
voicing behavior.
"""

import difflib

from voice100_tpu.text.g2p import G2P, _LEXICON


def _bare_engine() -> G2P:
    g = G2P.__new__(G2P)
    g._lexicon = {}
    g._g2p_en = None
    return g


def _strip(phones):
    return [p.rstrip("012") for p in phones]


def test_lts_accuracy_vs_gold_lexicon():
    """The embedded lexicon holds gold CMUdict pronunciations; the rule
    engine alone must stay above these floors on it (the lexicon skews
    toward irregular words, so this is a hard set)."""
    from voice100_tpu.text.g2p import PROPER_NOUNS

    g = _bare_engine()
    exact = with_stress = stress_only = total = match = denom = 0
    for word, gold in _LEXICON.items():
        if not word.isalpha() or word in PROPER_NOUNS:
            # proper nouns are lexical even for CMUdict; they measure
            # nothing about rule generalization
            continue
        raw = g._lts(word)
        goldraw = gold.split()
        pred = _strip(raw)
        goldp = _strip(goldraw)
        total += 1
        exact += int(pred == goldp)
        with_stress += int(raw == goldraw)
        stress_only += int(pred == goldp and raw != goldraw)
        sm = difflib.SequenceMatcher(a=goldp, b=pred)
        match += sum(b.size for b in sm.get_matching_blocks())
        denom += max(len(goldp), len(pred))
    # the lexicon deliberately collects the most irregular spellings
    # (French loans, silent letters), so the rules' score on it is a
    # hard floor, not typical-word accuracy. Round-5 policy change:
    # probe-band words now enter the lexicon EVEN when no general rule
    # can derive them (CMU's lexical classes, e.g. the unstressed-i
    # reduction coin flip: hospital keeps IH0, festival reduces to
    # AH0), because the lexicon is the blind pipeline's vocabulary —
    # so the rules-only score over it dilutes as deliberately-lexical
    # words accumulate (round-5 bands A-D grew it 1523 -> 1800+ and
    # the French/Italian loan pins land here by design). This floor is
    # a catastrophic-regression gate only; the meaningful
    # generalization numbers are tools/g2p_cv.py (fold-out CV) and the
    # held-out blind set (tests/test_heldout.py, mechanically-ratcheted
    # floors). Measured 0.919 stripped / 0.912 with-stress (phone acc
    # 0.978) at the band-E/G merge (2040 words); 0.899 stripped at the
    # band-M/N/O merge (2249 words, ~70 new deliberately-lexical
    # loans/irregulars) — floors re-based accordingly.
    # 0.8848 at the band-U merge (2291 words) — the floor carries a
    # ~0.01 dilution margin because every probe band adds more
    # deliberately-lexical irregulars to the denominator
    assert exact / total > 0.875, f"word-exact {exact}/{total}"
    assert match / denom > 0.960, f"phone accuracy {match / denom:.3f}"
    assert with_stress / total > 0.865, (
        f"with-stress exact {with_stress}/{total}"
    )
    # stress-only error mass (stripped-correct but mis-stressed)
    assert stress_only <= 25, f"stress-only misses {stress_only}"


def test_lts_emits_secondary_stress():
    """The *2 phones are first-class model vocabulary (reference
    voice100/text.py:19-31); the rules engine must produce them
    (round-2 verdict item 4: rules-prepared phone corpora previously
    never contained a third of the stressed-vowel inventory)."""
    g = _bare_engine()
    cases = {
        "information": "IH2",   # full first vowel 2 before the primary
        "understand": "AH2",
        "guarantee": "EH2",
        "secretary": "EH2",     # -ary suffix vowel
        "dialogue": "AO2",      # retained full vowel, closed final
        "monday": "EY2",        # word-final spelled -ay
    }
    for word, want in cases.items():
        phones = g._lts(word)
        assert want in phones, (word, phones)
    # and a gold-set-wide emission count: dozens of words carry *2
    n_with_2 = sum(
        1 for w in _LEXICON if w.isalpha()
        and any(p.endswith("2") for p in g._lts(w))
    )
    assert n_with_2 >= 40, n_with_2


def test_lts_regular_words():
    g = _bare_engine()
    cases = {
        "station": "S T EY SH AH N",
        "baked": "B EY K T",
        "worked": "W ER K T",
        "trees": "T R IY Z",
        "printer": "P R IH N T ER",
        "lighting": "L AY T IH NG",
        "thing": "TH IH NG",
        "check": "CH EH K",
        "phone": "F OW N",
        "knight": "N AY T",
        # silent-cluster rules
        "whistle": "W IH S AH L",
        "fasten": "F AE S AH N",
        "batch": "B AE CH",
        # ea -> EH contexts
        "stealth": "S T EH L TH",
        "feather": "F EH DH ER",
        # ow -> AW contexts (bowl keeps OW)
        "crowd": "K R AW D",
        "howl": "HH AW L",
        "bowl": "B OW L",
        # Greek ch -> K
        "chrome": "K R OW M",
        "chemist": "K EH M IH S T",
        # -ive/-ide magic-e split
        "festive": "F EH S T IH V",
        "survive": "S ER V AY V",
        "decide": "D IH S AY D",
        # l/n + ion -> Y (lion keeps its vowel)
        "billion": "B IH L Y AH N",
        "dominion": "D AA M IH N Y AH N",
    }
    for word, want in cases.items():
        assert _strip(g._lts(word)) == want.split(), (
            word, g._lts(word))


def test_unstressed_vowel_reduction():
    """The schwa pass: reducible unstressed vowels adjacent to primary
    stress reduce; word-final vowels keep quality except spelled 'a'."""
    g = _bare_engine()
    assert g._lts("kitchen") == ["K", "IH1", "CH", "AH0", "N"]
    # final spelled 'a' is schwa even though final vowels are protected
    assert g._lts("vanilla")[-1] == "AH0"
    # final 'y'/'o' vowels keep their quality
    assert g._lts("heavy")[-1] == "IY0"
    assert g._lts("window")[-1] == "OW0"


def test_suffix_voicing():
    g = G2P()
    # /s/ after voiceless, /z/ after voiced, /IH0 Z/ after sibilant
    assert g._word_phones("books")[-1] == "S"
    assert g._word_phones("dogs")[-1] == "Z"
    assert g._word_phones("places")[-2:] == ["IH0", "Z"]
    # /t/ after voiceless, /d/ after voiced, /IH0 D/ after t,d
    assert g._word_phones("helped")[-1] == "T"
    assert g._word_phones("played")[-1] == "D"


def test_external_lexicon_hook(tmp_path):
    path = tmp_path / "cmudict.txt"
    path.write_text(
        ";;; comment\nZORBLATT  Z AO1 R B L AE0 T\n"
        "ZORBLATT(1)  Z ER0 B L AE1 T\n"
    )
    g = G2P(lexicon_path=str(path))
    assert g._word_phones("zorblatt") == ["Z", "AO1", "R", "B", "L",
                                          "AE0", "T"]


def test_stress_always_assigned():
    g = _bare_engine()
    for word in ["hypothetical", "zyzzyva", "qwerty", "brunch"]:
        phones = g._lts(word)
        stresses = [p[-1] for p in phones if p[-1].isdigit()]
        assert stresses.count("1") <= 1
        assert all(s in "012" for s in stresses)


def test_suffix_aware_stress():
    """Penult-stressing suffixes (-tion, -ity families) and
    final-stress endings (-eer, -ique) place the primary stress
    correctly."""
    g = _bare_engine()
    cases = {
        "education": "EY1",      # before -tion
        "university": "ER1",     # before -ity (two suffix vowels)
        "electricity": "IH1",
        "photographic": "AE1",   # before -ic
        "engineer": "IH1",       # final (CMU: ... N IH1 R)
        "unique": "IY1",
    }
    for word, want in cases.items():
        phones = g._lts(word)
        primaries = [p for p in phones if p.endswith("1")]
        assert primaries == [want], (word, phones)


def test_number_normalization_g2pen_conventions():
    """The fallback path mirrors g2p_en's normalize_numbers (the
    reference inherits these exactly, voice100/text.py:64-71): year
    style for 1000-3000, decimal "point", currency expansion, ordinal
    suffixes, thousand-separator stripping."""
    g = G2P()

    def first_words(text, n):
        toks = g(text)
        # split on the inter-word ' ' tokens
        words, cur = [], []
        for t in toks:
            if t == " ":
                words.append(cur); cur = []
            else:
                cur.append(t)
        words.append(cur)
        return words[:n]

    # 1984 -> nineteen eighty four (not one thousand ...)
    assert first_words("1984", 2)[0] == "N AY1 N T IY1 N".split()
    # 1902 -> nineteen oh two
    assert first_words("1902", 2)[1] == ["OW1"]
    # 2007 -> two thousand seven
    assert [w[0] for w in first_words("2007", 3)] == ["T", "TH", "S"]
    # $2.50 -> two dollars, fifty cents
    flat = [t for t in g("$2.50") if t != " "]
    assert flat[2:7] == "D AA1 L ER0 Z".split()
    # 3.14 -> three point fourteen
    flat = [t for t in g("3.14") if t != " "]
    assert flat[3:7] == "P OY1 N T".split()
    # ordinals
    assert g("1st")[0] == "F"
    assert g("40th") == "F AO1 R T IY0 AH0 TH".split()
    # comma-separated thousands
    assert g("1,000")[0] == "W"


def test_common_word_probe():
    """Out-of-gold common-word probe (typical-word accuracy, vs the
    irregular gold floor): composed blind, then the error classes were
    fixed (compound splitting, final -ant reduction, espec-/loan pins,
    the 1-letter-stem stripper guard).
    All 184 must stay exact end-to-end through G2P().__call__."""
    g = G2P()
    cases = [
        ("morning", "M AO1 R N IH0 NG"), ("evening", "IY1 V N IH0 NG"),
        ("understand", "AH2 N D ER0 S T AE1 N D"),
        ("remember", "R IH0 M EH1 M B ER0"),
        ("important", "IH0 M P AO1 R T AH0 N T"),
        ("different", "D IH1 F ER0 AH0 N T"),
        ("together", "T AH0 G EH1 DH ER0"),
        ("children", "CH IH1 L D R AH0 N"),
        ("building", "B IH1 L D IH0 NG"),
        ("history", "HH IH1 S T ER0 IY0"),
        ("window", "W IH1 N D OW0"), ("yellow", "Y EH1 L OW0"),
        ("breakfast", "B R EH1 K F AH0 S T"),
        ("chicken", "CH IH1 K AH0 N"), ("kitchen", "K IH1 CH AH0 N"),
        ("hospital", "HH AA1 S P IH0 T AH0 L"),
        ("newspaper", "N UW1 Z P EY2 P ER0"),
        ("sentence", "S EH1 N T AH0 N S"),
        ("question", "K W EH1 S CH AH0 N"),
        ("mountain", "M AW1 N T AH0 N"), ("trouble", "T R AH1 B AH0 L"),
        ("chocolate", "CH AO1 K L AH0 T"),
        ("vegetable", "V EH1 JH T AH0 B AH0 L"),
        ("comfortable", "K AH1 M F ER0 T AH0 B AH0 L"),
        ("temperature", "T EH1 M P R AH0 CH ER0"),
        ("interesting", "IH1 N T R AH0 S T IH0 NG"),
        ("necessary", "N EH1 S AH0 S EH2 R IY0"),
        ("dangerous", "D EY1 N JH ER0 AH0 S"),
        ("hungry", "HH AH1 NG G R IY0"), ("thirsty", "TH ER1 S T IY0"),
        ("strawberry", "S T R AO1 B EH2 R IY0"),
        ("umbrella", "AH0 M B R EH1 L AH0"),
        ("tomorrow", "T AH0 M AA1 R OW2"),
        ("yesterday", "Y EH1 S T ER0 D EY2"),
        ("decision", "D IH0 S IH1 ZH AH0 N"),
        ("development", "D IH0 V EH1 L AH0 P M AH0 N T"),
        ("government", "G AH1 V ER0 M AH0 N T"),
        ("information", "IH2 N F ER0 M EY1 SH AH0 N"),
        ("conversation", "K AA2 N V ER0 S EY1 SH AH0 N"),
        ("celebration", "S EH2 L AH0 B R EY1 SH AH0 N"),
        ("university", "Y UW2 N AH0 V ER1 S AH0 T IY0"),
        ("community", "K AH0 M Y UW1 N AH0 T IY0"),
        ("suddenly", "S AH1 D AH0 N L IY0"),
        ("probably", "P R AA1 B AH0 B L IY0"),
        ("actually", "AE1 K CH UW0 AH0 L IY0"),
        ("especially", "AH0 S P EH1 SH AH0 L IY0"),
        ("beautiful", "B Y UW1 T AH0 F AH0 L"),
        ("wonderful", "W AH1 N D ER0 F AH0 L"),
        ("exciting", "IH0 K S AY1 T IH0 NG"),
        ("expensive", "IH0 K S P EH1 N S IH0 V"),
        ("delicious", "D IH0 L IH1 SH AH0 S"),
        ("favorite", "F EY1 V ER0 IH0 T"),
        ("library", "L AY1 B R EH2 R IY0"),
        ("dictionary", "D IH1 K SH AH0 N EH2 R IY0"),
        ("elephant", "EH1 L AH0 F AH0 N T"),
        ("banana", "B AH0 N AE1 N AH0"), ("potato", "P AH0 T EY1 T OW2"),
        # round-3 sixteenth probe band (household/nature nouns; found
        # the 1-letter-stem stripper bug: west read as we+est, bed as
        # be+d)
        ("west", "W EH1 S T"), ("bed", "B EH1 D"),
        ("season", "S IY1 Z AH0 N"), ("corner", "K AO1 R N ER0"),
        ("forest", "F AO1 R AH0 S T"), ("garden", "G AA1 R D AH0 N"),
        ("cattle", "K AE1 T AH0 L"), ("insect", "IH1 N S EH2 K T"),
        ("orange", "AO1 R AH0 N JH"), ("lemon", "L EH1 M AH0 N"),
        ("sugar", "SH UH1 G ER0"), ("coffee", "K AA1 F IY0"),
        ("juice", "JH UW1 S"), ("beer", "B IH1 R"),
        ("bottle", "B AA1 T AH0 L"), ("napkin", "N AE1 P K IH0 N"),
        ("bathroom", "B AE1 TH R UW2 M"),
        ("ceiling", "S IY1 L IH0 NG"), ("curtain", "K ER1 T AH0 N"),
        ("carpet", "K AA1 R P AH0 T"), ("blanket", "B L AE1 NG K AH0 T"),
        ("pillow", "P IH1 L OW0"), ("towel", "T AW1 AH0 L"),
        ("razor", "R EY1 Z ER0"), ("mirror", "M IH1 R ER0"),
        ("closet", "K L AA1 Z AH0 T"), ("mountain", "M AW1 N T AH0 N"),
        # round-3 eighteenth probe band (body/clothing/weather/emotion)
        ("shoulder", "SH OW1 L D ER0"), ("stomach", "S T AH1 M AH0 K"),
        ("eyebrow", "AY1 B R AW2"), ("mustache", "M AH1 S T AE2 SH"),
        ("sweater", "S W EH1 T ER0"), ("trousers", "T R AW1 Z ER0 Z"),
        ("lightning", "L AY1 T N IH0 NG"), ("windy", "W IH1 N D IY0"),
        ("jealous", "JH EH1 L AH0 S"), ("ashamed", "AH0 SH EY1 M D"),
        ("embarrassed", "IH0 M B EH1 R AH0 S T"),
        ("disappointed", "D IH2 S AH0 P OY1 N T IH0 D"),
        ("miserable", "M IH1 Z ER0 AH0 B AH0 L"),
        ("grateful", "G R EY1 T F AH0 L"), ("polite", "P AH0 L AY1 T"),
        ("timid", "T IH1 M AH0 D"), ("stubborn", "S T AH1 B ER0 N"),
        ("arrogant", "EH1 R AH0 G AH0 N T"),
        # round-3 nineteenth probe band (countries/places/nationalities)
        ("america", "AH0 M EH1 R AH0 K AH0"),
        ("japanese", "JH AE2 P AH0 N IY1 Z"),
        ("chinese", "CH AY0 N IY1 Z"),
        ("european", "Y UH2 R AH0 P IY1 AH0 N"),
        ("english", "IH1 NG G L IH0 SH"),
        ("germany", "JH ER1 M AH0 N IY0"),
        ("italian", "IH0 T EY1 L Y AH0 N"),
        ("russian", "R AH1 SH AH0 N"),
        ("canada", "K AE1 N AH0 D AH0"),
        ("mexico", "M EH1 K S AH0 K OW2"),
        ("brazil", "B R AH0 Z IH1 L"), ("korea", "K ER0 IY1 AH0"),
        ("tokyo", "T OW1 K IY0 OW2"), ("asia", "EY1 ZH AH0"),
        ("pacific", "P AH0 S IH1 F IH0 K"),
        ("antarctica", "AE0 N T AA1 R K T IH0 K AH0"),
        # round-3 twentieth probe band (communication/cooking)
        # de- prefix reduces to IH0 (CMUdict convention) — band O
        ("description", "D IH0 S K R IH1 P SH AH0 N"),
        ("explanation", "EH2 K S P L AH0 N EY1 SH AH0 N"),
        ("suggestion", "S AH0 G JH EH1 S CH AH0 N"),
        ("invitation", "IH2 N V IH0 T EY1 SH AH0 N"),
        ("introduce", "IH2 N T R AH0 D UW1 S"),
        ("introduction", "IH2 N T R AH0 D AH1 K SH AH0 N"),
        ("pronounce", "P R AH0 N AW1 N S"),
        ("pronunciation", "P R OW0 N AH2 N S IY0 EY1 SH AH0 N"),
        ("repetition", "R IH2 P AH0 T IH1 SH AH0 N"),
        ("translate", "T R AE0 N S L EY1 T"),
        ("translation", "T R AE0 N S L EY1 SH AH0 N"),
        ("announce", "AH0 N AW1 N S"),
        ("squeeze", "S K W IY1 Z"),
        ("microwave", "M AY1 K R OW0 W EY2 V"),
        ("recipe", "R EH1 S AH0 P IY0"),
        ("ingredient", "IH0 N G R IY1 D IY0 AH0 N T"),
        ("vinegar", "V IH1 N AH0 G ER0"),
        ("flavor", "F L EY1 V ER0"),
        ("favorite", "F EY1 V ER0 IH0 T"),
        ("dessert", "D IH0 Z ER1 T"), ("supper", "S AH1 P ER0"),
        # round-3 twenty-first probe band (adverbs/connectives; found
        # the general+ly double-L bug in the suffix layer)
        ("although", "AO0 L DH OW1"), ("thorough", "TH ER1 OW0"),
        ("throughout", "TH R UW0 AW1 T"),
        ("nevertheless", "N EH2 V ER0 DH AH0 L EH1 S"),
        ("nonetheless", "N AH2 N DH AH0 L EH1 S"),
        ("otherwise", "AH1 DH ER0 W AY2 Z"),
        ("therefore", "DH EH1 R F AO2 R"),
        ("unless", "AH0 N L EH1 S"), ("until", "AH0 N T IH1 L"),
        ("whereas", "W EH0 R AE1 Z"), ("whilst", "W AY1 L S T"),
        ("definitely", "D EH1 F AH0 N AH0 T L IY0"),
        ("obviously", "AA1 B V IY0 AH0 S L IY0"),
        ("fortunately", "F AO1 R CH AH0 N AH0 T L IY0"),
        ("unfortunately", "AH0 N F AO1 R CH AH0 N AH0 T L IY0"),
        ("immediately", "IH0 M IY1 D IY0 AH0 T L IY0"),
        ("eventually", "IH0 V EH1 N CH UW0 AH0 L IY0"),
        ("occasionally", "AH0 K EY1 ZH AH0 N AH0 L IY0"),
        ("nearly", "N IH1 R L IY0"),
        ("entirely", "IH0 N T AY1 ER0 L IY0"),
        ("absolutely", "AE1 B S AH0 L UW0 T L IY0"),
        ("particularly", "P ER0 T IH1 K Y AH0 L ER0 L IY0"),
        ("generally", "JH EH1 N ER0 AH0 L IY0"),
        ("sufficient", "S AH0 F IH1 SH AH0 N T"),
        ("fortune", "F AO1 R CH AH0 N"),
        # round-3 twenty-second probe band (sports/music/arts; found
        # the silent-interior-e gap: baseball/baseline/escape)
        ("soccer", "S AA1 K ER0"), ("baseball", "B EY1 S B AO2 L"),
        ("basketball", "B AE1 S K AH0 T B AO2 L"),
        ("athlete", "AE1 TH L IY0 T"),
        ("tournament", "T AO1 R N AH0 M AH0 N T"),
        ("referee", "R IH2 F ER0 IY1"),
        ("violin", "V AY2 AH0 L IH1 N"), ("piano", "P IY0 AE1 N OW0"),
        ("orchestra", "AO1 R K AH0 S T R AH0"),
        ("concert", "K AA1 N S ER0 T"),
        ("composer", "K AH0 M P OW1 Z ER0"),
        ("audience", "AO1 D IY0 EH0 N S"),
        ("rehearsal", "R IH0 HH ER1 S AH0 L"),
        ("sculpture", "S K AH1 L P CH ER0"),
        ("gallery", "G AE1 L ER0 IY0"),
        ("landscape", "L AE1 N D S K EY2 P"),
        ("palette", "P AE1 L AH0 T"), ("trophy", "T R OW1 F IY0"),
        ("novel", "N AA1 V AH0 L"), ("escape", "IH0 S K EY1 P"),
        ("poetry", "P OW1 AH0 T R IY0"),
    ]
    misses = [(w, " ".join(g(w)), want) for w, want in cases
              if " ".join(g(w)) != want]
    assert not misses, misses


def test_compound_splitting():
    """Noun compounds resolve by splitting into lexicon words with the
    second element demoted to secondary stress (subordinating prefixes
    demote the first); lexicalized exceptions are pinned."""
    g = G2P()
    cases = [
        ("toothbrush", "T UW1 TH B R AH2 SH"),
        ("basketball", "B AE1 S K AH0 T B AO2 L"),
        ("waterfall", "W AO1 T ER0 F AO2 L"),
        ("fireplace", "F AY1 ER0 P L EY2 S"),
        ("everything", "EH1 V R IY0 TH IH2 NG"),
        ("password", "P AE1 S W ER2 D"),
        ("newspapers", "N UW1 Z P EY2 P ER0 Z"),
        ("homework", "HH OW1 M W ER2 K"),
        ("classmate", "K L AE1 S M EY2 T"),
        ("playground", "P L EY1 G R AW2 N D"),
        ("sidewalk", "S AY1 D W AO2 K"),
        ("moonlight", "M UW1 N L AY2 T"),
        ("nightmare", "N AY1 T M EH2 R"),
        ("lighthouse", "L AY1 T HH AW2 S"),
        ("grandmother", "G R AE1 N D M AH2 DH ER0"),
        ("friendship", "F R EH1 N D SH IH2 P"),
        ("wholesome", "HH OW1 L S AH0 M"),
        ("overcome", "OW2 V ER0 K AH1 M"),
        ("snowstorm", "S N OW1 S T AO2 R M"),
        ("workshop", "W ER1 K SH AA2 P"),
        # must NOT split (suffix, lexicalized, or short first element)
        ("handsome", "HH AE1 N S AH0 M"),
        ("carpet", "K AA1 R P AH0 T"),
        ("comfortable", "K AH1 M F ER0 T AH0 B AH0 L"),
    ]
    misses = [(w, " ".join(g(w)), want) for w, want in cases
              if " ".join(g(w)) != want]
    assert not misses, misses


def test_normalize_numbers_malformed_currency():
    """Stray separators after a currency sign must not crash
    (regression: "$,0" raised ValueError in _expand_dollars)."""
    g = G2P()
    for s in ("$,0", "$..5", "$", "$.", "a $,6 b", "$9999999999999.999"):
        g(s)  # must not raise
    assert g("$2.50") == g("2 dollars, 50 cents")


def test_frontend_fuzz_no_crash():
    """Seeded fuzz over mixed scripts/punctuation/currency: the G2P
    front-end must never raise on arbitrary text."""
    import random
    import string

    random.seed(1234)
    g = G2P()
    pools = [string.ascii_letters, string.digits, string.punctuation,
             "あい日本カナ", " \t\n", "'''", "$£.,-", "éüßő", "\U0001F600　０"]
    for _ in range(500):
        n = random.randint(0, 30)
        s = "".join(random.choice(random.choice(pools)) for _ in range(n))
        g(s)  # must not raise


def test_no_duplicate_lexicon_keys():
    """Last-wins duplicate keys in the _LEXICON/_COMPOUND_PARTS dict
    literals silently shadow earlier gold entries (regression: 23
    probe-block entries once shadowed older ones); enforce uniqueness
    at the source level."""
    import ast
    import collections
    import voice100_tpu.text.g2p as g2p_module

    tree = ast.parse(open(g2p_module.__file__).read())
    for node in ast.walk(tree):
        target = None
        if isinstance(node, ast.Assign) and node.targets:
            target = getattr(node.targets[0], "id", None)
        elif isinstance(node, ast.AnnAssign):
            target = getattr(node.target, "id", None)
        if target in ("_LEXICON", "_COMPOUND_PARTS") and isinstance(
            node.value, ast.Dict
        ):
            keys = []
            for k in node.value.keys:
                try:
                    keys.append(ast.literal_eval(k))
                except ValueError:
                    pass
            dup = [k for k, c in collections.Counter(keys).items() if c > 1]
            assert not dup, (target, dup)
