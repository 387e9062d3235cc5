"""Cross-validated G2P generalization scoreboard.

The gold lexicon (text/g2p.py _LEXICON) measures 0.99 word-exact
because the LTS rules were tuned on it; the blind held-out set
(tests/heldout_sets.py) measures the true open-vocabulary accuracy but
may NEVER be studied or tuned against (its discipline note). This
harness provides the legitimate development scoreboard in between
(round-4 verdict item 3): k-fold cross-validation WITHIN the gold
lexicon — each fold's words are removed from the runtime lexicon and
predicted by the full fallback pipeline (suffix strip, compound split,
LTS rules, stress heuristics), exactly the path a blind word takes.
Rule improvements that raise CV accuracy generalize; pins that only
memorize gold words do not (the pinned word scores in its own fold
only if the PIN is a rule, not a lexicon entry).

Usage:
    python -m tools.g2p_cv               # overall + per-fold accuracy
    python -m tools.g2p_cv --errors F    # dump fold errors to F
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FOLDS = 5


def fold_of(word: str) -> int:
    # stable across runs/sessions (unlike hash())
    return int(hashlib.sha1(word.encode()).hexdigest(), 16) % N_FOLDS


def _strip(phones):
    return [p.rstrip("012") for p in phones]


def run(errors_path=None) -> dict:
    from voice100_tpu.text.g2p import G2P, _LEXICON, PROPER_NOUNS

    # proper nouns are lexical even for CMUdict: folding them out
    # only measures that names are not derivable, which is known
    words = sorted(w for w in _LEXICON
                   if w.isalpha() and w not in PROPER_NOUNS)
    per_fold = []
    errors = []
    tot = tot_strip = tot_stress = 0
    for k in range(N_FOLDS):
        fold = [w for w in words if fold_of(w) == k]
        g = G2P()
        g._g2p_en = None
        for w in fold:
            g._lexicon.pop(w, None)
        n = n_strip = n_stress = 0
        for w in fold:
            gold = _LEXICON[w].split()
            got = [p for p in g(w) if p.strip()]
            n += 1
            s_ok = _strip(got) == _strip(gold)
            n_strip += int(s_ok)
            n_stress += int(got == gold)
            if not s_ok:
                errors.append((k, w, " ".join(gold), " ".join(got)))
        per_fold.append((n, n_strip, n_stress))
        tot += n
        tot_strip += n_strip
        tot_stress += n_stress
    out = {
        "words": tot,
        "cv_stripped": round(tot_strip / tot, 4),
        "cv_stress": round(tot_stress / tot, 4),
        "folds": [
            {"n": n, "stripped": round(a / n, 4),
             "stress": round(b / n, 4)}
            for n, a, b in per_fold
        ],
    }
    if errors_path:
        with open(errors_path, "w") as f:
            for k, w, gold, got in errors:
                f.write(f"{k}\t{w}\t{gold}\t{got}\n")
        out["errors_file"] = errors_path
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--errors", default=None)
    args = ap.parse_args()
    import json

    print(json.dumps(run(args.errors), indent=2))


if __name__ == "__main__":
    main()
