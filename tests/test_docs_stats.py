"""Docs quote front-end figures from one generated source of truth.

Round-3 verdict item 8: COMPONENTS.md / README.md /
docs/text_frontend.md each carried a different vintage of the gold-set
sizes and measured accuracies. tools/gen_frontend_stats.py computes
every figure from the tree and rewrites the docs; this test runs its
--check mode so any drift (new lexicon entries, gold sentences, or
accuracy movement without regenerating the docs) fails the suite.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_frontend_figures_in_docs_match_tree():
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "gen_frontend_stats.py"),
         "--check"],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
