"""README's resolver-fidelity figures must equal the figures derived
from the fidelity corpora — no hand-copied numbers (verdict r9 item 5:
the README drifted to 37/38 while the test floor was 38/38).
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))


def test_readme_fidelity_block_matches_corpora():
    import gen_fidelity_readme as g

    text = (REPO / "README.md").read_text()
    spliced = g.splice(text, g.render(g.corpus_counts()))
    assert spliced == text, (
        "README fidelity figures drifted from the test corpora; "
        "run python tools/gen_fidelity_readme.py"
    )
