"""Regenerate README.md's resolver-fidelity figures from the fidelity
corpora themselves (verdict r9 item 5 / ADVICE r9: the hand-copied
figures drifted — README said 37/38 while the test floor was 38/38).

The figures are DERIVED, never typed: POSITIVES are hard-asserted to
resolve by test_resolve_fidelity*.py, ASPIRATIONAL sites extend the
denominator without a floor, and NEGATIVES extend the ground-truth
total (each is asserted to produce zero false resolutions).

Usage:  python tools/gen_fidelity_readme.py          # rewrite README.md
        python tools/gen_fidelity_readme.py --check  # exit 1 on drift
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BEGIN = "<!-- fidelity:begin"
END = "<!-- fidelity:end -->"


def corpus_counts():
    sys.path.insert(0, str(REPO))
    sys.path.insert(0, str(REPO / "tests"))
    import test_resolve_fidelity as py_mod
    import test_resolve_fidelity_js as js_mod

    def c(mod):
        pos = len(mod.POSITIVES)
        asp = len(mod.ASPIRATIONAL)
        neg = len(mod.NEGATIVES)
        return pos, pos + asp, pos + asp + neg

    py_floor, py_denom, py_total = c(py_mod)
    js_floor, js_denom, js_total = c(js_mod)
    return {
        "py_floor": py_floor,
        "py_denom": py_denom,
        "js_floor": js_floor,
        "js_denom": js_denom,
        "total_sites": py_total + js_total,
    }


def render(counts: dict) -> str:
    return (
        f"    **{counts['py_floor']}/{counts['py_denom']} resolvable Python sites "
        f"and {counts['js_floor']}/{counts['js_denom']} JS/TS sites, 0 false\n"
        f"    resolutions across all {counts['total_sites']} ground-truth sites**"
    )


def splice(text: str, block: str) -> str:
    pat = re.compile(
        r"(" + re.escape(BEGIN) + r"[^\n]*-->\n)(.*?)(\n\s*" + re.escape(END) + r")",
        re.DOTALL,
    )
    m = pat.search(text)
    if not m:
        raise SystemExit("README.md: fidelity markers not found")
    return text[: m.start(2)] + block + text[m.end(2) :]


def main() -> int:
    check = "--check" in sys.argv
    readme = REPO / "README.md"
    old = readme.read_text()
    new = splice(old, render(corpus_counts()))
    if new == old:
        print("README fidelity figures: up to date")
        return 0
    if check:
        print("README fidelity figures DRIFTED from the test corpora; "
              "run python tools/gen_fidelity_readme.py")
        return 1
    readme.write_text(new)
    print("README fidelity figures regenerated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
