"""Property-based robustness: no parser may raise on ANY input text.

The parsers run inside mapInPandas on executors — an uncaught exception
there kills the Spark task (and after 4 retries, the whole indexing job).
On a 100 TB crawl the input WILL contain garbage, so total-function
behavior is a correctness requirement, not a nicety. (Reference analog:
the syntax-error test, tests/unit/test_parser.py:210 — generalized here
with hypothesis.)

These are pure-function tests (no Spark session) so hypothesis can run
hundreds of examples in seconds.
"""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, example, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from claude_code_memory_spark.sources.config_parsers import (  # noqa: E402
    parse_csv_source,
    parse_ini_source,
    parse_json_source,
    parse_text_source,
    parse_yaml_source,
)
from claude_code_memory_spark.sources.javascript_parser import (  # noqa: E402
    parse_javascript_source,
)
from claude_code_memory_spark.sources.markdown_parser import (  # noqa: E402
    pack_chunks,
    parse_markdown_source,
    parse_sections,
)
from claude_code_memory_spark.sources.python_parser import parse_python_source  # noqa: E402
from claude_code_memory_spark.sources.web_parsers import (  # noqa: E402
    parse_css_source,
    parse_html_source,
)

PARSERS = [
    ("a.py", parse_python_source),
    ("a.js", parse_javascript_source),
    ("a.md", parse_markdown_source),
    ("a.json", parse_json_source),
    ("a.yaml", parse_yaml_source),
    ("a.txt", parse_text_source),
    ("a.csv", parse_csv_source),
    ("a.ini", parse_ini_source),
    ("a.html", parse_html_source),
    ("a.css", parse_css_source),
]

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # any non-surrogate
    max_size=400,
)


@pytest.mark.parametrize("fname,parser", PARSERS, ids=[p[0] for p in PARSERS])
@settings(max_examples=150, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(source=_text)
@example(source="A:A")  # module-level annotated stmt -> a type_binding row
def test_parser_total_on_arbitrary_text(fname, parser, source):
    rows = parser(fname, source)
    assert isinstance(rows, list)
    for r in rows:
        assert isinstance(r, dict)
        # the full record-kind contract split_parsed consumes — the
        # resolver-support kinds (type/return/import bindings) joined the
        # contract in rounds 10-11 and this allowed set had gone stale
        # (hypothesis found it via 'A:A' in round 12)
        assert r.get("record_kind") in (
            "entity",
            "relation",
            "implementation",
            "type_binding",
            "return_bind",
            "import_binding",
        )


@settings(max_examples=100, deadline=None)
@given(source=_text, target=st.integers(50, 400))
def test_markdown_packing_invariants(source, target):
    """Packing never loses sections and respects the max-token bound for
    any section that is itself within bounds."""
    sections = parse_sections(source)
    chunks = pack_chunks(sections, target=target, max_tokens=target + 100,
                         min_tokens=20, overlap_ratio=0.125)
    assert isinstance(chunks, list)
    for c in chunks:
        assert isinstance(c.get("content"), str) and c["content"]
    # packing never drops content: total packed tokens >= section tokens
    # minus split/merge boundary effects is hard to bound exactly, so the
    # invariant checked is headings survive into some chunk
    packed_text = "\n".join(c["content"] for c in chunks)
    for sec in sections:
        if sec.get("heading"):
            assert sec["heading"] in packed_text


# --- type-bind soundness ---------------------------------------------------
# The resolver treats a type-bind as a CERTAINTY (it rewrites the call
# target), so the collector's poisoning must be sound: a var that is
# assigned anything other than exactly one constructor form must never
# be emitted. Generate random scopes and check the invariant directly
# against a straightforward recount of the assignments.

_CTORS = ["Alpha", "Beta", "ns.Gamma"]
_VALUES = ["1", "x + 1", "Alpha()", "Beta()", "ns.Gamma()", "make()", "[1]"]


@st.composite
def _py_function(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    var_names = ["a", "b", "c"]
    stmts = []
    for _ in range(n):
        v = draw(st.sampled_from(var_names))
        kind = draw(st.integers(min_value=0, max_value=3))
        if kind == 0:
            stmts.append(f"    {v} = {draw(st.sampled_from(_VALUES))}")
        elif kind == 1:
            stmts.append(f"    {v} += 1")
        elif kind == 2:
            stmts.append(f"    for {v} in range(3):\n        pass")
        else:
            stmts.append(f"    {v}: {draw(st.sampled_from(_CTORS))}")
    return "def f():\n" + "\n".join(stmts) + "\n"


@settings(max_examples=200, deadline=None)
@given(_py_function())
def test_python_type_binds_only_when_unambiguous(src):
    import re

    recs = parse_python_source("a.py", src)
    binds = {
        r["entity_name"]: r["to_entity"]
        for r in recs
        if r["record_kind"] == "type_binding" and r["from_entity"] == "f"
    }
    for var, ctor in binds.items():
        # recount from the source: every statement mentioning the var as
        # an assignment/annotation/loop target must be the SAME ctor form
        pat = re.compile(
            rf"^\s*(?:{var} = (?P<val>.+)|{var} \+= .+|for {var} in .+|"
            rf"{var}: (?P<ann>[\w.]+))$"
        )
        forms = []
        for line in src.splitlines():
            m = pat.match(line)
            if not m:
                continue
            if m.group("val") is not None:
                forms.append(m.group("val"))
            elif m.group("ann") is not None:
                forms.append(m.group("ann") + "()")
            else:
                forms.append("<poison>")
        assert forms, f"{var} bound but never assigned in source"
        expected = {f.split("(")[0].split(".")[-1] for f in forms if "(" in f}
        assert all("(" in f for f in forms), f"{var}: non-ctor form in {forms}"
        assert expected == {ctor}, f"{var}: {forms} vs bind {ctor}"
