"""UD8 Memory Guard (guard.py): gating, extraction, override comments,
judge parsing, and the end-to-end hook against a real indexed engine."""

from __future__ import annotations

import json

import pytest

from claude_code_memory_spark.guard import (
    MemoryGuard,
    build_prompt,
    extract_entities,
    fake_judge_transport,
    new_code_of,
    override_comment,
    parse_judge_response,
    should_process,
)


def test_extract_entities_python_and_js():
    py = "class Foo:\n    def bar(self):\n        pass\ndef baz():\n    pass\n"
    assert extract_entities(py, "a.py") == ["bar", "baz", "Foo"]
    js = "function render() {}\nclass Widget {}\n"
    assert extract_entities(js, "a.tsx") == ["render", "Widget"]
    # dedup + order preserved
    assert extract_entities("def a():\n    pass\ndef a():\n    pass\n") == ["a"]


def test_override_comment_variants():
    assert override_comment("# @allow-duplicate: intentional twin")[1] == "intentional twin"
    assert override_comment("// MEMORY_GUARD_ALLOW")[0] is True
    assert override_comment("/* @allow-duplicate: ok */")[0] is True
    assert override_comment("def f(): pass")[0] is False


def test_should_process_gates(tmp_path):
    root = str(tmp_path)
    inside = str(tmp_path / "x.py")
    base = {"hook_event_name": "PreToolUse", "tool_name": "Write",
            "tool_input": {"file_path": inside, "content": ""}}
    assert should_process(base, root)[0] is True
    assert should_process({**base, "tool_name": "Bash"}, root)[0] is False
    assert should_process(
        {**base, "tool_input": {"file_path": str(tmp_path / "n.md")}}, root
    )[0] is False
    assert should_process(
        {**base, "tool_input": {"file_path": "/elsewhere/x.py"}}, root
    )[0] is False
    assert should_process(base, None)[0] is False


def test_parse_judge_response_forms():
    ok = json.dumps({"hasIssues": False, "reason": "fine"})
    assert parse_judge_response(ok) == (False, "fine", {"hasIssues": False, "reason": "fine"})
    blocked = json.dumps({"hasIssues": True, "issueType": "duplication",
                          "reason": "dup", "suggestion": "reuse"})
    has, reason, _ = parse_judge_response(blocked)
    assert has and "duplication" in reason and "reuse" in reason
    fenced = "analysis:\n```json\n" + blocked + "\n```\ndone"
    assert parse_judge_response(fenced)[0] is True
    # non-JSON fails open
    has, reason, raw = parse_judge_response("I think it's fine")
    assert has is False and raw == {}


class _StubEngine:
    def __init__(self, spark, rows):
        self._spark = spark
        self._rows = rows

    def search(self, query, mode="keyword", k=5):
        schema = "entity_name string, file_path string, line_number int, score double"
        rows = [r for r in self._rows if r[0] == query]
        return self._spark.createDataFrame(rows or [], schema)


def _hook(tmp_path, code):
    return {"hook_event_name": "PreToolUse", "tool_name": "Write",
            "tool_input": {"file_path": str(tmp_path / "mod.py"), "content": code}}


def test_guard_blocks_known_duplicate(spark, tmp_path):
    eng = _StubEngine(spark, [("rrf_fuse", "topk.py", 10, 0.9)])
    g = MemoryGuard(eng, str(tmp_path), transport=fake_judge_transport(("rrf_fuse",)))
    res = g.process_hook(_hook(tmp_path, "def rrf_fuse(a, b):\n    pass\n"))
    assert res["decision"] == "block" and "already exists" in res["reason"]


def test_guard_approves_novel_code_and_trivial_and_override(spark, tmp_path):
    eng = _StubEngine(spark, [])
    g = MemoryGuard(eng, str(tmp_path), transport=fake_judge_transport(("rrf_fuse",)))
    assert g.process_hook(_hook(tmp_path, "def novel_fn():\n    pass\n"))["decision"] == "approve"
    trivial = g.process_hook(_hook(tmp_path, "x = 1\n"))
    assert trivial["decision"] == "approve" and "trivial" in trivial["reason"]
    override = g.process_hook(
        _hook(tmp_path, "# @allow-duplicate: twin\ndef rrf_fuse():\n    pass\n")
    )
    assert override["decision"] == "approve" and "override" in override["reason"]


def test_guard_fails_open_without_transport_and_on_error(spark, tmp_path):
    eng = _StubEngine(spark, [])
    g = MemoryGuard(eng, str(tmp_path), transport=None)
    res = g.process_hook(_hook(tmp_path, "def f():\n    pass\n"))
    assert res["decision"] == "approve" and "no judge" in res["reason"]

    def boom(prompt):
        raise RuntimeError("judge connection error")

    g2 = MemoryGuard(eng, str(tmp_path), transport=boom)
    res2 = g2.process_hook(_hook(tmp_path, "def f():\n    pass\n"))
    assert res2["decision"] == "approve" and "unavailable" in res2["reason"]


@pytest.mark.slow
def test_guard_end_to_end_with_real_engine(spark, tmp_path):
    """Index a tiny project, then try to re-define one of its functions:
    the candidate search must surface the existing entity."""
    from claude_code_memory_spark.api import CodeMemoryEngine

    proj = tmp_path / "proj"
    proj.mkdir()
    (proj / "util.py").write_text("def compute_score(x):\n    return x * 2\n")
    eng = CodeMemoryEngine(spark, str(tmp_path / "store"))
    eng.index(str(proj))

    g = MemoryGuard(eng, str(proj), transport=fake_judge_transport(("compute_score",)))
    res = g.process_hook(
        {"hook_event_name": "PreToolUse", "tool_name": "Edit",
         "tool_input": {"file_path": str(proj / "other.py"),
                        "new_string": "def compute_score(y):\n    return y\n"}}
    )
    assert res["decision"] == "block"
    prompt = build_prompt(["compute_score"], "def compute_score(y): ...",
                          [{"entity_name": "compute_score", "file_path": "util.py",
                            "line_number": 1, "score": 1.0}])
    assert "compute_score" in prompt and "util.py" in prompt


def test_new_code_of_multiedit():
    ti = {"edits": [{"new_string": "def a():\n    pass"}, {"new_string": "def b():\n    pass"}]}
    code = new_code_of("MultiEdit", ti)
    assert extract_entities(code) == ["a", "b"]


def test_search_on_empty_collection_returns_zero_rows(spark, tmp_path):
    """A never-indexed collection searches to 0 hits (stable schema), not
    a crash — the guard CLI depends on this fail-soft path."""
    from claude_code_memory_spark.api import CodeMemoryEngine

    eng = CodeMemoryEngine(spark, str(tmp_path / "empty_store"))
    for mode in ("semantic", "keyword", "hybrid"):
        df = eng.search("anything", mode=mode, k=5)
        assert df.count() == 0
        assert "entity_name" in df.columns and "content" in df.columns


def test_extract_entities_arrow_and_async():
    js = "const render = (props) => {}\nlet go = async x => x\nvar keep = 1\n"
    assert extract_entities(js, "app.tsx") == ["render", "go"]
    py = "async def fetch_data(url):\n    pass\n"
    assert extract_entities(py, "a.py") == ["fetch_data"]
