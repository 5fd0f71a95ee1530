"""UD7 summarizer plumbing: JSON-contract parsing, schema validation,
retry loop and the Spark struct stage — all against fake transports
(reference chat/summarizer.py:55-404, no network needed to test any of
the logic that matters).
"""

from __future__ import annotations

import json

import pytest

from claude_code_memory_spark.sources.summarizer import (
    Summarizer,
    categorize_text,
    fake_transport,
    parse_response,
    summarize_conversations,
    validate_payload,
)


# --- parse + validate -----------------------------------------------------


def test_parse_valid_json():
    out = parse_response(json.dumps({"summary": "did things", "topics": ["spark"]}))
    assert out["summary"] == "did things"
    assert out["topics"] == ["spark"]
    assert out["key_insights"] == [] and out["debugging_info"] == {}


def test_parse_markdown_fenced_json():
    content = '```json\n{"summary": "fenced"}\n```'
    assert parse_response(content)["summary"] == "fenced"


def test_parse_non_json_falls_back_to_truncated_summary():
    content = "Plain prose answer. " * 100
    out = parse_response(content)
    assert out["summary"] == content[:500]
    assert out["topics"] == []


def test_parse_json_array_is_not_an_object():
    out = parse_response('["a", "b"]')
    assert out["summary"].startswith('["a"')


def test_validate_coerces_wrong_types_and_drops_extras():
    out = validate_payload(
        {"summary": 42, "topics": "notalist", "key_insights": ["ok"], "extra": 1}
    )
    assert out["summary"] == "" and out["topics"] == []
    assert out["key_insights"] == ["ok"]
    assert "extra" not in out


def test_validate_rejects_non_string_list_elements():
    assert validate_payload({"topics": ["ok", 3]})["topics"] == []


# --- categorization -------------------------------------------------------


def test_categorize_matches_taxonomy():
    assert categorize_text("fixed a bug and error traceback", [], []) == "debugging"
    assert categorize_text("", ["refactor", "rename"], []) == "refactoring"
    assert categorize_text("nothing matching here", [], []) == "implementation"


# --- retry loop -----------------------------------------------------------


def test_retry_then_success():
    sleeps: list[float] = []
    calls = {"n": 0}

    def flaky(prompt: str) -> str:
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("HTTP 500")
        return json.dumps({"summary": "eventually worked"})

    s = Summarizer(transport=flaky, max_retries=3, sleep=sleeps.append)
    out = s.summarize("some conversation")
    assert out["summary"] == "eventually worked"
    assert calls["n"] == 3
    assert sleeps == [1.0, 2.0]  # base * 2**attempt


def test_retries_exhausted_degrades_to_error_summary():
    def dead(prompt: str) -> str:
        raise RuntimeError("provider down")

    s = Summarizer(transport=dead, max_retries=2, sleep=lambda _d: None)
    out = s.summarize("text")
    assert out["summary"].startswith("Error summarizing conversation")
    assert out["debugging_info"] == {"error": "provider down"}
    assert out["category"] in {"debugging", "implementation"}
    assert s.calls == 2


def test_prompt_carries_conversation():
    seen = {}

    def capture(prompt: str) -> str:
        seen["prompt"] = prompt
        return json.dumps({"summary": "ok"})

    Summarizer(transport=capture, sleep=lambda _d: None).summarize("UNIQUE_MARKER_42")
    assert "UNIQUE_MARKER_42" in seen["prompt"]
    assert "JSON format" in seen["prompt"]


# --- fake transport round trip -------------------------------------------


def test_fake_transport_is_valid_and_deterministic():
    t = fake_transport()
    s = Summarizer(transport=t, sleep=lambda _d: None)
    out1 = s.summarize("Fix the authentication error in login module")
    out2 = s.summarize("Fix the authentication error in login module")
    assert out1 == out2
    assert out1["summary"].startswith("Fix the authentication")
    assert out1["category"] == "debugging"


# --- Spark stage ----------------------------------------------------------


def test_summarize_conversations_stage(spark):
    df = spark.createDataFrame(
        [
            ("c1", "Fix the error and crash in the parser"),
            ("c2", "Design the architecture schema for storage"),
            ("c3", None),
        ],
        ["chat_id", "full_text"],
    )
    out = summarize_conversations(df, fake_transport).collect()
    by_id = {r["chat_id"]: r["llm_summary"] for r in out}
    assert by_id["c1"]["category"] == "debugging"
    assert by_id["c2"]["category"] == "architecture"
    assert by_id["c3"]["summary"] is None
    assert isinstance(by_id["c1"]["topics"], list)


def test_http_transport_requires_key(monkeypatch):
    import pytest

    from claude_code_memory_spark.sources.summarizer import http_transport

    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    with pytest.raises(RuntimeError, match="API key"):
        http_transport()


def test_http_transport_chat_round_trip(monkeypatch):
    import io
    import json as _json
    import urllib.request

    from claude_code_memory_spark.sources.summarizer import http_transport

    seen = {}

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        seen["url"] = req.full_url
        seen["body"] = _json.loads(req.data.decode())
        return FakeResp(_json.dumps(
            {"choices": [{"message": {"content": '{"summary": "ok"}'}}]}
        ).encode())

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    t = http_transport("gpt-4o-mini", api_key="k")
    assert t("summarize this") == '{"summary": "ok"}'
    assert seen["url"] == "https://api.openai.com/v1/chat/completions"
    assert seen["body"]["messages"] == [{"role": "user", "content": "summarize this"}]
    assert seen["body"]["model"] == "gpt-4o-mini"


def test_http_transport_http_error_message(monkeypatch):
    import urllib.error
    import urllib.request

    import pytest

    from claude_code_memory_spark.sources.summarizer import http_transport

    def raise_503(req, timeout=None):
        raise urllib.error.HTTPError(req.full_url, 503, "unavailable", {}, None)

    monkeypatch.setattr(urllib.request, "urlopen", raise_503)
    t = http_transport(api_key="k")
    with pytest.raises(RuntimeError, match="503"):
        t("x")
