"""K5 HTML report sink (sources/html_report.py): structure, escaping,
summarizer integration, conversation selection."""

from __future__ import annotations

import json

import pytest

from claude_code_memory_spark.sources.html_report import generate_report, render_report


@pytest.fixture()
def chat_file(tmp_path):
    msgs = [
        {"chat_id": "c1", "ts": "2024-01-01T10:00:00Z", "role": "user",
         "content": "there is an error & a <traceback> in my build"},
        {"chat_id": "c1", "ts": "2024-01-01T10:05:00Z", "role": "assistant",
         "content": "let me fix the bug\n```py\nprint(1)\n```"},
        {"chat_id": "c1", "ts": "2024-01-01T12:30:00Z", "role": "user",
         "content": "now implement the feature"},
        {"chat_id": "c2", "ts": "2024-01-01T09:00:00Z", "role": "user",
         "content": "please document the readme"},
    ]
    p = tmp_path / "chat.jsonl"
    p.write_text("".join(json.dumps(m) + "\n" for m in msgs))
    return str(p)


def test_report_structure_and_escaping(spark, chat_file):
    html = generate_report(spark, chat_file, chat_id="c1", session_id=1)
    assert html.startswith("<!DOCTYPE html>")
    # metadata + sections present
    for frag in ["Chat Conversation Report", "Category Scores", "Transcript (2 messages)",
                 "Contains Code", "debugging"]:
        assert frag in html, frag
    # HTML-sensitive characters in content must be escaped
    assert "&lt;traceback&gt;" in html and "&amp;" in html
    assert "<traceback>" not in html
    # category from the keyword stub: debugging keywords dominate
    assert '<span class="tag">debugging</span>' in html


def test_report_picks_largest_conversation_by_default(spark, chat_file):
    html = generate_report(spark, chat_file)
    # c1/session1 has 2 messages — the largest conversation wins
    assert "c1 / 1" in html


def test_report_with_summarizer_transport(spark, chat_file):
    from claude_code_memory_spark.sources.summarizer import fake_transport

    html = generate_report(
        spark, chat_file, chat_id="c1", session_id=1,
        summarizer_transport=fake_transport(),
    )
    assert "Analysis Summary" in html and "Keyword Analysis" not in html


def test_report_unknown_conversation_raises(spark, chat_file):
    with pytest.raises(ValueError):
        generate_report(spark, chat_file, chat_id="nope")


def test_render_report_pure():
    conv = {"chat_id": "x", "session_id": 1, "n_messages": 1, "duration_sec": 0.0,
            "started_at": "2024-01-01", "category": "general", "language": "en",
            "score_debugging": 0}
    html = render_report(conv, [{"role": "user", "ts": "t", "content": "hi"}])
    assert "Transcript (1 messages)" in html and "hi" in html
