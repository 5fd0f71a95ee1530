"""K5: HTML conversation report sink.

Reference parity: ChatHtmlReporter (chat/html_report.py:20-1194) renders
one conversation into a styled standalone HTML page — header metadata
(session id, duration, message/word counts, contains-code, language),
an analysis summary (summary text, category tag, key insights, topics,
code patterns), per-category keyword scores, and the message transcript.

Spark-first split: every number on the page is computed as DataFrame
algebra (`conversations` + `categorize` + the per-category scores, the
same operators the indexing path uses), and only the final render is
driver-side stdlib templating over the ONE conversation being reported —
the same boundary the reference draws (its reporter is fully
driver-side; ours keeps the analytics distributed and collects a single
conversation's rows, which is bounded by that conversation's length).
The LLM summary section uses the UD7 `Summarizer` when a transport is
supplied and degrades to the keyword-scoring stub otherwise, exactly
like `api.index_chat`.
"""

from __future__ import annotations

import html as _html
from datetime import datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from claude_code_memory_spark.sources.chat import (
    CATEGORY_KEYWORDS,
    categorize,
    conversations,
    read_chat_jsonl,
)

_CSS = """
body { font-family: -apple-system, 'Segoe UI', sans-serif; margin: 0;
       background: #f5f6f8; color: #1f2430; }
.container { max-width: 900px; margin: 0 auto; padding: 24px; }
.header { background: #fff; border-radius: 10px; padding: 20px 24px;
          margin-bottom: 16px; box-shadow: 0 1px 3px rgba(0,0,0,.08); }
.header h1 { margin: 0 0 12px; font-size: 22px; }
.metadata { display: grid; grid-template-columns: repeat(3, 1fr); gap: 10px; }
.metadata-label { font-size: 11px; text-transform: uppercase; color: #7a8194; }
.metadata-value { font-size: 14px; font-weight: 600; }
.section { background: #fff; border-radius: 10px; padding: 20px 24px;
           margin-bottom: 16px; box-shadow: 0 1px 3px rgba(0,0,0,.08); }
.section h2 { margin: 0 0 12px; font-size: 17px; }
.tag { display: inline-block; background: #eef1ff; color: #3b4ccc;
       border-radius: 12px; padding: 2px 10px; margin: 2px; font-size: 12px; }
.score-row { display: flex; align-items: center; gap: 8px; margin: 4px 0; }
.score-name { width: 130px; font-size: 13px; }
.score-bar { height: 8px; background: #3b4ccc; border-radius: 4px; }
.msg { border-left: 3px solid #d5d9e4; padding: 8px 12px; margin: 10px 0; }
.msg.user { border-color: #3b4ccc; }
.msg.assistant { border-color: #2a9d6e; }
.msg .role { font-size: 11px; text-transform: uppercase; color: #7a8194; }
.msg pre { white-space: pre-wrap; margin: 6px 0 0; font-size: 13px; }
"""


def _esc(v: object) -> str:
    return _html.escape(str(v if v is not None else ""))


def _metadata_item(label: str, value: object) -> str:
    return (
        '<div class="metadata-item">'
        f'<div class="metadata-label">{_esc(label)}</div>'
        f'<div class="metadata-value">{_esc(value)}</div></div>'
    )


def render_report(conv: dict, messages: list[dict], summary: dict | None = None) -> str:
    """Pure renderer: one conversation row (from `categorize`), its
    messages, and an optional UD7 summary dict → standalone HTML."""
    scores = {c: int(conv.get(f"score_{c}", 0) or 0) for c in sorted(CATEGORY_KEYWORDS)}
    max_score = max(max(scores.values()), 1)
    n_words = sum(len((m.get("content") or "").split()) for m in messages)
    has_code = any("```" in (m.get("content") or "") for m in messages)

    head = '<div class="header"><h1>Chat Conversation Report</h1><div class="metadata">'
    head += _metadata_item("Session", f"{conv['chat_id']} / {conv['session_id']}")
    head += _metadata_item("Started", conv.get("started_at"))
    head += _metadata_item("Duration", f"{conv.get('duration_sec', 0)} s")
    head += _metadata_item("Messages", conv.get("n_messages"))
    head += _metadata_item("Total Words", n_words)
    head += _metadata_item("Contains Code", "Yes" if has_code else "No")
    head += _metadata_item("Language", conv.get("language"))
    head += _metadata_item("Category", conv.get("category"))
    head += "</div></div>"

    if summary:
        body = (
            '<div class="section"><h2>Analysis Summary</h2>'
            f"<p>{_esc(summary.get('summary'))}</p>"
            + (
                f'<div><span class="tag">{_esc(summary.get("category"))}</span></div>'
                if summary.get("category")
                else ""
            )
        )
        for title, key in (
            ("Key Insights", "key_insights"),
            ("Topics Discussed", "topics"),
            ("Code Patterns", "code_patterns"),
        ):
            items = summary.get(key) or []
            if items:
                tags = "".join(f'<span class="tag">{_esc(t)}</span>' for t in items)
                body += f"<h3>{_esc(title)}</h3><div>{tags}</div>"
        body += "</div>"
    else:
        body = (
            '<div class="section"><h2>Keyword Analysis</h2>'
            f'<p>Top category: <span class="tag">{_esc(conv.get("category"))}</span>'
            " (keyword-scoring stub; supply a summarizer transport for the"
            " LLM summary)</p></div>"
        )

    score_rows = "".join(
        '<div class="score-row">'
        f'<div class="score-name">{_esc(cat)}</div>'
        f'<div class="score-bar" style="width:{int(200 * s / max_score)}px"></div>'
        f"<div>{s}</div></div>"
        for cat, s in scores.items()
    )
    body += f'<div class="section"><h2>Category Scores</h2>{score_rows}</div>'

    msgs = "".join(
        f'<div class="msg {_esc(m.get("role"))}">'
        f'<div class="role">{_esc(m.get("role"))} · {_esc(m.get("ts"))}</div>'
        f"<pre>{_esc(m.get('content'))}</pre></div>"
        for m in messages
    )
    body += f'<div class="section"><h2>Transcript ({len(messages)} messages)</h2>{msgs}</div>'

    generated = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>Chat Report {_esc(conv['chat_id'])}</title>"
        f"<style>{_CSS}</style></head><body>"
        f'<div class="container">{head}{body}'
        f'<p style="color:#7a8194;font-size:12px">Generated {generated}</p>'
        "</div></body></html>"
    )


def generate_report(
    spark: SparkSession,
    chat_path: str,
    *,
    chat_id: str | None = None,
    session_id: int | None = None,
    summarizer_transport=None,
    gap_seconds: int = 3600,
) -> str:
    """End-to-end K5: read the chat JSONL, sessionize + categorize with
    the distributed operators, pick one conversation (default: the one
    with the most messages, ties to the lexically-first id), optionally
    run the UD7 summarizer on it, and render HTML.

    The only driver-side data is the selected conversation's rows."""
    from claude_code_memory_spark.operators.sessions import sessionize

    msgs = read_chat_jsonl(spark, chat_path)
    convs = categorize(conversations(msgs, gap_seconds))
    if chat_id is not None:
        convs = convs.filter(F.col("chat_id") == chat_id)
    if session_id is not None:  # independent filters: --session-id alone works
        convs = convs.filter(F.col("session_id") == session_id)
    pick = convs.orderBy(
        F.desc("n_messages"), F.asc("chat_id"), F.asc("session_id")
    ).first()
    if pick is None:
        raise ValueError(f"no conversation matching {chat_id!r}/{session_id!r}")
    conv = pick.asDict()

    with_sess = sessionize(
        msgs.withColumn("ts_sec", F.col("ts").cast("double")),
        gap_seconds,
        user_col="chat_id",
        ts_col="ts_sec",
    )
    message_rows = [
        r.asDict()
        for r in with_sess.filter(
            (F.col("chat_id") == conv["chat_id"])
            & (F.col("session_id") == conv["session_id"])
        )
        .orderBy("ts")
        .collect()
    ]

    summary = None
    if summarizer_transport is not None:
        from claude_code_memory_spark.sources.summarizer import Summarizer

        summary = Summarizer(summarizer_transport).summarize(conv["full_text"])
    return render_report(conv, message_rows, summary)
