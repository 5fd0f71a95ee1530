"""Streaming huge-JSON content indexing (reference ijson content mode,
json_parser.py:623-816): bounded-memory scanner + batched records +
engine append path."""

import json

from claude_code_memory_spark.sources.large_json import (
    iter_array_items,
    stream_content_records,
)


def _items(text, key, bufsize=17):
    import io

    return list(iter_array_items(io.StringIO(text), key, bufsize=bufsize))


def test_iter_array_items_structure():
    doc = json.dumps(
        {
            "meta": {"n": 2},
            "posts": [
                {"id": 1, "title": "a, b {c}", "body": 'quote " and ] bracket'},
                {"id": 2, "nested": {"deep": [1, 2, {"x": "}"}]}},
                "plain string, with comma",
                42,
            ],
        }
    )
    # tiny buffer forces many read boundaries through strings and nesting
    items = _items(doc, "posts", bufsize=7)
    assert len(items) == 4
    assert json.loads(items[0])["title"] == "a, b {c}"
    assert json.loads(items[1])["nested"]["deep"][2]["x"] == "}"
    assert json.loads(items[2]) == "plain string, with comma"
    assert json.loads(items[3]) == 42


def test_iter_array_items_missing_or_nonarray():
    assert _items('{"posts": {"not": "array"}}', "posts") == []
    assert _items('{"other": []}', "posts") == []
    assert _items('{"posts": []}', "posts") == []


def test_stream_content_records_batching(tmp_path):
    doc = {
        "articles": [
            {"id": i, "title": f"T{i}", "content": f"body {i}"} for i in range(257)
        ]
    }
    p = tmp_path / "dump.json"
    p.write_text(json.dumps(doc))
    batches = list(
        stream_content_records(str(p), "dump.json", batch_rows=100)
    )
    # bounded batches: never more than batch_rows records in memory at once
    assert [len(b) for b in batches] == [100, 100, 57]
    rec = batches[0][0]
    assert rec["entity_name"].startswith("article_")
    assert "Title: T0" in rec["content"] and "body 0" in rec["content"]


def test_engine_index_json_content(spark, tmp_path):
    doc = {
        "posts": [
            {"id": i, "title": f"Post {i}", "body": f"streaming content item {i}"}
            for i in range(50)
        ]
    }
    p = tmp_path / "forum.json"
    p.write_text(json.dumps(doc))

    from claude_code_memory_spark.api import CodeMemoryEngine

    eng = CodeMemoryEngine(spark, str(tmp_path / "store"))
    out = eng.index_json_content(str(p))
    assert out["items"] == 50 and out["chunks_new"] == 50
    chunks = eng.store.read("chunks")
    assert chunks.filter("entity_type = 'post_content'").count() == 50

    # incremental: second run dedup-skips everything
    out2 = eng.index_json_content(str(p))
    assert out2["chunks_new"] == 0 and out2["chunks_skipped_unchanged"] == 50

    # content is searchable
    hit = eng.search("streaming content item 7", mode="semantic", k=1).collect()
    assert hit and hit[0]["entity_name"].startswith("post_")
